#!/bin/bash
# One-command TPU round-artifact regeneration (VERDICT r2 item 8).
# Run when the axon tunnel is healthy. Each step is independently timed
# out and logged under /tmp/tpu_*.log; artifacts land in the repo root.
# Safe to re-run (compile cache warm after the first pass).
#
# NOTE measurement integrity: every python timing path below fences with
# utils/timing.fence (block_until_ready alone can return before the work
# runs on axon — see PERF_r03.md "The axon fence problem"). The config-4
# runs are additionally process-wall-clocked, which cannot be understated.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
KITCHEN=/root/reference/scenes/kitchen/kitchen.json
BATH=/root/reference/scenes/bathroom1/bathroom1.json

# 0. health
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. heavy-tier bench (kitchen + bathroom1 720p + ecosys), one scene per
#    subprocess -> BENCH_HEAVY.json
timeout 5400 python -u tools/bench_heavy.py > /tmp/tpu_heavy.log 2>&1
echo "heavy exit=$?"; tail -5 /tmp/tpu_heavy.log

# 2. REAL config-4 runs (BASELINE #4): full 256 spp, process wall-clock.
#    ~28 min kitchen + ~18 min bathroom1. Update CONFIG4_r03.json from
#    the logged "rendered in" + WALL_SECONDS lines.
for s in "$KITCHEN kitchen" "$BATH bathroom1"; do
  set -- $s
  t0=$(date +%s)
  timeout 3000 python -u -m julia_raytracer_tpu.cli --scene "$1" \
      --resolution 720 --samples 256 --batch 16 --bounces 8 --sampler path \
      --output /tmp/$2_config4.png > /tmp/tpu_config4_$2.log 2>&1
  echo "config4 $2 exit=$? WALL_SECONDS $(( $(date +%s) - t0 ))"
  tail -3 /tmp/tpu_config4_$2.log
done

# 3. golden sweep -> GOLDEN_r03.json (full table; ~30-45 min)
timeout 7200 python -u tools/golden_check.py --all --json GOLDEN_r03.json \
    > /tmp/tpu_golden.log 2>&1
echo "golden exit=$?"; tail -4 /tmp/tpu_golden.log

# 4. headline bench (what the driver runs) -> one JSON line
timeout 1800 python -u bench.py > /tmp/tpu_bench.log 2>&1
echo "bench exit=$?"; tail -1 /tmp/tpu_bench.log

# 5. (optional, slow) convergence curves for the tightened goldens
# timeout 7200 python -u tools/convergence.py classroom kitchen
