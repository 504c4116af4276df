#!/bin/bash
# Round-4 TPU artifact regeneration (VERDICT r3 items 2, 6, 7).
# Every claim in PERF_r04.md must point at an artifact produced by the
# code that makes it. Logs under /tmp/tpu_*.log; artifacts in repo root.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
KITCHEN=/root/reference/scenes/kitchen/kitchen.json
BATH=/root/reference/scenes/bathroom1/bathroom1.json

# 0. health
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. heavy-tier bench (kitchen + bathroom1 720p + ecosys) -> BENCH_HEAVY.json
timeout 5400 python -u tools/bench_heavy.py > /tmp/tpu_heavy.log 2>&1
echo "heavy exit=$?"; tail -5 /tmp/tpu_heavy.log

# 2. REAL config-4 runs (BASELINE #4): full 256 spp, process wall-clock,
#    BOTH scenes (r3 recorded kitchen only — VERDICT missing #3).
for s in "$KITCHEN kitchen" "$BATH bathroom1"; do
  set -- $s
  t0=$(date +%s)
  timeout 3300 python -u -m julia_raytracer_tpu.cli --scene "$1" \
      --resolution 720 --samples 256 --batch 16 --bounces 8 --sampler path \
      --output /tmp/$2_config4.png > /tmp/tpu_config4_$2.log 2>&1
  echo "config4 $2 exit=$? WALL_SECONDS $(( $(date +%s) - t0 ))"
  tail -3 /tmp/tpu_config4_$2.log
done

# 3. config-2 at exact spec (BASELINE #2) -> CONFIG2_r04.json
timeout 1800 python -u tools/config2.py --json CONFIG2_r04.json \
    > /tmp/tpu_config2.log 2>&1
echo "config2 exit=$?"; tail -3 /tmp/tpu_config2.log

# 4. full 19-scene golden sweep (weak tail now 48-64 spp, tol <= 0.03)
#    -> GOLDEN_r04.json
timeout 9000 python -u tools/golden_check.py --all --json GOLDEN_r04.json \
    > /tmp/tpu_golden.log 2>&1
echo "golden exit=$?"; tail -4 /tmp/tpu_golden.log

# 5. headline bench (what the driver runs) -> one JSON line
timeout 1800 python -u bench.py > /tmp/tpu_bench.log 2>&1
echo "bench exit=$?"; tail -1 /tmp/tpu_bench.log
