#!/bin/bash
# One-command round-5 TPU artifact regeneration. Run when the axon
# tunnel is healthy; artifacts land in the repo root. Stages are
# independently timed out; logs under /tmp/.
#
# Measurement integrity: every python timing path fences with
# utils/timing.fence and chains dispatches (PERF_r04/05 methodology);
# same-session A/Bs use the JRT_* env knobs recorded in KNOBS_r05.json.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 0. health
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. on-TPU smoke tier (2-4 min warm; catches Mosaic regressions as RED
#    TESTS before any bench runs)
bash tools/tpu_tests.sh r05

# 2. heavy tier at final defaults -> BENCH_HEAVY.json
timeout 5400 python -u tools/bench_heavy.py > /tmp/tpu_heavy.log 2>&1
echo "heavy exit=$?"; tail -5 /tmp/tpu_heavy.log

# 3. same-session r4-equivalent ladder (the headline comparison)
for cfg in "default:" "r4eq:JRT_DEAD_EPS=1 JRT_COMPACT=0"; do
  name=${cfg%%:*}; envs=${cfg#*:}
  for s in kitchen bathroom1 ecosys; do
    env $envs timeout 4000 python tools/bench_heavy.py $s \
        > /tmp/tpu_${name}_$s.log 2>&1
    echo "$name $s: $(grep -o '"ms_per_sample": [0-9.]*' /tmp/tpu_${name}_$s.log | head -1)"
  done
done

# 4. intersector A/B + kitchen breakdown
timeout 3000 python tools/intersector_mfu.py kitchen 512 --json INTERSECT_MFU_r05.json > /tmp/tpu_mfu.log 2>&1
timeout 3000 python tools/profile_scene.py kitchen 720 2 --json PROFILE_KITCHEN_r05.json > /tmp/tpu_pk.log 2>&1

# 5. flagship + breakdown
for i in 1 2 3; do timeout 2400 python bench.py; done
timeout 2400 python tools/profile_cornellbox.py --json PROFILE_CB_r05.json > /tmp/tpu_pcb.log 2>&1

# 6. golden sweep (MSE + TIME gated) -> GOLDEN_r05.json
timeout 10800 python -u tools/golden_check.py --all --json GOLDEN_r05.json > /tmp/tpu_golden.log 2>&1
tail -24 /tmp/tpu_golden.log

# 7. REAL config-4 runs (BASELINE #4) -> CONFIG4_r05.json
KITCHEN=/root/reference/scenes/kitchen/kitchen.json
BATH=/root/reference/scenes/bathroom1/bathroom1.json
for s in "$KITCHEN kitchen" "$BATH bathroom1"; do
  set -- $s
  t0=$(date +%s)
  timeout 3600 python -u -m julia_raytracer_tpu.cli --scene "$1" \
      --resolution 720 --samples 256 --batch 16 --bounces 8 --sampler path \
      --output /tmp/$2_config4.png > /tmp/tpu_config4_$2.log 2>&1
  echo "config4 $2 exit=$? WALL_SECONDS $(( $(date +%s) - t0 ))"
done
timeout 300 python tools/config4_collect.py --json CONFIG4_r05.json
