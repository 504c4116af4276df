#!/bin/bash
# Round-2 TPU measurement roundup — run when the axon tunnel is healthy.
# Each step is independently timed out and logged under /tmp/tpu_*.log;
# artifacts land in the repo root. Safe to re-run (compile cache warm
# after the first pass).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
KITCHEN=/root/reference/scenes/kitchen/kitchen.json
BATH=/root/reference/scenes/bathroom1/bathroom1.json

# 0. health
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. flat-grid A/B: kitchen + bathroom1 intersect-only (rect vs flat)
for s in "$KITCHEN kitchen" "$BATH bathroom1"; do
  set -- $s
  PROF_ONLY=isec JRT_WL_FLAT=0 timeout 1800 python -u tools/profile_tpu.py "$1" 512 \
      > /tmp/tpu_ab_$2_rect.log 2>&1; echo "$2 rect exit=$?"
  PROF_ONLY=isec JRT_WL_FLAT=1 timeout 1800 python -u tools/profile_tpu.py "$1" 512 \
      > /tmp/tpu_ab_$2_flat.log 2>&1; echo "$2 flat exit=$?"
  grep "intersect fast" /tmp/tpu_ab_$2_rect.log /tmp/tpu_ab_$2_flat.log
done

# 1b. supercluster-size sweep on kitchen (tighter boxes vs more steps)
for SUP in 32 64; do
  PROF_ONLY=isec JRT_WL_FLAT=1 JRT_WL_SUP=$SUP timeout 1800 \
      python -u tools/profile_tpu.py "$KITCHEN" 512 \
      > /tmp/tpu_ab_kitchen_sup$SUP.log 2>&1; echo "kitchen sup$SUP exit=$?"
done
grep "intersect fast" /tmp/tpu_ab_kitchen_sup*.log

# 2. ecosys hybrid profile, instanced-branch rounds vs flat dispatch
JRT_WL_FLAT=0 JRT_INST_FLAT=0 timeout 2400 python -u tools/profile_ecosys.py --res 480 \
    > /tmp/tpu_ecosys_rect.log 2>&1; echo "ecosys rect exit=$?"
JRT_WL_FLAT=1 JRT_INST_FLAT=1 timeout 2400 python -u tools/profile_ecosys.py --res 480 \
    > /tmp/tpu_ecosys_flat.log 2>&1; echo "ecosys flat exit=$?"
grep -E "intersect|hybrid" /tmp/tpu_ecosys_rect.log /tmp/tpu_ecosys_flat.log

# 3. ecosys golden on TPU (hybrid correctness on hardware)
timeout 2400 python -u tools/golden_check.py ecosys > /tmp/tpu_golden_ecosys.log 2>&1
echo "golden ecosys exit=$?"; tail -3 /tmp/tpu_golden_ecosys.log

# 4. heavy-tier bench (kitchen + bathroom1 720p + ecosys)
timeout 5400 python -u tools/bench_heavy.py > /tmp/tpu_heavy.log 2>&1
echo "heavy exit=$?"; tail -5 /tmp/tpu_heavy.log

# 5. headline bench
timeout 1800 python -u bench.py > /tmp/tpu_bench.log 2>&1
echo "bench exit=$?"; tail -1 /tmp/tpu_bench.log
