#!/bin/bash
# Round-2 TPU measurement roundup — run when the axon tunnel is healthy.
# Each step is independently timed out and logged; artifacts land in the
# repo root. Safe to re-run (compile cache warm after first pass).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. ecosys instanced-precull profile (validates the exact slab precull)
timeout 2400 python -u tools/profile_ecosys.py --res 480 \
    > /tmp/tpu_ecosys.log 2>&1
echo "ecosys exit=$?"

# 2. heavy-tier bench (kitchen + bathroom1 720p)
timeout 3600 python -u tools/bench_heavy.py > /tmp/tpu_heavy.log 2>&1
echo "heavy exit=$?"

# 3. headline bench
timeout 1800 python -u bench.py > /tmp/tpu_bench.log 2>&1
echo "bench exit=$?"
tail -1 /tmp/tpu_bench.log
