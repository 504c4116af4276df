"""Micro-bench the XLA primitives the gather-mode intersector needs.

Green-lights (or kills) the cluster-centric regroup design before it's
built: the design only wins if pair-list construction (nonzero, cumsum,
unique scatter), the batched K=4 tri-test GEMM, and the scatter-min
merge together cost well under the ~286 ms the current worklist kernel
spends on a kitchen-class bounce dispatch (147k rays).

Usage: python tools/gather_prims_bench.py
"""

from __future__ import annotations

import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    """Fences EVERY iteration and subtracts the measured fence
    round-trip (advisor r3: a tail-only fence under-reports unless the
    runtime drains FIFO, which axon does not guarantee)."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.utils.timing import fence

    fence(fn(*args))
    probe = jnp.zeros(8)
    fence(probe + 1.0)
    t0 = time.perf_counter()
    for _ in range(4):
        fence(probe + 1.0)
    rt = (time.perf_counter() - t0) / 4
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    per = (time.perf_counter() - t0) / n
    return max(per - rt, per * 0.05)


def main():
    N = 147456          # kitchen-class dispatch lanes
    S = 177             # superclusters (sup=128)
    C = 22555           # clusters
    B1 = N * 24         # (ray, super) pair budget
    B2 = N * 48         # (ray, cluster) padded pair budget
    CH = 8192           # tri-test chunk (64 rows)
    print(f"device={jax.devices()[0]}  N={N} S={S} C={C} B1={B1} B2={B2}",
          flush=True)
    rng = np.random.default_rng(0)

    # 1. super cull [S, N] bool (transpose order) + nonzero(size=B1)
    mask_sn = jnp.asarray(rng.random((S, N)) < (11.4 / S))

    def cull_pairs(m):
        idx = jnp.nonzero(m.reshape(-1), size=B1, fill_value=S * N)[0]
        return idx
    t = timeit(jax.jit(cull_pairs), mask_sn)
    print(f"nonzero {S*N/1e6:.0f}M bool -> {B1/1e6:.1f}M pairs: "
          f"{t*1e3:8.2f} ms", flush=True)

    # 2. chunked expansion pass: per-pair [CH, 128] slab-cull + colcumsum
    #    + masked unique scatter (the pass-B shape), over B1 pairs
    cbb = jnp.asarray(rng.random((S, 128, 8)), jnp.float32)
    sup_ids = jnp.asarray(rng.integers(0, S, B1), jnp.int32)
    rays8 = jnp.asarray(rng.random((N, 8)), jnp.float32)
    ray_ids = jnp.asarray(rng.integers(0, N, B1), jnp.int32)
    out_buf = jnp.zeros(B2, jnp.int32)

    def expand(sup_ids, ray_ids, cbb, rays8, out_buf):
        n_ch = B1 // 32768

        def body(k, carry):
            buf, base = carry
            sl = jax.lax.dynamic_slice(sup_ids, (k * 32768,), (32768,))
            rl = jax.lax.dynamic_slice(ray_ids, (k * 32768,), (32768,))
            boxes = cbb[sl]                       # [32k, 128, 8]
            rays = rays8[rl]                      # [32k, 8]
            o = rays[:, None, 0:3]
            inv = 1.0 / jnp.where(rays[:, None, 3:6] == 0, 1e-30,
                                  rays[:, None, 3:6])
            t0 = (boxes[:, :, 0:3] - o) * inv
            t1 = (boxes[:, :, 3:6] - o) * inv
            enter = jnp.minimum(t0, t1).max(-1)
            exit_ = jnp.maximum(t0, t1).min(-1)
            m = (enter <= exit_ * 1.00000024)     # [32k, 128]
            cs = jnp.cumsum(m.astype(jnp.int32), axis=0)
            pos = (base + cs) % B2  # fake pos math (right op mix/shape)
            flat_pos = jnp.where(m, pos * 128 % B2, B2).reshape(-1)
            vals = jnp.broadcast_to(rl[:, None], (32768, 128)).reshape(-1)
            buf = buf.at[flat_pos].set(vals, mode="drop", unique_indices=True)
            base = base + cs[-1].sum()
            return buf, base

        return jax.lax.fori_loop(0, n_ch, body, (out_buf, jnp.int32(0)))[0]

    t = timeit(jax.jit(expand), sup_ids, ray_ids, cbb, rays8, out_buf)
    print(f"expand+cumsum+scatter {B1/1e6:.1f}M pairs x128: "
          f"{t*1e3:8.2f} ms", flush=True)

    # 3. tri-test batched GEMM over B2 pairs in CH chunks (while-loop,
    #    trip count = realistic 3.6M pairs not the budget)
    real_pairs = int(N * 24.1)
    n_rows = real_pairs // 128
    tab = jnp.asarray(rng.random((C, 16, 128)), jnp.float32)
    cid_rows = jnp.asarray(rng.integers(0, C, B2 // 128), jnp.int32)
    pray = jnp.asarray(rng.integers(0, N, B2), jnp.int32)
    outs = jnp.zeros((B2 // 128, 128, 8), jnp.float32)

    def tritest(cid_rows, pray, tab, rays8, outs):
        n_ch = n_rows // 64

        def body(k, outs):
            rows = jax.lax.dynamic_slice(cid_rows, (k * 64,), (64,))
            prs = jax.lax.dynamic_slice(pray, (k * 8192,), (8192,))
            tb = tab[rows]                        # [64, 16, 128]
            idxA = jnp.array([0, 1, 2, 9, 3, 4, 5, 10, 6, 7, 8, 11])
            A = tb[:, idxA].reshape(64, 3, 4, 128)
            A = A.transpose(0, 1, 3, 2).reshape(64, 384, 4)
            r8 = rays8[prs].reshape(64, 128, 8)
            oh = jnp.concatenate(
                [r8[..., 0:3], jnp.ones((64, 128, 1))], -1).transpose(0, 2, 1)
            dh = jnp.concatenate(
                [r8[..., 3:6], jnp.zeros((64, 128, 1))], -1).transpose(0, 2, 1)
            op = jax.lax.dot_general(
                A, oh, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGH).reshape(64, 3, 128, 128)
            dp = jax.lax.dot_general(
                A, dh, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGH).reshape(64, 3, 128, 128)
            tt = -op[:, 2] / jnp.where(dp[:, 2] == 0, 1e-30, dp[:, 2])
            uu = op[:, 0] + tt * dp[:, 0]
            vv = op[:, 1] + tt * dp[:, 1]
            hit = (uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1) & (tt > 0)
            tt = jnp.where(hit, tt, 3.4e38)
            tbest = tt.min(1)                     # [64, 128] over tris
            arg = tt.argmin(1)
            sel = lambda x: jnp.take_along_axis(x, arg[:, None, :], 1)[:, 0]
            nrm = tb[:, 12:16]                    # [64, 4, 128]
            nsel = jnp.take_along_axis(
                nrm, arg[:, None, :] % 128, 2)    # [64, 4, 128]? fake
            res = jnp.stack(
                [tbest, sel(uu), sel(vv), nsel[:, 0], nsel[:, 1],
                 nsel[:, 2], nsel[:, 3], tbest], -1)  # [64, 128, 8]
            return jax.lax.dynamic_update_slice(outs, res, (k * 64, 0, 0))

        return jax.lax.fori_loop(0, n_ch, body, outs)

    t = timeit(jax.jit(tritest), cid_rows, pray, tab, rays8, outs)
    print(f"tri-test GEMM {real_pairs/1e6:.1f}M pairs "
          f"({n_rows} rows): {t*1e3:8.2f} ms", flush=True)

    # 4. scatter-min merge: B2_real packed int64 keys onto N rays
    keys = jnp.asarray(
        rng.integers(0, 2**62, real_pairs), jnp.int64)
    rids = jnp.asarray(rng.integers(0, N, real_pairs), jnp.int32)
    init = jnp.full(N, 2**62, jnp.int64)

    def merge(keys, rids, init):
        return init.at[rids].min(keys)
    t = timeit(jax.jit(merge), keys, rids, init)
    print(f"scatter-min {real_pairs/1e6:.1f}M -> {N/1e3:.0f}k rays: "
          f"{t*1e3:8.2f} ms", flush=True)

    # 5. alternative merge: scatter to (ray, rank) slots + row min
    K = 64
    ranks = jnp.asarray(rng.integers(0, K, real_pairs), jnp.int32)
    slots = jnp.full((N, K), 2**62, jnp.int64)

    def merge2(keys, rids, ranks, slots):
        flat = rids.astype(jnp.int64) * K + ranks
        s = slots.reshape(-1).at[flat].min(keys)
        return s.reshape(N, K).min(1)
    t = timeit(jax.jit(merge2), keys, rids, ranks, slots)
    print(f"slot-scatter+rowmin {real_pairs/1e6:.1f}M: {t*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
