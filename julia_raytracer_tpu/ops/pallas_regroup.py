"""Cluster-granularity ray regrouping intersector (DESIGN_regroup.md).

The worklist kernel (ops/pallas_cluster.py) pays the UNION of a 1024-ray
block's supercluster footprints: divergent bounce rays visit ~20 clusters
each but a block sweeps ~254 (12.9x amplification measured on a real
kitchen bounce dump, tools/row_union_stats.py). No sort fixes it — the
divergence is geometric. This module inverts the loop: rays are packed
into 128-lane rows BY SUPERCLUSTER, so every tri-test row contains only
rays that actually want its tables.

Pipeline per ray chunk (XLA glue + two Pallas kernels, no XLA sort /
scatter anywhere — those were measured at 93 ms / 6-14 s on the target
shapes, PERF_r03.md):

  1. count (XLA): slab-test rays vs supercluster bboxes -> bit matrix
     (transposed [tiles, S, 1024] layout for the pack kernel), per-super
     counts, per-super segment bases (+8-block slack), per-ray counts
     (W-overflow guard), and the row->super / row->block maps.
  2. pack (Pallas, grid (n_tiles, S) t-major): per (tile, super) step,
     compact the tile's rays whose bit is set using the one-hot-matmul
     trick (rank = L @ m via the MXU; selection P_b per window block),
     and DMA a full 9-block window into the packed HBM array at the
     super's running cursor (SMEM). Bit-exactness: payloads ride as
     4x8-bit integer chunk planes (exact under single-pass bf16 dots)
     and are recombined to f32 in-kernel. A per-super VMEM residual
     carries the partial last block so packing is slot-tight. The
     inverse map inv[ray, w] = slot-row id accumulates in a per-tile
     VMEM-resident output block.
  3. tri-test (Pallas, grid (rows,)): each step is one 128-slot row with
     ONE super: cull its 128 cluster boxes, sweep live clusters with the
     same split3 MXU tri-test as the worklist kernel, emit per-slot best
     hits. Consecutive rows share a super, so the Mosaic pipeline skips
     repeated table DMAs — the whole table streams at most once.
  4. merge (XLA): gather each ray's W slot t's via the inverse map,
     argmin, gather the winning slot's planes -> Hit.

Safety: rays with more than W visible superclusters or chunks whose
packed size exceeds the static capacity fall back to the worklist kernel
via lax.cond (the count stage computes the predicate before any packing).

Replaces the reference's innermost hot loop (src/bvh.jl:306-371) for
heavy scenes; the worklist kernel remains the fallback and A/B baseline.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from julia_raytracer_tpu.ops.traversal import Hit
from julia_raytracer_tpu.ops.pallas_cluster import (
    BLOCK_RAYS,
    LANES,
    ROWS,
    TRIS,
    WL_SUPER,
    _load_tables,
    _make_tri_dot,
    _nsel_dot,
    _wl_super_bbox,
    make_cluster_intersect_worklist,
)

TILE = BLOCK_RAYS          # rays compacted per pack grid step (1024)
WIN = TILE // LANES + 1    # window blocks per pack write (9)
SLACK = WIN - 1            # per-super segment slack blocks (cursor overhang)
N_PLANES = 9               # ox oy oz dx dy dz tmin tmax one
N_CHUNK_ROWS = 40          # 9 planes x 4 byte-chunks, padded to sublane 8

# max visible superclusters per ray the inverse map can hold (measured
# max on kitchen bounce dumps: 45 at 512px); overflow -> worklist fallback
DEF_W = int(os.environ.get("JRT_RG_W") or 64)
# static packed capacity in 128-slot blocks (incl. slack); overflow ->
# worklist fallback. 24576 blocks = 3.1M slots ~ 100 MB of packed rays.
DEF_BLK_CAP = int(os.environ.get("JRT_RG_BLKCAP") or 24576)
# ray blocks per chunk: bounds the count-stage [rays, S] transient and
# the inverse-map footprint
RG_CHUNK_BLOCKS = 144


def _make_pack_kernel(S: int, W: int, blk_cap: int):
    """Pack kernel: grid (n_tiles, S), t-major. See module docstring."""

    def kernel(sb_ref, dl_ref, lt_ref, bits_ref, rays_ref,
               packed_ref, inv_ref, wcnt_ref,
               buf, sem, cur_ref, w_ref, resid_ref):
        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            w_ref[0, :] = jnp.zeros((TILE,), jnp.int32)
            inv_ref[0, :, :] = jnp.zeros((TILE, W), jnp.int32)

        @pl.when(t == 0)
        def _():
            cur_ref[s] = sb_ref[s]
            resid_ref[pl.ds(s, 1)] = jnp.zeros((1, 8, LANES), jnp.float32)

        m = bits_ref[0, pl.ds(s, 1), :][0]          # [TILE] f32 0/1
        cnt = jnp.sum(m).astype(jnp.int32)

        @pl.when(cnt > 0)
        def _():
            # rank[i] = exclusive prefix popcount. 0/1 inputs are exact
            # under single-pass bf16 (products exact, f32 accumulate).
            rank = jnp.dot(lt_ref[:, :], m) - m      # [TILE] f32
            cur = cur_ref[s]
            base_blk = cur // LANES
            off = cur - base_blk * LANES
            pos = rank + off.astype(jnp.float32)     # [TILE], < TILE+LANES

            lane2 = jax.lax.broadcasted_iota(
                jnp.int32, (TILE, LANES), 1
            ).astype(jnp.float32)
            mcol = m[:, None] > 0.0
            vals = rays_ref[0]                       # [40, TILE] chunk rows
            lanemask = (
                jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1) < off
            )
            resid = resid_ref[pl.ds(s, 1)][0]        # [8, LANES]

            shift = jnp.int32(1 << 8)
            # only blocks [0, idx_last] receive any lane (cnt avg ~64 of
            # a 1152-slot window): skip the P build / dot / recombine for
            # the rest — their stale buf contents land in slack or get
            # overwritten by the next window before any row consumes them
            idx_last = (off + cnt - 1) // LANES
            if os.environ.get("JRT_RG_NOGATE") == "1":
                idx_last = idx_last * 0 + WIN
            for b in range(WIN):
                @pl.when(idx_last >= b)
                def _(b=b):
                    # P_b[i, l] = ray-lane i lands at window slot b*128+l
                    pb = jnp.where(
                        (pos[:, None] == lane2 + jnp.float32(b * LANES)) & mcol,
                        1.0, 0.0,
                    )                                 # [TILE, LANES]
                    ck = jax.lax.dot_general(
                        vals, pb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                 # [40, LANES]
                    rows = []
                    for p in range(N_PLANES):
                        u = ck[4 * p + 0, :].astype(jnp.int32)
                        u = u + ck[4 * p + 1, :].astype(jnp.int32) * shift
                        u = u + ck[4 * p + 2, :].astype(jnp.int32) * (shift * shift)
                        # top byte: int32 multiply wraps -> right bits
                        u = u + ck[4 * p + 3, :].astype(jnp.int32) * jnp.int32(1 << 24)
                        rows.append(jax.lax.bitcast_convert_type(u, jnp.float32))
                    # plane 8 ("one") marks real slots; fold validity
                    # into tmax so empty lanes can never pass the cull
                    tmax_row = jnp.where(rows[8] > 0.5, rows[7], -1.0)
                    blk = jnp.concatenate(
                        [r[None, :] for r in rows[:7]] + [tmax_row[None, :]],
                        axis=0,
                    )                                 # [8, LANES]
                    if b == 0:
                        blk = jnp.where(lanemask, resid, blk)
                    buf[b, :, :] = blk

            cp = pltpu.make_async_copy(
                buf, packed_ref.at[pl.ds(base_blk, WIN), :, :], sem
            )
            cp.start()

            # inverse map: slot-ROW-domain id per set lane at its running
            # per-ray ordinal w (dl converts the slack-domain cursor)
            slotf = rank + (cur + dl_ref[s]).astype(jnp.float32)
            w = w_ref[0, :]
            wio = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
            upd = (wio == w[:, None]) & mcol
            inv_ref[0, :, :] = jnp.where(
                upd, (slotf[:, None] + 0.5).astype(jnp.int32), inv_ref[0, :, :]
            )
            w_ref[0, :] = w + m.astype(jnp.int32)

            cp.wait()

            # residual: the partial block at the new fill point. Selected
            # with where (NOT multiply-accumulate): untouched buf blocks
            # hold stale/uninitialized data and 0.0 * NaN would poison it
            idx = (cur + cnt) // LANES - base_blk     # 0..WIN-1
            acc = jnp.zeros((8, LANES), jnp.float32)
            for b in range(WIN):
                acc = jnp.where(idx == b, buf[b, :, :], acc)
            resid_ref[pl.ds(s, 1)] = acc[None]
            cur_ref[s] = cur + cnt

        @pl.when(s == S - 1)
        def _():
            wcnt_ref[0, 0, :] = w_ref[0, :]

    return kernel


def _make_tritest_kernel(sup: int, q: int):
    """One 128-slot row x one supercluster per grid step."""
    G8 = min(8, sup)
    assert sup % G8 == 0
    _dot = _make_tri_dot()

    def kernel(rs_ref, rv_ref, rb_ref, rays_ref, bbox_ref, tab_ref,
               outf_ref, outi_ref, cany_ref, gany_ref):
        del rb_ref  # consumed by the BlockSpec index maps only
        j = pl.program_id(0)
        R1 = rays_ref[0]                             # [8, 128]
        ox, oy, oz = R1[0:1, :], R1[1:2, :], R1[2:3, :]
        dx, dy, dz = R1[3:4, :], R1[4:5, :], R1[5:6, :]
        tmin, tmax = R1[6:7, :], R1[7:8, :]

        # defaults (dead rows and padded grid tail stay misses)
        outf_ref[0, :, :] = jnp.concatenate(
            [jnp.zeros((2, LANES), jnp.float32), tmax,
             jnp.zeros((5, LANES), jnp.float32)], axis=0,
        )
        outi_ref[0, :, :] = jnp.concatenate(
            [jnp.full((1, LANES), -1, jnp.int32),
             jnp.zeros((7, LANES), jnp.int32)], axis=0,
        )

        @pl.when(rv_ref[j] != 0)
        def _():
            inv = lambda d: 1.0 / jnp.where(d == 0.0, 1e-30, d)
            idx_, idy_, idz_ = inv(dx), inv(dy), inv(dz)

            bm = bbox_ref[0]                          # [sup, 8]
            enter = None
            exit_ = None
            for ax, (o, di) in enumerate(((ox, idx_), (oy, idy_), (oz, idz_))):
                t0 = (bm[:, ax:ax + 1] - o) * di
                t1 = (bm[:, 3 + ax:4 + ax] - o) * di
                lo = jnp.minimum(t0, t1)
                hi = jnp.maximum(t0, t1)
                enter = lo if enter is None else jnp.maximum(enter, lo)
                exit_ = hi if exit_ is None else jnp.minimum(exit_, hi)
            enter = jnp.maximum(enter, tmin)
            exit_ = jnp.minimum(exit_, tmax)
            row_hit = enter <= exit_ * jnp.float32(1.00000024)  # [sup, 128]
            ca = jnp.sum(row_hit.astype(jnp.int32), axis=1, keepdims=True)
            cany_ref[:, :] = ca
            gany_ref[:, :] = jnp.sum(ca.reshape(-1, G8, 1), axis=1)

            sc = rs_ref[j]
            tri_ids = jax.lax.broadcasted_iota(jnp.int32, (TRIS, LANES), 0)

            def process(ci, carry):
                (best_t, best_tri, best_u, best_v,
                 best_nx, best_ny, best_nz, best_in) = carry
                T = tab_ref[0, ci, 0:12]              # [12, 128]
                nrm = tab_ref[0, ci, 12:16]           # [4, 128]
                A = [
                    jnp.concatenate(
                        [T[3 * r_: 3 * r_ + 3, :], T[9 + r_: 10 + r_, :]],
                        axis=0,
                    )
                    for r_ in range(3)
                ]
                o_h = jnp.concatenate(
                    [ox, oy, oz, jnp.ones((1, LANES), jnp.float32)], axis=0
                )
                d_h = jnp.concatenate(
                    [dx, dy, dz, jnp.zeros((1, LANES), jnp.float32)], axis=0
                )
                opx, opy, opz = _dot(A[0], o_h), _dot(A[1], o_h), _dot(A[2], o_h)
                dpx, dpy, dpz = _dot(A[0], d_h), _dot(A[1], d_h), _dot(A[2], d_h)

                tt = -opz / jnp.where(dpz == 0.0, 1e-30, dpz)
                uu = opx + tt * dpx
                vv = opy + tt * dpy
                hit = (
                    (dpz != 0.0)
                    & (uu >= 0.0) & (uu <= 1.0)
                    & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt >= tmin) & (tt < best_t)
                )
                tt = jnp.where(hit, tt, 3.4028235e38)
                min_t = jnp.min(tt, axis=0, keepdims=True)
                arg = jnp.argmin(tt, axis=0)[None, :]
                upd = min_t < best_t
                onehot = (tri_ids == arg).astype(jnp.float32)
                sel = lambda x: jnp.sum(x * onehot, axis=0, keepdims=True)
                u_sel = sel(uu)
                v_sel = sel(vv)
                nsel = _nsel_dot(nrm, onehot)
                odd = (arg % 2) == 1
                u_sel = jnp.where(odd, 1.0 - u_sel, u_sel)
                v_sel = jnp.where(odd, 1.0 - v_sel, v_sel)
                put = lambda dst, val: jnp.where(upd, val, dst)
                return (
                    put(best_t, min_t),
                    put(best_tri, (sc * sup + ci) * TRIS + arg),
                    put(best_u, u_sel),
                    put(best_v, v_sel),
                    put(best_nx, nsel[0:1, :]),
                    put(best_ny, nsel[1:2, :]),
                    put(best_nz, nsel[2:3, :]),
                    put(best_in, nsel[3:4, :]),
                )

            def inner(ci, carry):
                return jax.lax.cond(
                    cany_ref[ci, 0] != 0,
                    functools.partial(process, ci),
                    lambda c: c,
                    carry,
                )

            def group(g, carry):
                def do(carry):
                    # re-cull this group's clusters against the RUNNING
                    # best t: the sweep is Morton-ordered, so once near
                    # geometry is hit, later clusters mostly fail here
                    # and their MXU passes are skipped entirely
                    best_t = carry[0]                 # [1, 128]
                    bm8 = bbox_ref[0, pl.ds(g * G8, G8), :]
                    en8 = None
                    ex8 = None
                    for ax, (o, di) in enumerate(
                        ((ox, idx_), (oy, idy_), (oz, idz_))
                    ):
                        t0 = (bm8[:, ax:ax + 1] - o) * di
                        t1 = (bm8[:, 3 + ax:4 + ax] - o) * di
                        lo = jnp.minimum(t0, t1)
                        hi = jnp.maximum(t0, t1)
                        en8 = lo if en8 is None else jnp.maximum(en8, lo)
                        ex8 = hi if ex8 is None else jnp.minimum(ex8, hi)
                    en8 = jnp.maximum(en8, tmin)
                    ex8 = jnp.minimum(ex8, jnp.minimum(tmax, best_t))
                    hit8 = en8 <= ex8 * jnp.float32(1.00000024)
                    if os.environ.get("JRT_RG_NORECULL") != "1":
                        cany_ref[pl.ds(g * G8, G8), :] = jnp.sum(
                            hit8.astype(jnp.int32), axis=1, keepdims=True
                        )
                    return jax.lax.fori_loop(g * G8, g * G8 + G8, inner, carry)

                return jax.lax.cond(
                    gany_ref[g, 0] != 0, do, lambda c: c, carry
                )

            carry = (
                tmax,
                jnp.full((1, LANES), -1, jnp.int32),
                jnp.zeros((1, LANES), jnp.float32),
                jnp.zeros((1, LANES), jnp.float32),
                jnp.zeros((1, LANES), jnp.float32),
                jnp.zeros((1, LANES), jnp.float32),
                jnp.zeros((1, LANES), jnp.float32),
                jnp.zeros((1, LANES), jnp.float32),
            )
            carry = jax.lax.fori_loop(0, sup // G8, group, carry)
            (best_t, best_tri, best_u, best_v,
             best_nx, best_ny, best_nz, best_in) = carry

            prim = jnp.where(best_tri >= 0, best_tri // 2, -1)
            prim = jnp.where(prim >= q, -1, prim)
            hit = prim >= 0
            t_out = jnp.where(hit, best_t, tmax)
            outf_ref[0, :, :] = jnp.concatenate(
                [best_u, best_v, t_out, best_nx, best_ny, best_nz,
                 jnp.zeros((2, LANES), jnp.float32)], axis=0,
            )
            outi_ref[0, :, :] = jnp.concatenate(
                [prim, (best_in + 0.5).astype(jnp.int32),
                 jnp.zeros((6, LANES), jnp.int32)], axis=0,
            )

    return kernel


def make_cluster_intersect_regroup(prim_verts_np: np.ndarray,
                                   prim_instance=None,
                                   interpret: bool = False,
                                   cache_key: str = "",
                                   w_cap: int = DEF_W,
                                   blk_cap: int = DEF_BLK_CAP):
    """Regroup intersector -> Hit; drop-in for
    make_cluster_intersect_worklist (same tables triple + a lower-
    triangular pack constant). Reference hot loop: src/bvh.jl:306-371."""
    sup = WL_SUPER
    q = len(prim_verts_np)
    tfm, nrm, bbox, n_clusters = _load_tables(prim_verts_np, prim_instance, cache_key)
    sbbox = _wl_super_bbox(bbox, sup)
    n_super = len(sbbox)
    c_pad = n_super * sup
    if c_pad > n_clusters:
        padb = np.zeros((c_pad - n_clusters, 8), np.float32)
        padb[:, 0:3] = 3e38
        padb[:, 3:6] = 3e38
        bbox = np.concatenate([bbox, padb], axis=0)
        padt = np.zeros((c_pad - n_clusters,) + tfm.shape[1:], np.float32)
        padt[:, 11, :] = 1.0
        tfm = np.concatenate([tfm, padt], axis=0)
        nrm = np.concatenate(
            [nrm, np.zeros((c_pad - n_clusters,) + nrm.shape[1:], np.float32)],
            axis=0,
        )
    tab = np.concatenate(
        [tfm.reshape(n_super, sup, 12, TRIS), nrm.reshape(n_super, sup, 4, TRIS)],
        axis=2,
    )
    # device tables ride as jit ARGUMENTS, never closure constants
    # (inline-literal lowering bloats modules, see pallas_cluster.py)
    tab_d = jnp.asarray(tab)
    bbox_d = jnp.asarray(bbox.reshape(n_super, sup, 8))
    sbbox_d = jnp.asarray(sbbox)
    lower_d = jnp.asarray(np.tril(np.ones((TILE, TILE), np.float32)))
    default_tables = (tab_d, bbox_d, sbbox_d, lower_d)

    S = n_super
    W = w_cap
    rows_cap = max(TILE // LANES, blk_cap - S * SLACK - SLACK)

    # worklist fallback for W / capacity overflow (shares the table cache)
    fallback = make_cluster_intersect_worklist(
        prim_verts_np, prim_instance, interpret=interpret, cache_key=cache_key
    )

    pack_kernel = _make_pack_kernel(S, W, blk_cap)
    tri_kernel = _make_tritest_kernel(sup, q)

    def pack_call(bits_t, rays_t, seg_base, delta, n_tiles, lower_t):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles, S),
            in_specs=[
                pl.BlockSpec((TILE, TILE), lambda t, s, sb, dl: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, TILE), lambda t, s, sb, dl: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_CHUNK_ROWS, TILE),
                             lambda t, s, sb, dl: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, TILE, W), lambda t, s, sb, dl: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TILE), lambda t, s, sb, dl: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((WIN, 8, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((S,), jnp.int32),
                pltpu.VMEM((1, TILE), jnp.int32),
                pltpu.VMEM((S, 8, LANES), jnp.float32),
            ],
        )
        return pl.pallas_call(
            pack_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((blk_cap, 8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, TILE, W), jnp.int32),
                jax.ShapeDtypeStruct((n_tiles, 1, TILE), jnp.int32),
            ],
            interpret=interpret,
        )(seg_base, delta, lower_t, bits_t, rays_t)

    def tri_call(row_super, row_valid, row_blk, packed, bbox_t, tab_t,
                 cap=None):
        cap = rows_cap if cap is None else cap
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap,),
            in_specs=[
                pl.BlockSpec((1, 8, LANES), lambda j, rs, rv, rb: (rb[j], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sup, 8), lambda j, rs, rv, rb: (rs[j], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sup, 16, TRIS),
                             lambda j, rs, rv, rb: (rs[j], 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, LANES), lambda j, rs, rv, rb: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, LANES), lambda j, rs, rv, rb: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((sup, 1), jnp.int32),
                pltpu.VMEM((max(sup // 8, 1), 1), jnp.int32),
            ],
        )
        return pl.pallas_call(
            tri_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((cap, 8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((cap, 8, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(row_super[:cap], row_valid[:cap], row_blk[:cap],
          packed, bbox_t, tab_t)

    def _count_stage(comps, nblocks, sbbox_t):
        """Slab rays vs supercluster boxes -> everything the pack and
        tri-test dispatches need. comps: 8 [nblocks*ROWS, LANES].

        The bit matrix is generated DIRECTLY in the pack kernel's
        [tiles, S, 1024] layout (rays on lanes): a [rays, S] layout
        would need a lane<->sublane transpose of ~100 MB, which measured
        ~45 ms fused with the reductions."""
        n_tiles = nblocks
        # [tiles, 1, TILE] per component vs [1, S, 1] per box bound
        o3 = [c.reshape(n_tiles, 1, TILE) for c in comps[0:3]]
        d3 = [c.reshape(n_tiles, 1, TILE) for c in comps[3:6]]
        tn = comps[6].reshape(n_tiles, 1, TILE)
        tx = comps[7].reshape(n_tiles, 1, TILE)
        enter = None
        exit_ = None
        for ax in range(3):
            di = 1.0 / jnp.where(d3[ax] == 0.0, 1e-30, d3[ax])
            b_lo = sbbox_t[None, :, ax, None]
            b_hi = sbbox_t[None, :, 3 + ax, None]
            t0 = (b_lo - o3[ax]) * di
            t1 = (b_hi - o3[ax]) * di
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            enter = lo if enter is None else jnp.maximum(enter, lo)
            exit_ = hi if exit_ is None else jnp.minimum(exit_, hi)
        enter = jnp.maximum(enter, tn)
        exit_ = jnp.minimum(exit_, tx)
        bits = enter <= exit_ * jnp.float32(1.00000024)  # [tiles, S, TILE]

        per_ray = jnp.sum(bits, axis=1).reshape(-1)         # [rays]
        cnt_s = jnp.sum(bits.astype(jnp.int32), axis=(0, 2))  # [S]
        nblk_s = (cnt_s + LANES - 1) // LANES
        row_start = jnp.cumsum(nblk_s) - nblk_s             # exclusive
        total_rows = row_start[-1] + nblk_s[-1]
        segblk = jnp.cumsum(nblk_s + SLACK) - (nblk_s + SLACK)
        seg_base = (segblk * LANES).astype(jnp.int32)       # slot domain
        delta = (row_start * LANES).astype(jnp.int32) - seg_base
        total_blk = segblk[-1] + nblk_s[-1] + SLACK

        j = jnp.arange(rows_cap, dtype=jnp.int32)
        ends = jnp.cumsum(nblk_s)
        row_super = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
        row_super = jnp.minimum(row_super, S - 1)
        row_valid = (j < total_rows).astype(jnp.int32)
        row_blk = segblk[row_super] + (j - row_start[row_super])
        row_blk = jnp.clip(row_blk, 0, blk_cap - 1).astype(jnp.int32)

        bits_t = bits.astype(jnp.float32)
        overflow = (
            (jnp.max(per_ray) > W)
            | (total_rows > rows_cap)
            | (total_blk > blk_cap)
        )
        return (bits_t, seg_base, delta, row_super, row_valid, row_blk,
                overflow, total_rows)

    def _chunk_planes(comps):
        """8 ray components + ones -> 4x8-bit chunk rows [tiles, 40, TILE].

        Plane-major construction keeps rays on the lane dim throughout
        (the final transpose moves only leading dims — no lane shuffle)."""
        planes = list(comps) + [jnp.ones_like(comps[0])]
        v = jnp.stack([p.reshape(-1, TILE) for p in planes], axis=0)
        u = jax.lax.bitcast_convert_type(v, jnp.int32)   # [9, tiles, TILE]
        sh = jnp.asarray([0, 8, 16, 24], jnp.int32)
        ck = jax.lax.shift_right_logical(
            u[:, None], sh[None, :, None, None]
        ) & jnp.int32(255)                               # [9, 4, tiles, TILE]
        ck = ck.reshape(N_PLANES * 4, -1, TILE).astype(jnp.float32)
        ck = jnp.pad(ck, ((0, N_CHUNK_ROWS - N_PLANES * 4), (0, 0), (0, 0)))
        return ck.transpose(1, 0, 2)                     # [tiles, 40, TILE]

    # power-of-two ladder of static tri-test grid sizes: the smallest cap
    # holding total_rows runs (dead tail steps still cost output DMAs)
    row_caps = [c for c in (2048, 4096, 8192, 16384) if c < rows_cap]
    row_caps.append(rows_cap)

    def _regroup_chunk(comps, nb, tab_t, bbox_t, sbbox_t, lower_t):
        (bits_t, seg_base, delta, row_super, row_valid, row_blk,
         overflow, total_rows) = _count_stage(comps, nb, sbbox_t)
        rays_t = _chunk_planes(comps)

        def merge(outf, outi, inv, wcnt):
            """Per-ray argmin over its W slots -> packed chunk outputs."""
            inv2 = inv.reshape(-1, W)                       # [rays, W]
            wc = wcnt.reshape(-1)                           # [rays]
            valid = jax.lax.broadcasted_iota(jnp.int32, inv2.shape, 1) < wc[:, None]
            tflat = outf[:, 2, :].reshape(-1)
            tall = jnp.where(valid, tflat[inv2], jnp.float32(jnp.inf))
            bw = jnp.argmin(tall, axis=1)
            bslot = jnp.take_along_axis(inv2, bw[:, None], axis=1)[:, 0]
            bslot = jnp.where(wc > 0, bslot, 0)
            gf = lambda k: outf[:, k, :].reshape(-1)[bslot]
            gi = lambda k: outi[:, k, :].reshape(-1)[bslot]
            u, v, t = gf(0), gf(1), gf(2)
            nx, ny, nz = gf(3), gf(4), gf(5)
            prim = jnp.where(wc > 0, gi(0), -1)
            inst = jnp.where(wc > 0, gi(1), 0)
            hit = prim >= 0
            tx = comps[7].reshape(-1)
            t_out = jnp.where(hit, t, tx)
            oxr, oyr, ozr = (c.reshape(-1) for c in comps[0:3])
            dxr, dyr, dzr = (c.reshape(-1) for c in comps[3:6])
            outf9 = jnp.stack(
                [u, v, t_out,
                 oxr + t_out * dxr, oyr + t_out * dyr, ozr + t_out * dzr,
                 nx, ny, nz], axis=0,
            ).reshape(9, nb, ROWS, LANES).transpose(1, 0, 2, 3)
            outi2 = jnp.stack([prim, inst], axis=0).reshape(
                2, nb, ROWS, LANES
            ).transpose(1, 0, 2, 3)
            return outf9, outi2

        def regroup(_):
            packed, inv, wcnt = pack_call(bits_t, rays_t, seg_base, delta,
                                          nb, lower_t)

            def branch(cap):
                def run(_):
                    outf, outi = tri_call(row_super, row_valid, row_blk,
                                          packed, bbox_t, tab_t, cap=cap)
                    return merge(outf, outi, inv, wcnt)
                return run

            idx = jnp.searchsorted(
                jnp.asarray(row_caps, jnp.int32), total_rows
            )
            return jax.lax.switch(
                jnp.minimum(idx, len(row_caps) - 1),
                [branch(c) for c in row_caps],
                None,
            )

        def fb(_):
            h = fallback.impl_chunk(comps, nb, (tab_t, bbox_t, sbbox_t))
            return h

        return jax.lax.cond(overflow, fb, regroup, None)

    def _intersect_impl(ro, rd, tmin, tmax, tables):
        tab_t, bbox_t, sbbox_t, lower_t = tables
        n = ro.shape[0]
        n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
        pad = n_pad - n
        nblocks = n_pad // BLOCK_RAYS

        def prep(x, fill=0.0):
            return jnp.pad(x, ((0, pad),), constant_values=fill).reshape(-1, LANES)

        comps = [
            prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(tmin),
            # pad rays carry tmax=-1 so the count slab can never set
            # their bits (d=0 pad rays would otherwise hit EVERY super)
            prep(tmax, fill=-1.0),
        ]
        parts_f, parts_i = [], []
        for blo in range(0, nblocks, RG_CHUNK_BLOCKS):
            bhi = min(blo + RG_CHUNK_BLOCKS, nblocks)
            nb = bhi - blo
            rsel = slice(blo * ROWS, bhi * ROWS)
            ccomp = [c[rsel] for c in comps]
            of, oi = _regroup_chunk(ccomp, nb, tab_t, bbox_t, sbbox_t, lower_t)
            parts_f.append(of)
            parts_i.append(oi)
        outf = parts_f[0] if len(parts_f) == 1 else jnp.concatenate(parts_f, axis=0)
        outi = parts_i[0] if len(parts_i) == 1 else jnp.concatenate(parts_i, axis=0)

        comp_f = lambda k: outf[:, k].reshape(-1)[:n]
        comp_i = lambda k: outi[:, k].reshape(-1)[:n]
        prim = comp_i(0)
        u, v, t = comp_f(0), comp_f(1), comp_f(2)
        pos = jnp.stack([comp_f(3), comp_f(4), comp_f(5)], axis=-1)
        gn = jnp.stack([comp_f(6), comp_f(7), comp_f(8)], axis=-1)
        hit = prim >= 0
        return Hit(hit, prim, u, v, jnp.where(hit, t, tmax), pos, gn, comp_i(1))

    jitted = jax.jit(_intersect_impl)

    def intersect(ro, rd, tmin, tmax, tables=None):
        return jitted(ro, rd, tmin, tmax,
                      default_tables if tables is None else tables)

    def debug_profile(ro, rd, tmin, tmax, iters=3):
        """Per-stage fenced timings for ONE chunk (diagnostics only)."""
        import time as _time

        from julia_raytracer_tpu.utils.timing import fence

        tab_t, bbox_t, sbbox_t, lower_t = default_tables
        n = ro.shape[0]
        nb = min(-(-n // BLOCK_RAYS), RG_CHUNK_BLOCKS)
        n_use = nb * BLOCK_RAYS
        if n < n_use:
            raise ValueError("debug_profile wants >= one full chunk")

        def prep(x, fill=0.0):
            return x[:n_use].reshape(-1, LANES)

        comps = [
            prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(tmin), prep(tmax),
        ]
        count_j = jax.jit(lambda c: _count_stage(c, nb, sbbox_t) + (
            _chunk_planes(c),))
        pack_j = jax.jit(
            lambda bt, rt, sb, dl: pack_call(bt, rt, sb, dl, nb, lower_t))
        tri_j = jax.jit(
            lambda rs, rv, rb, pk: tri_call(rs, rv, rb, pk, bbox_t, tab_t))

        def timed(name, fn, *args):
            out = fence(fn(*args))
            ts = []
            for _ in range(iters):
                t0 = _time.perf_counter()
                fence(fn(*args))
                ts.append(_time.perf_counter() - t0)
            print(f"  {name}: {sorted(ts)[len(ts)//2]*1e3:.1f} ms")
            return out

        cnt_out = timed("count+chunk", count_j, comps)
        (bits_t, seg_base, delta, row_super, row_valid, row_blk,
         overflow, total_rows, rays_t) = cnt_out
        print(f"  overflow={bool(overflow)} rows={int(total_rows)}"
              f"/{rows_cap}")
        pk_out = timed("pack", pack_j, bits_t, rays_t, seg_base, delta)
        packed, inv, wcnt = pk_out
        timed("tri-test", tri_j, row_super, row_valid, row_blk, packed)
        print(f"  max supers/ray: {int(jnp.max(wcnt))} (W={W})")

    intersect.tables = default_tables
    intersect.wants_tables = True
    intersect.debug_profile = debug_profile
    # internals exposed for diagnostics (tools/ab_regroup.py bisection)
    intersect._internals = dict(
        count=_count_stage, chunk=_chunk_planes, pack=pack_call,
        tri=tri_call, W=W, rows_cap=rows_cap, blk_cap=blk_cap,
    )
    return intersect
