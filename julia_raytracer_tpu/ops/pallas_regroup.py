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
     (generated directly in the pack kernel's [tiles, S, 8, 128]
     layout), per-super counts, per-super segment bases (+8-block
     slack), per-(tile, super) cursor bases, and group->super /
     group->block maps for the tri-test.
  2. pack (Pallas, grid (n_tiles, S) t-major): per (tile, super) step,
     compact the tile's rays whose bit is set using the one-hot-matmul
     trick (rank = L @ m via the MXU; selection P_b per window block),
     and DMA a full 9-block window into the packed HBM array at the
     super's running cursor (SMEM). Bit-exactness: payloads ride as
     4x8-bit integer chunk planes (exact under single-pass bf16 dots)
     and are recombined to f32 in-kernel. A per-super VMEM residual
     carries the partial last block so packing is slot-tight.
  3. tri-test (Pallas, grid (rows,)): each step is one 128-slot row with
     ONE super: cull its 128 cluster boxes, sweep live clusters with the
     same split3 MXU tri-test as the worklist kernel, emit per-slot best
     hits. Consecutive rows share a super, so the Mosaic pipeline skips
     repeated table DMAs — the whole table streams at most once.
  4. unpack (Pallas, grid (n_tiles, S)): re-derive each pair's pack
     permutation from the bits, DMA the tri-test result window at the
     pair's precomputed cursor base, one-hot-multiply it back into
     per-ray lanes and min-merge (t, tri) per tile — no inverse map, no
     random gathers (an XLA [rays, W] gather merge measured ~67 ms).
  5. attribute recompute (XLA): the winner's u/v/normal/instance from
     its triangle transform row (one [rays, 16] gather) -> Hit.

Safety: chunks whose packed size exceeds the static capacity fall back
to the worklist kernel via lax.cond (the count stage computes the
predicate before any packing).

Replaces the reference's innermost hot loop (src/bvh.jl:306-371) for
heavy scenes; the worklist kernel remains the fallback and A/B baseline.
"""

from __future__ import annotations

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
    _wl_super_bbox,
    make_cluster_intersect_worklist,
)

TILE = BLOCK_RAYS          # rays compacted per pack grid step (1024)
WIN = TILE // LANES + 1    # window blocks per pack write (9)
SLACK = WIN - 1            # per-super segment slack blocks (cursor overhang)
N_PLANES = 9               # ox oy oz dx dy dz tmin tmax one
N_CHUNK_ROWS = 40          # 9 planes x 4 byte-chunks, padded to sublane 8

# static packed capacity in 128-slot blocks (incl. slack); overflow ->
# worklist fallback. 24576 blocks = 3.1M slots ~ 100 MB of packed rays.
# JRT_RG_BLKCAP / JRT_RG_CHUNK are read at BUILD time inside
# make_cluster_intersect_regroup (ADVICE r4: an import-time read made
# harness-set env vars silently inert); these are only the defaults.
DEF_BLK_CAP = 49152
DEF_RG_CHUNK_BLOCKS = 288


def _make_pack_kernel(S: int, blk_cap: int):
    """Pack kernel: grid (n_tiles, S), t-major. See module docstring.

    All per-lane bookkeeping runs in [8, 128] (sublane, lane) layout —
    a flat [1024]-lane layout forced the rank to a [1024,1024] @ [1024]
    matmul (64 MXU passes per live pair, ~80% of the kernel's MXU).
    Two-level rank instead: an exclusive in-row prefix via ONE
    [8,128] @ [128,128] pass plus an [8,8] row-offset pass."""

    # depth-2 write pipelining (VERDICT r4 item 6): each live pair's
    # ~36 KB window DMA used to start+wait inline, putting ~1 us of DMA
    # latency on the critical path per pair (~23k pairs on a kitchen
    # dispatch). Two buffers alternate by live-pair parity; a buffer is
    # only awaited when REUSED (2 live steps later). Safety: consecutive
    # live pairs target disjoint packed segments (s varies fastest and
    # per-super segments are slack-separated) EXCEPT when the same super
    # is live in consecutive live steps with every super between dead —
    # same-s windows overlap at the partial block, so the conflict guard
    # awaits the other parity whenever its last super == this one.
    # S == 1 would make every pair conflict; those scenes are below
    # REGROUP_MIN anyway, and the guard still keeps them correct.
    P0, P1, LP, LS0, LS1 = range(5)  # SMEM dbb layout

    def kernel(sb_ref, lt_ref, l8_ref, bits_ref, rays_ref,
               packed_ref,
               buf0, buf1, sem0, sem1, cur_ref, resid_ref, dbb_ref):
        t = pl.program_id(0)
        s = pl.program_id(1)
        nt = pl.num_programs(0)

        @pl.when((t == 0) & (s == 0))
        def _():
            dbb_ref[P0] = 0
            dbb_ref[P1] = 0
            dbb_ref[LP] = 0
            dbb_ref[LS0] = -1
            dbb_ref[LS1] = -1

        @pl.when(t == 0)
        def _():
            cur_ref[s] = sb_ref[s]
            resid_ref[pl.ds(s, 1)] = jnp.zeros((1, 8, LANES), jnp.float32)

        m2 = bits_ref[0, 0]                         # [8, 128] f32 0/1
        cnt = jnp.sum(m2).astype(jnp.int32)

        def _wait(buf, sem):
            # shape-only reconstruction: wait() needs the byte count
            pltpu.make_async_copy(
                buf, packed_ref.at[pl.ds(0, WIN)], sem
            ).wait()

        @pl.when(cnt > 0)
        def _():
            # two-level exclusive rank: in-row strict-lower prefix (one
            # [8,128]@[128,128] pass; 0/1 inputs are exact under
            # single-pass bf16) + exclusive row offsets ([8,8] pass)
            hp = jnp.float32
            rank_in = jax.lax.dot_general(
                m2, lt_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=hp,
            )                                        # [8, 128]
            rt = jnp.sum(m2, axis=1, keepdims=True)  # [8, 1]
            ro = jax.lax.dot_general(
                l8_ref[:, :], rt, (((1,), (0,)), ((), ())),
                preferred_element_type=hp,
            )                                        # [8, 1] exclusive
            rank2 = rank_in + ro                     # [8, 128]
            cur = cur_ref[s]
            base_blk = cur // LANES
            off = cur - base_blk * LANES
            pos3 = (rank2 + off.astype(jnp.float32))[:, :, None]  # [8,128,1]

            m3 = m2[:, :, None] > 0.0                # [8, 128, 1]
            vals = rays_ref[0]                       # [40, TILE] chunk rows
            lanemask = (
                jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1) < off
            )
            resid = resid_ref[pl.ds(s, 1)][0]        # [8, LANES]
            lane3 = jax.lax.broadcasted_iota(
                jnp.int32, (8, LANES, LANES), 2
            ).astype(jnp.float32)

            shift = jnp.int32(1 << 8)
            # only blocks [0, idx_last] receive any lane (cnt avg ~64 of
            # a 1152-slot window): skip the P build / dot / recombine for
            # the rest — their stale buf contents land in slack or get
            # overwritten by the next window before any row consumes them
            idx_last = (off + cnt - 1) // LANES
            if os.environ.get("JRT_RG_NOGATE") == "1":
                idx_last = idx_last * 0 + WIN

            def emit(buf, sem, pidx, ls_idx, osem, obuf, ols_idx, opidx):
                # reuse guard: await the copy issued from THIS buffer two
                # live steps ago
                @pl.when(dbb_ref[pidx] == 1)
                def _():
                    _wait(buf, sem)
                    dbb_ref[pidx] = 0
                # overlap guard: same-super windows overlap at the
                # partial block — serialize against the other parity
                @pl.when((dbb_ref[opidx] == 1) & (dbb_ref[ols_idx] == s))
                def _():
                    _wait(obuf, osem)
                    dbb_ref[opidx] = 0

                for b in range(WIN):
                    @pl.when(idx_last >= b)
                    def _(b=b):
                        # P[i, l] = ray-lane i lands at window slot
                        # b*128+l (built in [8,128,128], reshaped to the
                        # [1024,128] contraction layout — a major-dims
                        # merge, no lane shuffle)
                        pb = jnp.where(
                            (pos3 == lane3 + jnp.float32(b * LANES)) & m3,
                            1.0, 0.0,
                        ).reshape(TILE, LANES)
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

                pltpu.make_async_copy(
                    buf, packed_ref.at[pl.ds(base_blk, WIN), :, :], sem
                ).start()
                dbb_ref[pidx] = 1
                dbb_ref[ls_idx] = s

                # residual: the partial block at the new fill point.
                # Selected with where (NOT multiply-accumulate):
                # untouched buf blocks hold stale/uninitialized data and
                # 0.0 * NaN would poison it. Reading buf while its DMA
                # reads it is safe.
                idx = (cur + cnt) // LANES - base_blk     # 0..WIN-1
                acc = jnp.zeros((8, LANES), jnp.float32)
                for b in range(WIN):
                    acc = jnp.where(idx == b, buf[b, :, :], acc)
                resid_ref[pl.ds(s, 1)] = acc[None]

            par = dbb_ref[LP] & 1

            @pl.when(par == 0)
            def _():
                emit(buf0, sem0, P0, LS0, sem1, buf1, LS1, P1)

            @pl.when(par == 1)
            def _():
                emit(buf1, sem1, P1, LS1, sem0, buf0, LS0, P0)

            dbb_ref[LP] = dbb_ref[LP] + 1
            cur_ref[s] = cur + cnt

        # drain: the final grid step must complete all in-flight copies
        @pl.when((t == nt - 1) & (s == S - 1))
        def _():
            @pl.when(dbb_ref[P0] == 1)
            def _():
                _wait(buf0, sem0)
                dbb_ref[P0] = 0

            @pl.when(dbb_ref[P1] == 1)
            def _():
                _wait(buf1, sem1)
                dbb_ref[P1] = 0

    return kernel



def _make_unpack_kernel(S: int):
    """Unpack/merge kernel: grid (n_tiles, S), t-major, mirroring pack.

    For each (tile, super) pair it re-derives the pack permutation from
    the same bit matrix (two-level rank, 2 MXU passes), DMAs the
    tri-test's 9-block result window at the pair's precomputed row-slot
    base, and multiplies the window back into per-ray lanes with the
    transposed one-hot dots — then min-merges (t, tri) into per-tile
    scratch. Replaces the inverse-map + XLA-gather merge, whose random
    [rays, W] gathers measured ~67 ms on kitchen-bounce shapes (the
    gather path ran at ~140M lookups/s)."""

    def kernel(us_ref, lt_ref, l8_ref, bits_ref, trires_ref, out_ref,
               wbuf, sem, acc_ref, bt_ref, btri_ref):
        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            bt_ref[:, :] = jnp.full((1, TILE), jnp.inf, jnp.float32)
            btri_ref[:, :] = jnp.full((1, TILE), -1, jnp.int32)

        m2 = bits_ref[0, 0]                          # [8, 128] f32 0/1
        cnt = jnp.sum(m2).astype(jnp.int32)

        @pl.when(cnt > 0)
        def _():
            slot0 = us_ref[t * S + s]
            base_blk = slot0 // LANES
            off = slot0 - base_blk * LANES

            cp = pltpu.make_async_copy(
                trires_ref.at[pl.ds(base_blk, WIN), :, :], wbuf, sem
            )
            cp.start()

            hp = jnp.float32
            rank_in = jax.lax.dot_general(
                m2, lt_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=hp,
            )
            rt = jnp.sum(m2, axis=1, keepdims=True)
            ro = jax.lax.dot_general(
                l8_ref[:, :], rt, (((1,), (0,)), ((), ())),
                preferred_element_type=hp,
            )
            rank2 = rank_in + ro
            pos3 = (rank2 + off.astype(jnp.float32))[:, :, None]
            m3 = m2[:, :, None] > 0.0
            lane3 = jax.lax.broadcasted_iota(
                jnp.int32, (8, LANES, LANES), 2
            ).astype(jnp.float32)
            idx_last = (off + cnt - 1) // LANES

            cp.wait()

            # per-chunk-row extraction: 8 rows = (tri, t-bits) x 4 bytes,
            # accumulated in scratch so dead window blocks skip their
            # dots entirely (values are small ints: exact under bf16)
            acc_ref[:, :] = jnp.zeros((8, TILE), jnp.float32)
            for b in range(WIN):
                @pl.when(idx_last >= b)
                def _(b=b):
                    wb = wbuf[b]                      # [8, 128] i32
                    cb = []
                    for plane in range(2):
                        u = wb[plane:plane + 1, :]    # [1, 128]
                        for k in range(4):
                            cb.append(
                                (jax.lax.shift_right_logical(
                                    u, jnp.int32(8 * k)) & jnp.int32(255)
                                 ).astype(jnp.float32)
                            )
                    c_b = jnp.concatenate(cb, axis=0)  # [8, 128]
                    pb = jnp.where(
                        (pos3 == lane3 + jnp.float32(b * LANES)) & m3,
                        1.0, 0.0,
                    ).reshape(TILE, LANES)
                    part = jax.lax.dot_general(
                        c_b, pb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                 # [8, TILE]
                    acc_ref[:, :] = acc_ref[:, :] + part

            shift = jnp.int32(1 << 8)
            def recomb(k0):
                u = acc_ref[k0 + 0:k0 + 1, :].astype(jnp.int32)
                u = u + acc_ref[k0 + 1:k0 + 2, :].astype(jnp.int32) * shift
                u = u + acc_ref[k0 + 2:k0 + 3, :].astype(jnp.int32) * (shift * shift)
                u = u + acc_ref[k0 + 3:k0 + 4, :].astype(jnp.int32) * jnp.int32(1 << 24)
                return u                               # [1, TILE] i32

            tri_new = recomb(0)
            t_new = jax.lax.bitcast_convert_type(recomb(4), jnp.float32)
            # unset lanes decode to t == 0.0 (P columns are zero); real
            # slots carry t >= tmin > 0, so 0 marks "no slot here"
            upd = (t_new > 0.0) & (t_new < bt_ref[:, :])
            btri_ref[:, :] = jnp.where(upd, tri_new, btri_ref[:, :])
            bt_ref[:, :] = jnp.where(upd, t_new, bt_ref[:, :])

        @pl.when(s == S - 1)
        def _():
            out_ref[0, 0:1, :] = btri_ref[:, :]
            out_ref[0, 1:2, :] = jax.lax.bitcast_convert_type(
                bt_ref[:, :], jnp.int32
            )

    return kernel


GRP = 8  # slot rows per tri-test grid step (segments are GRP-row padded)


def _make_tritest_kernel(sup: int, q: int):
    """GRP 128-slot rows x one supercluster per grid step. The 8-row
    group amortizes the per-step pipeline bookkeeping, the table DMA,
    and the serial cluster scan 8x versus a single-row step (measured:
    the single-row variant spent ~60% of its time on that overhead)."""
    G8 = min(8, sup)
    assert sup % G8 == 0
    _dot = _make_tri_dot()
    # u/v fast mode (DEFAULT OFF since round 5): the u/v RANGE TESTS run
    # as single-pass bf16 dots (18 MXU passes/pass -> 10; tri-test 190
    # -> 169 ms). Round 4 shipped it ON after golden validation
    # (bathroom1 MSE 0.02143 vs 0.02128 exact — images equivalent,
    # because on real meshes a borderline edge miss on one triangle is
    # caught by its neighbor). The round-5 on-TPU smoke tier
    # (tests_tpu/test_tpu_smoke.py) showed it is NOT winner-exact on
    # divergent rays through disjoint quads: 28% different winners with
    # materially different t on the 200k random soup — bf16 edge
    # misclassification, not tie-breaking. Exact mode is now the
    # default (regroup only drives decisive-win scenes, so the cost is
    # ~2% end-to-end); JRT_RG_UVFAST=1 opts back in.
    uv_fast = os.environ.get("JRT_RG_UVFAST", "0") == "1"
    _dot_uv = (
        (lambda a, b: jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        if (uv_fast and jax.default_backend() == "tpu") else _dot
    )

    def kernel(rs_ref, rv_ref, rb_ref, rays_ref, bbox_ref, tab_ref,
               outi_ref,
               cmask_ref, cany_ref, gany_ref,
               bt_ref, btri_ref):
        del rb_ref  # consumed by the BlockSpec index maps only
        j = pl.program_id(0)
        R = GRP
        # rays_ref: [GRP rows, 8 planes, 128]; gather the per-plane
        # [GRP, 128] component mats via static per-row reads
        comp = [
            jnp.concatenate(
                [rays_ref[r, p:p + 1, :] for r in range(R)], axis=0
            )
            for p in range(8)
        ]
        ox, oy, oz, dx, dy, dz, tmin, tmax = comp

        # only (best t, best tri) are tracked per lane: u/v/normals/
        # instance of the single WINNER per lane are recomputed at merge
        # time from the triangle transform (one XLA gather per ray) —
        # selecting them per pass (onehot + 2 sels + a HIGHEST nsel dot
        # + uv flip) was ~half the sweep's VPU and a quarter of its MXU
        bt_ref[:, :] = tmax
        btri_ref[:, :] = jnp.full((R, LANES), -1, jnp.int32)

        @pl.when(rv_ref[j] != 0)
        def _():
            inv = lambda d: 1.0 / jnp.where(d == 0.0, 1e-30, d)
            idx_, idy_, idz_ = inv(dx), inv(dy), inv(dz)

            bm = bbox_ref[0]                          # [sup, 8]
            bmin = (bm[:, 0:1], bm[:, 1:2], bm[:, 2:3])
            bmax = (bm[:, 3:4], bm[:, 4:5], bm[:, 5:6])
            cols = []
            for r in range(R):
                enter = None
                exit_ = None
                for ax, (o, di) in enumerate(((ox, idx_), (oy, idy_), (oz, idz_))):
                    t0 = (bmin[ax] - o[r:r + 1, :]) * di[r:r + 1, :]
                    t1 = (bmax[ax] - o[r:r + 1, :]) * di[r:r + 1, :]
                    lo = jnp.minimum(t0, t1)
                    hi = jnp.maximum(t0, t1)
                    enter = lo if enter is None else jnp.maximum(enter, lo)
                    exit_ = hi if exit_ is None else jnp.minimum(exit_, hi)
                enter = jnp.maximum(enter, tmin[r:r + 1, :])
                exit_ = jnp.minimum(exit_, tmax[r:r + 1, :])
                row_hit = enter <= exit_ * jnp.float32(1.00000024)  # [sup,128]
                cols.append(
                    jnp.any(row_hit, axis=1, keepdims=True).astype(jnp.int32)
                )
            cm = jnp.concatenate(cols, axis=1)        # [sup, R]
            cmask_ref[:, :] = cm
            ca = jnp.sum(cm, axis=1, keepdims=True)
            if os.environ.get("JRT_RG_NOPROC") == "1":  # diagnostics only
                ca = ca * 0
            cany_ref[:, :] = ca
            gany_ref[:, :] = jnp.sum(ca.reshape(-1, G8, 1), axis=1)

            sc = rs_ref[j]
            # per-row homogeneous ray matrices, hoisted out of the
            # cluster loop (an o|d-fused [4,256] RHS variant was tried:
            # same MXU passes, and Mosaic compile time exploded)
            o_hs = [
                jnp.concatenate(
                    [ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :],
                     jnp.ones((1, LANES), jnp.float32)], axis=0,
                )
                for r in range(R)
            ]
            d_hs = [
                jnp.concatenate(
                    [dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :],
                     jnp.zeros((1, LANES), jnp.float32)], axis=0,
                )
                for r in range(R)
            ]

            def process_cluster(ci):
                T = tab_ref[0, ci, 0:12]              # [12, 128]
                A = [
                    jnp.concatenate(
                        [T[3 * r_: 3 * r_ + 3, :], T[9 + r_: 10 + r_, :]],
                        axis=0,
                    )
                    for r_ in range(3)
                ]
                for r in range(R):
                  @pl.when(cmask_ref[ci, r] != 0)
                  def _row(r=r):
                    o_h, d_h = o_hs[r], d_hs[r]
                    opx, opy = _dot_uv(A[0], o_h), _dot_uv(A[1], o_h)
                    dpx, dpy = _dot_uv(A[0], d_h), _dot_uv(A[1], d_h)
                    opz, dpz = _dot(A[2], o_h), _dot(A[2], d_h)

                    bt_row = bt_ref[r:r + 1, :]
                    tt = -opz / jnp.where(dpz == 0.0, 1e-30, dpz)
                    uu = opx + tt * dpx
                    vv = opy + tt * dpy
                    hit = (
                        (dpz != 0.0)
                        & (uu >= 0.0) & (uu <= 1.0)
                        & (vv >= 0.0) & (uu + vv <= 1.0)
                        & (tt >= tmin[r:r + 1, :]) & (tt < bt_row)
                    )
                    tt = jnp.where(hit, tt, 3.4028235e38)
                    min_t = jnp.min(tt, axis=0, keepdims=True)
                    arg = jnp.argmin(tt, axis=0)[None, :]
                    upd = min_t < bt_row

                    rsel = pl.ds(r, 1)
                    btri_ref[rsel, :] = jnp.where(
                        upd, (sc * sup + ci) * TRIS + arg, btri_ref[rsel, :]
                    )
                    bt_ref[rsel, :] = jnp.where(upd, min_t, bt_ref[rsel, :])

            def inner(ci, _):
                @pl.when(cany_ref[ci, 0] != 0)
                def _():
                    process_cluster(ci)
                return 0

            def group(g, _):
                @pl.when(gany_ref[g, 0] != 0)
                def _():
                    jax.lax.fori_loop(g * G8, g * G8 + G8, inner, 0)
                return 0

            jax.lax.fori_loop(0, sup // G8, group, 0)

        # one packed i32 output: plane 0 = winning tri id (-1 = miss),
        # plane 1 = bitcast best t (fold the miss->tmax select here)
        best_tri = btri_ref[:, :]
        valid = (best_tri >= 0) & (best_tri < q * 2)
        tri_out = jnp.where(valid, best_tri, -1)
        t_out = jnp.where(valid, bt_ref[:, :], tmax)
        outi_ref[0:R, :, :] = jnp.stack(
            [tri_out, jax.lax.bitcast_convert_type(t_out, jnp.int32)]
            + [jnp.zeros((R, LANES), jnp.int32)] * 6, axis=1,
        )

    return kernel


def make_cluster_intersect_regroup(prim_verts_np: np.ndarray,
                                   prim_instance=None,
                                   interpret: bool = False,
                                   cache_key: str = "",
                                   blk_cap: int | None = None,
                                   livegate: float | None = None):
    """Regroup intersector -> Hit; drop-in for
    make_cluster_intersect_worklist (same tables triple + a lower-
    triangular pack constant). Reference hot loop: src/bvh.jl:306-371."""
    if blk_cap is None:  # env read at build time, not import (ADVICE r4)
        blk_cap = int(os.environ.get("JRT_RG_BLKCAP") or DEF_BLK_CAP)
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
    # strict-lower prefix constants for the two-level rank
    lt128_d = jnp.asarray(
        np.tril(np.ones((LANES, LANES), np.float32), k=-1).T
    )  # lt128[c', c] = c' < c
    l8_d = jnp.asarray(np.tril(np.ones((8, 8), np.float32), k=-1))
    default_tables = (tab_d, bbox_d, sbbox_d, lt128_d, l8_d)

    S = n_super
    rows_cap = max(GRP, (blk_cap - S * SLACK - SLACK) // GRP * GRP)

    # ray blocks per chunk: bounds the count-stage transients (the bits
    # tensor is [nb, S, 8, 128] f32 = nb*S*4 KiB). 288 covers a full
    # 720p dispatch in ONE chunk; for very large S the chunk scales
    # down to keep bits <= ~300 MB (ADVICE r4). Env read at build time.
    rg_chunk_blocks = int(os.environ.get("JRT_RG_CHUNK") or DEF_RG_CHUNK_BLOCKS)
    rg_chunk_blocks = max(16, min(rg_chunk_blocks, 73000 // max(S, 1)))

    # liveness gate: below this alive fraction the worklist fallback is
    # faster than regroup's fixed count/pack/unpack floor. Measured
    # crossover ~0.4-0.5 alive on kitchen bounce rays with dead lanes at
    # tmax<0 (tools/liveness_ab.py: alive 0.5 -> 194 rg vs 200 wl ms;
    # 0.25 -> 139 vs 106; 0.03 -> 99 vs 50). Dead lanes are detected by
    # tmax <= 0 (render/integrator.py dispatches dead lanes at -1).
    # Callers with a decisive predicted regroup win pass a lower gate
    # (kernel_select ratio < 0.25 -> 0.2: ecosys 4,613 -> 4,394
    # ms/sample measured); env overrides both.
    env_lg = os.environ.get("JRT_RG_LIVEGATE")
    if env_lg is not None:
        livegate = float(env_lg)
    elif livegate is None:
        livegate = 0.45

    # worklist fallback for W / capacity overflow (shares the table cache)
    fallback = make_cluster_intersect_worklist(
        prim_verts_np, prim_instance, interpret=interpret, cache_key=cache_key
    )

    pack_kernel = _make_pack_kernel(S, blk_cap)
    tri_kernel = _make_tritest_kernel(sup, q)
    unpack_kernel = _make_unpack_kernel(S)

    def pack_call(bits_t, rays_t, seg_base, n_tiles, lt128_t, l8_t):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles, S),
            in_specs=[
                pl.BlockSpec((LANES, LANES), lambda t, s, sb: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 8), lambda t, s, sb: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, LANES),
                             lambda t, s, sb: (t, s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_CHUNK_ROWS, TILE),
                             lambda t, s, sb: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((WIN, 8, LANES), jnp.float32),
                pltpu.VMEM((WIN, 8, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((S,), jnp.int32),
                pltpu.VMEM((S, 8, LANES), jnp.float32),
                pltpu.SMEM((5,), jnp.int32),
            ],
        )
        return pl.pallas_call(
            pack_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((blk_cap, 8, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(seg_base, lt128_t, l8_t, bits_t, rays_t)[0]

    def unpack_call(bits_t, uslot, trires, n_tiles, lt128_t, l8_t):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles, S),
            in_specs=[
                pl.BlockSpec((LANES, LANES), lambda t, s, us: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 8), lambda t, s, us: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, LANES),
                             lambda t, s, us: (t, s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 2, TILE), lambda t, s, us: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((WIN, 8, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((8, TILE), jnp.float32),
                pltpu.VMEM((1, TILE), jnp.float32),
                pltpu.VMEM((1, TILE), jnp.int32),
            ],
        )
        return pl.pallas_call(
            unpack_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, 2, TILE), jnp.int32),
            ],
            interpret=interpret,
        )(uslot, lt128_t, l8_t, bits_t, trires)[0]

    def tri_call(grp_super, grp_valid, grp_blk, packed, bbox_t, tab_t,
                 cap=None):
        cap = rows_cap if cap is None else cap
        n_grp = cap // GRP
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_grp,),
            in_specs=[
                pl.BlockSpec((GRP, 8, LANES),
                             lambda j, rs, rv, rb: (rb[j], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sup, 8), lambda j, rs, rv, rb: (rs[j], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sup, 16, TRIS),
                             lambda j, rs, rv, rb: (rs[j], 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((GRP, 8, LANES), lambda j, rs, rv, rb: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((sup, GRP), jnp.int32),
                pltpu.VMEM((sup, 1), jnp.int32),
                pltpu.VMEM((max(sup // 8, 1), 1), jnp.int32),
                pltpu.VMEM((GRP, LANES), jnp.float32),
                pltpu.VMEM((GRP, LANES), jnp.int32),
            ],
        )
        return pl.pallas_call(
            tri_kernel,
            grid_spec=grid_spec,
            # +2*GRP guard rows: the unpack kernel's 9-block window DMA
            # can read up to WIN-1 rows past total_rows; the guard rows
            # are never written (grid covers cap) and their garbage is
            # only multiplied against zero one-hot columns
            out_shape=[
                jax.ShapeDtypeStruct((cap + 2 * GRP, 8, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(grp_super[:n_grp], grp_valid[:n_grp], grp_blk[:n_grp],
          packed, bbox_t, tab_t)[0]

    def _count_stage(comps, nblocks, sbbox_t):
        """Slab rays vs supercluster boxes -> everything the pack and
        tri-test dispatches need. comps: 8 [nblocks*ROWS, LANES].

        The bit matrix is generated DIRECTLY in the pack kernel's
        [tiles, S, 1024] layout (rays on lanes): a [rays, S] layout
        would need a lane<->sublane transpose of ~100 MB, which measured
        ~45 ms fused with the reductions."""
        n_tiles = nblocks
        # [tiles, 1, 8, 128] per component vs [1, S, 1, 1] per box bound
        o3 = [c.reshape(n_tiles, 1, 8, LANES) for c in comps[0:3]]
        d3 = [c.reshape(n_tiles, 1, 8, LANES) for c in comps[3:6]]
        tn = comps[6].reshape(n_tiles, 1, 8, LANES)
        tx = comps[7].reshape(n_tiles, 1, 8, LANES)
        enter = None
        exit_ = None
        for ax in range(3):
            di = 1.0 / jnp.where(d3[ax] == 0.0, 1e-30, d3[ax])
            b_lo = sbbox_t[None, :, ax, None, None]
            b_hi = sbbox_t[None, :, 3 + ax, None, None]
            t0 = (b_lo - o3[ax]) * di
            t1 = (b_hi - o3[ax]) * di
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            enter = lo if enter is None else jnp.maximum(enter, lo)
            exit_ = hi if exit_ is None else jnp.minimum(exit_, hi)
        enter = jnp.maximum(enter, tn)
        exit_ = jnp.minimum(exit_, tx)
        bits = enter <= exit_ * jnp.float32(1.00000024)  # [t, S, 8, 128]
        bits = jax.lax.optimization_barrier(bits.astype(jnp.float32))

        per_ray = jnp.sum(bits, axis=1).reshape(-1)         # [rays]
        cnt_s = jnp.sum(bits, axis=(0, 2, 3)).astype(jnp.int32)  # [S]
        # rows per segment padded to GRP so tri-test groups never span a
        # segment boundary and the packed blocks of a group stay
        # GRP-aligned (segblk stays a multiple of GRP: SLACK == GRP)
        nblk_s = -(-((cnt_s + LANES - 1) // LANES) // GRP) * GRP
        row_start = jnp.cumsum(nblk_s) - nblk_s             # exclusive
        total_rows = row_start[-1] + nblk_s[-1]
        segblk = jnp.cumsum(nblk_s + SLACK) - (nblk_s + SLACK)
        seg_base = (segblk * LANES).astype(jnp.int32)       # slot domain
        total_blk = segblk[-1] + nblk_s[-1] + SLACK
        # per-(tile, super) ROW-domain slot base for the unpack kernel:
        # the pack cursor state is deterministic from the counts
        cnt_ts = jnp.sum(bits, axis=(2, 3)).astype(jnp.int32)  # [t, S]
        cum_ts = jnp.cumsum(cnt_ts, axis=0) - cnt_ts
        uslot = (
            row_start[None, :] * LANES + cum_ts
        ).astype(jnp.int32).reshape(-1)                     # [t*S]

        n_grp = rows_cap // GRP
        g = jnp.arange(n_grp, dtype=jnp.int32)
        ends_g = jnp.cumsum(nblk_s // GRP)
        grp_super = jnp.searchsorted(ends_g, g, side="right").astype(jnp.int32)
        grp_super = jnp.minimum(grp_super, S - 1)
        grp_valid = (g < total_rows // GRP).astype(jnp.int32)
        grp_start = ends_g - nblk_s // GRP
        grp_blk = segblk[grp_super] // GRP + (g - grp_start[grp_super])
        grp_blk = jnp.clip(grp_blk, 0, blk_cap // GRP - 1).astype(jnp.int32)

        bits_t = bits
        del per_ray  # no W bound anymore: the unpack path has no
        # per-ray fan-out limit (the inverse map did)
        overflow = (total_rows > rows_cap) | (total_blk > blk_cap)
        return (bits_t, seg_base, uslot, grp_super, grp_valid, grp_blk,
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

    def _regroup_chunk(comps, nb, tab_t, bbox_t, sbbox_t, lt128_t, l8_t):
        (bits_t, seg_base, uslot, grp_super, grp_valid, grp_blk,
         overflow, total_rows) = _count_stage(comps, nb, sbbox_t)
        rays_t = _chunk_planes(comps)

        def merge(outu):
            """Recompute the winner's u/v/normal/instance from its
            triangle transform (one [rays, 16] table gather) -> packed
            chunk outputs. The sweep kernel only emits (tri, t) per
            slot (selecting the other attributes per pass was ~half its
            VPU work); the unpack kernel already min-merged per ray."""
            tri = outu[:, 0, :].reshape(-1)                 # [rays]
            t = jax.lax.bitcast_convert_type(
                outu[:, 1, :].reshape(-1), jnp.float32
            )
            hit = tri >= 0
            prim = jnp.where(hit, tri // 2, -1)

            # winner attribute recompute from the packed table (flat
            # 1-D indices: multi-coordinate gathers lower poorly)
            tabf = tab_t.reshape(-1)
            tri_c = jnp.maximum(tri, 0)
            cl = tri_c // TRIS
            ln = tri_c % TRIS
            fidx = ((cl * 16)[:, None] + jnp.arange(16)[None, :]) * TRIS \
                + ln[:, None]
            rowsv = tabf[fidx]                              # [rays, 16]
            oxr, oyr, ozr = (c.reshape(-1) for c in comps[0:3])
            dxr, dyr, dzr = (c.reshape(-1) for c in comps[3:6])
            dot3 = lambda k, x, y, z: (
                rowsv[:, k] * x + rowsv[:, k + 1] * y + rowsv[:, k + 2] * z
            )
            opx = dot3(0, oxr, oyr, ozr) + rowsv[:, 9]
            opy = dot3(3, oxr, oyr, ozr) + rowsv[:, 10]
            opz = dot3(6, oxr, oyr, ozr) + rowsv[:, 11]
            dpx = dot3(0, dxr, dyr, dzr)
            dpy = dot3(3, dxr, dyr, dzr)
            dpz = dot3(6, dxr, dyr, dzr)
            tt = -opz / jnp.where(dpz == 0.0, 1e-30, dpz)
            u = opx + tt * dpx
            v = opy + tt * dpy
            odd = (tri % 2) == 1
            u = jnp.where(odd, 1.0 - u, u)
            v = jnp.where(odd, 1.0 - v, v)
            u = jnp.where(hit, u, 0.0)
            v = jnp.where(hit, v, 0.0)
            nx = jnp.where(hit, rowsv[:, 12], 0.0)
            ny = jnp.where(hit, rowsv[:, 13], 0.0)
            nz = jnp.where(hit, rowsv[:, 14], 0.0)
            inst = jnp.where(hit, (rowsv[:, 15] + 0.5).astype(jnp.int32), 0)

            tx = comps[7].reshape(-1)
            t_out = jnp.where(hit, t, tx)
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
            packed = pack_call(bits_t, rays_t, seg_base, nb, lt128_t, l8_t)
            trires = tri_call(grp_super, grp_valid, grp_blk,
                              packed, bbox_t, tab_t)
            outu = unpack_call(bits_t, uslot, trires, nb, lt128_t, l8_t)
            return merge(outu)

        def fb(_):
            # sub-chunk with the worklist's S-scaled size so its
            # [chunk_rays, S] precull temporaries stay bounded for
            # large S (ADVICE r4: one 288-block call bypassed that cap)
            fb_blocks = max(16, min(nb, (256 * 192) // max(S, 1)))
            parts = []
            for lo in range(0, nb, fb_blocks):
                hi = min(lo + fb_blocks, nb)
                cc = [c[lo * ROWS:hi * ROWS] for c in comps]
                parts.append(
                    fallback.impl_chunk(cc, hi - lo, (tab_t, bbox_t, sbbox_t))
                )
            if len(parts) == 1:
                return parts[0]
            return (jnp.concatenate([p[0] for p in parts], axis=0),
                    jnp.concatenate([p[1] for p in parts], axis=0))

        use_fb = overflow
        if livegate > 0.0:
            live = jnp.sum((comps[7] > 0.0).astype(jnp.int32))
            use_fb = use_fb | (
                live < jnp.int32(int(livegate * nb * BLOCK_RAYS))
            )
        return jax.lax.cond(use_fb, fb, regroup, None)

    def _intersect_impl(ro, rd, tmin, tmax, tables):
        tab_t, bbox_t, sbbox_t, lt128_t, l8_t = tables
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
        for blo in range(0, nblocks, rg_chunk_blocks):
            bhi = min(blo + rg_chunk_blocks, nblocks)
            nb = bhi - blo
            rsel = slice(blo * ROWS, bhi * ROWS)
            ccomp = [c[rsel] for c in comps]
            of, oi = _regroup_chunk(ccomp, nb, tab_t, bbox_t, sbbox_t,
                                    lt128_t, l8_t)
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

        tab_t, bbox_t, sbbox_t, lt128_t, l8_t = default_tables
        n = ro.shape[0]
        nb = min(-(-n // BLOCK_RAYS), rg_chunk_blocks)
        n_use = nb * BLOCK_RAYS
        if n < n_use:
            raise ValueError("debug_profile wants >= one full chunk")

        def prep(x):
            return x[:n_use].reshape(-1, LANES)

        comps = [
            prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(tmin), prep(tmax),
        ]
        count_j = jax.jit(lambda c: _count_stage(c, nb, sbbox_t) + (
            _chunk_planes(c),))
        pack_j = jax.jit(
            lambda bt, rt, sb: pack_call(bt, rt, sb, nb, lt128_t, l8_t))
        tri_j = jax.jit(
            lambda rs, rv, rb, pk: tri_call(rs, rv, rb, pk, bbox_t, tab_t))
        unp_j = jax.jit(
            lambda bt, us, tr: unpack_call(bt, us, tr, nb, lt128_t, l8_t))

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
        (bits_t, seg_base, uslot, grp_super, grp_valid, grp_blk,
         overflow, total_rows, rays_t) = cnt_out
        print(f"  overflow={bool(overflow)} rows={int(total_rows)}"
              f"/{rows_cap}")
        packed = timed("pack", pack_j, bits_t, rays_t, seg_base)
        trires = timed("tri-test", tri_j, grp_super, grp_valid, grp_blk,
                       packed)
        timed("unpack", unp_j, bits_t, uslot, trires)

    intersect.tables = default_tables
    intersect.wants_tables = True
    intersect.debug_profile = debug_profile
    # coherent camera rays favor the worklist kernel (their block unions
    # ~equal per-ray footprints, so regrouping is pure overhead: kitchen
    # primaries measured 137 ms worklist vs 176 ms regroup); expose the
    # already-built fallback so build_intersector can route primary
    # dispatches there. It takes the regroup 5-tuple and slices off the
    # pack constants.
    def primary(ro, rd, tmin, tmax, tables=None):
        return fallback(ro, rd, tmin, tmax,
                        tables[:3] if tables is not None else None)

    primary.wants_tables = True
    primary.tables = default_tables
    intersect.primary = primary
    # internals exposed for diagnostics (tools/ab_regroup.py bisection)
    intersect._internals = dict(
        count=_count_stage, chunk=_chunk_planes, pack=pack_call,
        tri=tri_call, unpack=unpack_call, rows_cap=rows_cap,
        blk_cap=blk_cap,
    )
    return intersect
