"""Pallas TPU kernel: cluster-culled scene intersection for mid-size scenes.

The reference's per-ray BVH walk (src/bvh.jl:306-491) maps terribly to a
SIMD machine: a lockstep jnp port spends its time in per-lane node
gathers. This kernel replaces pointer chasing with the structure TPUs
like: Morton-ordered primitives are grouped into fixed-size clusters
(P=64 prims = 128 triangles); each 1024-ray block slab-tests every
cluster bbox at once (pairwise [C, 128] VPU work per sublane row),
reduces to a per-cluster "any ray wants it" mask, and then — only for
surviving clusters, under a predicated branch — intersects all 128
triangles against the block's rays.

The triangle test uses the unit-triangle affine form: each triangle
carries a 3x4 transform A mapping world space to (u, v, w) barycentric
space, so o' = A·[o,1], d' = A·[d,0] become [4,128] x [4,128] MXU
matmuls per sublane row and the hit test collapses to ~15 elementwise
ops on [128, 128]:
    t = -o'_z / d'_z,  u = o'_x + t d'_x,  v = o'_y + t d'_y.
Quad semantics match intersect_quad (src/geometry.jl:238-258): prim i
yields triangles (p1,p2,p4) and (p3,p4,p2), the second with flipped uv;
degenerate/padding triangles get transforms that can never hit.

All tables live in VMEM, so this path covers scenes up to ~150k prims
(transforms [C,12,128] + normals [C,4,128] ~ 8 KB/cluster); larger
scenes fall back to the gather BVH until the hierarchical (two-level)
variant lands.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from julia_raytracer_tpu.ops.traversal import Hit

PRIMS_PER_CLUSTER = 64  # -> 128 triangles per cluster
TRIS = 2 * PRIMS_PER_CLUSTER
ROWS = 8
LANES = 128
BLOCK_RAYS = ROWS * LANES  # 1024
# VMEM budget: tables cost ~8 KB/cluster + ~1 KB/cluster of tile-padded
# bbox/mask rows against the 16 MB limit; above this the streamed variant
# takes over (classroom at 103k prims measurably OOMs the VMEM path)
MAX_VMEM_PRIMS = 80_000


def _cross(a, b):
    """np.cross without its moveaxis/ufunc overhead (~4x faster on the
    multi-million-row batches the kitchen-class table build feeds it)."""
    out = np.empty_like(a)
    a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    out[:, 0] = a1 * b2 - a2 * b1
    out[:, 1] = a2 * b0 - a0 * b2
    out[:, 2] = a0 * b1 - a1 * b0
    return out


def _tri_transforms_batch(a, b, c):
    """Batched 3x4 affine world->barycentric transforms.

    a/b/c: [T, 3] f64 triangle corners -> [T, 12] rows
    (m_u 3, m_v 3, n_hat 3, t_u t_v t_w). Degenerate rows become the
    never-hit transform (d'_w = 0, o'_w = 1).

    The w row uses the UNIT normal (signed plane distance) instead of the
    inverse's third row — the same zero set, but it conditions
    t = -o'_w/d'_w properly for small/thin triangles in f32."""
    t_count = len(a)
    e1 = b - a
    e2 = c - a
    n = _cross(e1, e2)
    det = np.einsum("ij,ij->i", n, n)
    ok = (det > 0) & np.isfinite(det)
    safe_det = np.where(ok, det, 1.0)
    nhat = n / np.sqrt(safe_det)[:, None]

    # inverse of E = [e1 | e2 | n] via adjugate: rows of E^-1 are
    # (e2 x n, n x e1, e1 x e2) / det(E); det(E) = n.(e1 x e2) = |n|^2
    m0 = _cross(e2, n) / safe_det[:, None]
    m1 = _cross(n, e1) / safe_det[:, None]

    out = np.zeros((t_count, 12))
    out[:, 0:3] = m0
    out[:, 3:6] = m1
    out[:, 6:9] = nhat
    out[:, 9] = -np.einsum("ij,ij->i", m0, a)
    out[:, 10] = -np.einsum("ij,ij->i", m1, a)
    out[:, 11] = -np.einsum("ij,ij->i", nhat, a)
    never = np.zeros(12)
    never[11] = 1.0
    out[~ok] = never
    return out, ok


def _tn(a_, b_, c_):
    nn = _cross(b_ - a_, c_ - a_)
    l = np.sqrt(np.einsum("ij,ij->i", nn, nn))[:, None]
    return nn / np.where(l > 0, l, 1.0)


def build_cluster_tables(prim_verts: np.ndarray, prim_instance=None):
    """prim_verts [Q,4,3] (Morton/BVH order) -> (tfm [C,12,128],
    nrm [C,4,128], bbox [C,8], n_clusters). Row 3 of the normal table
    carries the owning instance id (as f32) so the kernel can emit it
    without a shading-time gather. Padding prims never hit.

    Built in cluster-aligned chunks across a thread pool: the transform
    solve is f64 (conditioning for thin triangles) but only ever chunk-
    local, so there is no whole-scene f64 copy, and the f32 cast merges
    into the output assignment. Kitchen (1.44M prims): ~40 s single-pass
    f64 -> ~7 s chunked on a 4-core host."""
    from concurrent.futures import ThreadPoolExecutor

    q = len(prim_verts)
    c = max(1, -(-q // PRIMS_PER_CLUSTER))

    pv32 = np.asarray(prim_verts, np.float32)
    tfm = np.empty((c, 12, TRIS), np.float32)
    nrm4 = np.zeros((c, 4, TRIS), np.float32)
    bbox = np.empty((c, 8), np.float32)

    if prim_instance is not None and q:
        iid = np.zeros(c * PRIMS_PER_CLUSTER, np.float32)
        iid[:q] = np.asarray(prim_instance, np.float32)
        nrm4[:, 3, :] = np.repeat(iid, 2).reshape(c, TRIS)

    # Fully-padded rows get min=max=+3e38: the slab test then yields
    # enter=max_axes(t) > exit=min_axes(t) for every non-diagonal ray, so
    # padding clusters genuinely never pass the cull (an inverted box like
    # min=+1/max=-1 is indistinguishable from [-1,1]^3 after the per-axis
    # min/max swap and wastes full sweeps on origin-centered scenes).
    NOHIT = np.float32(3e38)

    # native (C++/OpenMP) fast path: same math, ~10x the chunked-numpy
    # build; falls back below when no compiler is available
    from julia_raytracer_tpu.ops.native import build_cluster_tables_native

    pv32c = np.ascontiguousarray(pv32)
    if build_cluster_tables_native(pv32c, q, c, tfm, nrm4, bbox):
        return tfm, nrm4, bbox, c

    def fill(c_lo: int, c_hi: int) -> None:
        p_lo = c_lo * PRIMS_PER_CLUSTER
        p_hi = c_hi * PRIMS_PER_CLUSTER
        nreal = max(0, min(q, p_hi) - p_lo)
        n = p_hi - p_lo
        pv = np.zeros((n, 4, 3))  # chunk-local f64
        pv[:nreal] = pv32[p_lo : p_lo + nreal]
        p1, p2, p3, p4 = pv[:, 0], pv[:, 1], pv[:, 2], pv[:, 3]

        tf0, _ = _tri_transforms_batch(p1, p2, p4)
        tf1, _ = _tri_transforms_batch(p3, p4, p2)
        tf = np.empty((n, 2, 12))
        tf[:, 0] = tf0
        tf[:, 1] = tf1
        tfm[c_lo:c_hi] = np.swapaxes(tf.reshape(c_hi - c_lo, TRIS, 12), 1, 2)

        en = _tn(p1, p2, p4) + _tn(p3, p4, p2)
        l = np.sqrt(np.einsum("ij,ij->i", en, en))[:, None]
        en = en / np.where(l > 0, l, 1.0)
        nrm4[c_lo:c_hi, :3] = np.swapaxes(
            np.repeat(en, 2, axis=0).reshape(c_hi - c_lo, TRIS, 3), 1, 2
        )

        pv[nreal:] = np.inf
        bbox[c_lo:c_hi, 0:3] = np.nan_to_num(
            pv.reshape(c_hi - c_lo, -1, 3).min(axis=1), posinf=NOHIT
        )
        pv[nreal:] = -np.inf
        bbox[c_lo:c_hi, 3:6] = np.nan_to_num(
            pv.reshape(c_hi - c_lo, -1, 3).max(axis=1), neginf=NOHIT
        )
        bbox[c_lo:c_hi, 6:8] = 0.0

    workers = min(4, max(1, (os.cpu_count() or 1)))
    chunk = max(256, -(-c // (workers * 4)))
    ranges = [(lo, min(lo + chunk, c)) for lo in range(0, c, chunk)]
    if len(ranges) <= 1:
        fill(0, c)
    else:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(lambda r: fill(*r), ranges))
    return tfm, nrm4, bbox, c


def _make_kernel(n_clusters: int, q: int):
    C = n_clusters

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref, bbox_ref, tfm_ref, nrm_ref,
               prim_ref, u_ref, v_ref, t_ref, px_ref, py_ref, pz_ref,
               nx_ref, ny_ref, nz_ref, in_ref,
               mask_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]  # [8, 128]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmin, tmax = tmin_ref[:], tmax_ref[:]

        inv = lambda d: 1.0 / jnp.where(d == 0.0, 1e-30, d)
        idx_, idy_, idz_ = inv(dx), inv(dy), inv(dz)

        # ---- phase A: cluster-bbox cull, one sublane row at a time
        bm = bbox_ref[:]  # [C, 8]
        bmin = (bm[:, 0:1], bm[:, 1:2], bm[:, 2:3])
        bmax = (bm[:, 3:4], bm[:, 4:5], bm[:, 5:6])

        mask = jnp.zeros((C, 1), jnp.int32)
        for r in range(ROWS):
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
            row_hit = enter <= exit_ * jnp.float32(1.00000024)  # [C, 128]
            mask = mask | jnp.any(row_hit, axis=1, keepdims=True).astype(jnp.int32)
        mask_ref[:, :] = mask

        # ---- phase B: per-cluster triangle sweep
        tri_ids = jax.lax.broadcasted_iota(jnp.int32, (TRIS, LANES), 0)

        def cluster_body(c, carry):
            def process(carry):
                (best_t, best_tri, best_u, best_v,
                 best_nx, best_ny, best_nz, best_in) = carry
                T = tfm_ref[c]  # [12, 128]
                nrm = nrm_ref[c]  # [4, 128]
                A = [
                    jnp.concatenate(
                        [T[3 * r_: 3 * r_ + 3, :], T[9 + r_: 10 + r_, :]], axis=0
                    )
                    for r_ in range(3)
                ]  # 3 x [4, 128] (m_r0, m_r1, m_r2, t_r)

                for r in range(ROWS):
                    o_h = jnp.concatenate(
                        [ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :],
                         jnp.ones((1, LANES), jnp.float32)], axis=0,
                    )  # [4, 128rays]
                    d_h = jnp.concatenate(
                        [dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :],
                         jnp.zeros((1, LANES), jnp.float32)], axis=0,
                    )
                    # precision=HIGHEST: default TPU f32 matmul runs as a
                    # single bf16 pass (~0.4% error) — ray transforms need
                    # the full-precision decomposition
                    dot = lambda a_, b_: jax.lax.dot_general(
                        a_, b_, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [128tri, 128ray]
                    opx, opy, opz = dot(A[0], o_h), dot(A[1], o_h), dot(A[2], o_h)
                    dpx, dpy, dpz = dot(A[0], d_h), dot(A[1], d_h), dot(A[2], d_h)

                    bt_row = best_t[r:r + 1, :]
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
                    min_t = jnp.min(tt, axis=0, keepdims=True)  # [1, 128]
                    arg = jnp.argmin(tt, axis=0)[None, :]  # first-min
                    upd = min_t < bt_row
                    onehot = (tri_ids == arg).astype(jnp.float32)
                    sel = lambda x: jnp.sum(x * onehot, axis=0, keepdims=True)
                    u_sel = sel(uu)
                    v_sel = sel(vv)
                    nsel = _nsel_dot(nrm, onehot)
                    nx_sel = nsel[0:1, :]
                    ny_sel = nsel[1:2, :]
                    nz_sel = nsel[2:3, :]
                    inst_sel = nsel[3:4, :]  # instance id rides the normal table

                    odd = (arg % 2) == 1
                    u_sel = jnp.where(odd, 1.0 - u_sel, u_sel)
                    v_sel = jnp.where(odd, 1.0 - v_sel, v_sel)

                    rowsel = (
                        jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) == r
                    )
                    write = rowsel & upd  # [8,128] via broadcast of [1,128]

                    def put(dst, row_val):
                        return jnp.where(write, row_val, dst)

                    best_u = put(best_u, u_sel)
                    best_v = put(best_v, v_sel)
                    best_nx = put(best_nx, nx_sel)
                    best_ny = put(best_ny, ny_sel)
                    best_nz = put(best_nz, nz_sel)
                    best_in = put(best_in, inst_sel)
                    best_tri = put(best_tri, c * TRIS + arg)
                    best_t = put(best_t, min_t)
                return best_t, best_tri, best_u, best_v, best_nx, best_ny, best_nz, best_in

            return jax.lax.cond(mask_ref[c, 0] != 0, process, lambda cr: cr, carry)

        carry = (
            tmax,
            jnp.full((ROWS, LANES), -1, jnp.int32),
            jnp.zeros((ROWS, LANES), jnp.float32),
            jnp.zeros((ROWS, LANES), jnp.float32),
            jnp.zeros((ROWS, LANES), jnp.float32),
            jnp.zeros((ROWS, LANES), jnp.float32),
            jnp.zeros((ROWS, LANES), jnp.float32),
            jnp.zeros((ROWS, LANES), jnp.float32),
        )
        carry = jax.lax.fori_loop(0, C, cluster_body, carry)
        best_t, best_tri, best_u, best_v, best_nx, best_ny, best_nz, best_in = carry

        prim = jnp.where(best_tri >= 0, best_tri // 2, -1)
        prim = jnp.where(prim >= q, -1, prim)
        hit = prim >= 0
        t_out = jnp.where(hit, best_t, tmax)
        prim_ref[:, :] = prim
        u_ref[:, :] = best_u
        v_ref[:, :] = best_v
        t_ref[:, :] = t_out
        px_ref[:, :] = ox + t_out * dx
        py_ref[:, :] = oy + t_out * dy
        pz_ref[:, :] = oz + t_out * dz
        nx_ref[:, :] = best_nx
        ny_ref[:, :] = best_ny
        nz_ref[:, :] = best_nz
        in_ref[:, :] = (best_in + 0.5).astype(jnp.int32)

    return kernel


def make_cluster_intersect(prim_verts_np: np.ndarray, prim_instance=None,
                           interpret: bool = False):
    """Build intersect(ro, rd, tmin, tmax) -> Hit backed by the cluster
    kernel. Tables are device-resident (VMEM) per scene."""
    q = len(prim_verts_np)
    tfm, nrm, bbox, n_clusters = build_cluster_tables(
        np.asarray(prim_verts_np, np.float64), prim_instance
    )
    tfm_d = jnp.asarray(tfm)
    nrm_d = jnp.asarray(nrm)
    bbox_d = jnp.asarray(bbox)
    kernel = _make_kernel(n_clusters, q)

    vec_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    @jax.jit
    def intersect(ro, rd, tmin, tmax):
        n = ro.shape[0]
        n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
        pad = n_pad - n

        def prep(x):
            return jnp.pad(x, ((0, pad),)).reshape(-1, LANES)

        args = [
            prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(tmin), prep(tmax),
        ]
        nblocks = args[0].shape[0] // ROWS
        shape_f = jax.ShapeDtypeStruct(args[0].shape, jnp.float32)
        shape_i = jax.ShapeDtypeStruct(args[0].shape, jnp.int32)
        outs = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[vec_spec] * 8 + [
                full(bbox.shape), full(tfm.shape), full(nrm.shape)
            ],
            out_specs=[vec_spec] * 11,
            out_shape=[shape_i] + [shape_f] * 9 + [shape_i],
            scratch_shapes=[pltpu.VMEM((n_clusters, 1), jnp.int32)],
            interpret=interpret,
        )(*args, bbox_d, tfm_d, nrm_d)

        unpack = lambda x: x.reshape(-1)[:n]
        prim, u, v, t = (unpack(outs[0]), unpack(outs[1]), unpack(outs[2]), unpack(outs[3]))
        pos = jnp.stack([unpack(outs[4]), unpack(outs[5]), unpack(outs[6])], axis=-1)
        gn = jnp.stack([unpack(outs[7]), unpack(outs[8]), unpack(outs[9])], axis=-1)
        hit = prim >= 0
        return Hit(hit, prim, u, v, jnp.where(hit, t, tmax), pos, gn, unpack(outs[10]))

    return intersect


# ---------------------------------------------------------------------------
# HBM-streaming hierarchical variant (large scenes: kitchen/bathroom/ecosys)
# ---------------------------------------------------------------------------

SUPER = 64  # clusters per supercluster


def build_super_bbox(bbox: np.ndarray) -> np.ndarray:
    """Cluster bboxes [C,8] -> supercluster bboxes [S,8] over groups of 64."""
    c = len(bbox)
    s = -(-c // SUPER)
    pad = s * SUPER - c
    bb = np.concatenate([bbox, np.tile(bbox[-1:], (pad, 1))], axis=0) if pad else bbox
    bb = bb.reshape(s, SUPER, 8)
    out = np.zeros((s, 8), np.float32)
    out[:, 0:3] = bb[:, :, 0:3].min(axis=1)
    out[:, 3:6] = bb[:, :, 3:6].max(axis=1)
    return out


def _make_kernel_streamed(n_super: int, n_clusters: int, q: int):
    """Large-scene kernel: grid = (ray_blocks, superclusters). The Pallas
    pipeline streams one supercluster's tables ([64,12,128] ~ 400 KB) per
    grid step from HBM — automatic double-buffered DMA (manual
    make_async_copy from HBM faults through the axon tunnel). Outputs are
    revisited across the supercluster axis; best-hit state lives in VMEM
    scratch, which persists across sequential grid steps. Compute (not the
    stream) is skipped for culled superclusters via pl.when."""
    S, C = n_super, n_clusters
    _dot = _make_tri_dot()

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref, bbox_ref, sbbox_ref, tfm_ref, nrm_ref,
               prim_ref, u_ref, v_ref, t_ref, px_ref, py_ref, pz_ref,
               nx_ref, ny_ref, nz_ref, in_ref,
               cmask_ref, smask_ref,
               bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
               bin_ref):
        s_id = pl.program_id(1)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]  # [8, 128]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmin, tmax = tmin_ref[:], tmax_ref[:]

        inv = lambda d: 1.0 / jnp.where(d == 0.0, 1e-30, d)
        idx_, idy_, idz_ = inv(dx), inv(dy), inv(dz)

        def cull(bm, per_row=False):
            """bm [K, 8] -> any-ray-hits mask [K, 1] i32, or the
            per-(cluster, row) mask [K, ROWS] when per_row (the sweep
            skips rows whose 128 rays all miss — big win for divergent
            bounce wavefronts)."""
            K = bm.shape[0]
            bmin = (bm[:, 0:1], bm[:, 1:2], bm[:, 2:3])
            bmax = (bm[:, 3:4], bm[:, 4:5], bm[:, 5:6])
            cols = []
            for r in range(ROWS):
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
                row_hit = enter <= exit_ * jnp.float32(1.00000024)
                cols.append(
                    jnp.any(row_hit, axis=1, keepdims=True).astype(jnp.int32)
                )
            full = jnp.concatenate(cols, axis=1)  # [K, ROWS]
            if per_row:
                return full
            return jnp.any(full > 0, axis=1, keepdims=True).astype(jnp.int32)

        # first supercluster step for this ray block: cull + init state
        @pl.when(s_id == 0)
        def _():
            smask_ref[:, :] = cull(sbbox_ref[:])

            bt_ref[:, :] = tmax
            btri_ref[:, :] = jnp.full((ROWS, LANES), -1, jnp.int32)
            bu_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bv_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bnx_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bny_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bnz_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bin_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)

        tri_ids = jax.lax.broadcasted_iota(jnp.int32, (TRIS, LANES), 0)

        def process_cluster(ci):
            """Intersect cluster (s_id*SUPER + ci) from the streamed block."""
            T = tfm_ref[ci]  # [12, 128]
            nrm = nrm_ref[ci]  # [4, 128]
            A = [
                jnp.concatenate(
                    [T[3 * r_: 3 * r_ + 3, :], T[9 + r_: 10 + r_, :]], axis=0
                )
                for r_ in range(3)
            ]
            for r in range(ROWS):
              @pl.when(cmask_ref[ci, r] != 0)
              def _row(r=r):
                o_h = jnp.concatenate(
                    [ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :],
                     jnp.ones((1, LANES), jnp.float32)], axis=0,
                )
                d_h = jnp.concatenate(
                    [dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :],
                     jnp.zeros((1, LANES), jnp.float32)], axis=0,
                )
                dot = _dot
                opx, opy, opz = dot(A[0], o_h), dot(A[1], o_h), dot(A[2], o_h)
                dpx, dpy, dpz = dot(A[0], d_h), dot(A[1], d_h), dot(A[2], d_h)

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
                onehot = (tri_ids == arg).astype(jnp.float32)
                sel = lambda x: jnp.sum(x * onehot, axis=0, keepdims=True)
                u_sel = sel(uu)
                v_sel = sel(vv)
                nsel = _nsel_dot(nrm, onehot)
                nx_sel = nsel[0:1, :]
                ny_sel = nsel[1:2, :]
                nz_sel = nsel[2:3, :]
                inst_sel = nsel[3:4, :]  # instance id rides the normal table

                odd = (arg % 2) == 1
                u_sel = jnp.where(odd, 1.0 - u_sel, u_sel)
                v_sel = jnp.where(odd, 1.0 - v_sel, v_sel)

                rsel = pl.ds(r, 1)
                bu_ref[rsel, :] = jnp.where(upd, u_sel, bu_ref[rsel, :])
                bv_ref[rsel, :] = jnp.where(upd, v_sel, bv_ref[rsel, :])
                bnx_ref[rsel, :] = jnp.where(upd, nx_sel, bnx_ref[rsel, :])
                bny_ref[rsel, :] = jnp.where(upd, ny_sel, bny_ref[rsel, :])
                bnz_ref[rsel, :] = jnp.where(upd, nz_sel, bnz_ref[rsel, :])
                bin_ref[rsel, :] = jnp.where(upd, inst_sel, bin_ref[rsel, :])
                btri_ref[rsel, :] = jnp.where(
                    upd, (s_id * SUPER + ci) * TRIS + arg, btri_ref[rsel, :]
                )
                bt_ref[rsel, :] = jnp.where(upd, min_t, bt_ref[rsel, :])

        @pl.when(smask_ref[s_id, 0] != 0)
        def _():
            # child cull for THIS supercluster only ([1, 64, 8] streamed
            # block), kept per-row so the sweep can skip dead rows
            cmask_ref[:, :] = cull(bbox_ref[0], per_row=True)

            def inner(ci, _):
                any_row = jnp.zeros((), jnp.int32)
                for rr in range(ROWS):
                    any_row = any_row | cmask_ref[ci, rr]

                @pl.when(any_row != 0)
                def _():
                    process_cluster(ci)
                return 0

            jax.lax.fori_loop(0, SUPER, inner, 0)

        # last supercluster step: emit the block's results
        @pl.when(s_id == S - 1)
        def _():
            best_tri = btri_ref[:]
            best_t = bt_ref[:]
            prim = jnp.where(best_tri >= 0, best_tri // 2, -1)
            prim = jnp.where(prim >= q, -1, prim)
            hit = prim >= 0
            t_out = jnp.where(hit, best_t, tmax)
            prim_ref[:, :] = prim
            u_ref[:, :] = bu_ref[:]
            v_ref[:, :] = bv_ref[:]
            t_ref[:, :] = t_out
            px_ref[:, :] = ox + t_out * dx
            py_ref[:, :] = oy + t_out * dy
            pz_ref[:, :] = oz + t_out * dz
            nx_ref[:, :] = bnx_ref[:]
            ny_ref[:, :] = bny_ref[:]
            nz_ref[:, :] = bnz_ref[:]
            in_ref[:, :] = (bin_ref[:] + 0.5).astype(jnp.int32)

    return kernel


def _load_tables(prim_verts_np, prim_instance, cache_key):
    from julia_raytracer_tpu.utils import diskcache

    q = len(prim_verts_np)
    cached = diskcache.load_arrays(cache_key, "clusters")
    if cached is not None and int(cached["q"]) == q:
        return cached["tfm"], cached["nrm"], cached["bbox"], int(cached["n_clusters"])
    tfm, nrm, bbox, n_clusters = build_cluster_tables(prim_verts_np, prim_instance)
    if q > 200_000:  # only heavy scenes are worth the disk space
        diskcache.save_arrays(
            cache_key, "clusters",
            dict(tfm=tfm, nrm=nrm, bbox=bbox, n_clusters=n_clusters, q=q),
        )
    return tfm, nrm, bbox, n_clusters


def make_cluster_intersect_hbm(prim_verts_np: np.ndarray, prim_instance=None,
                               interpret: bool = False, cache_key: str = ""):
    """Large-scene cluster intersector -> Hit. Tables live in HBM and are
    pipeline-streamed one supercluster per grid step."""
    q = len(prim_verts_np)
    tfm, nrm, bbox, n_clusters = _load_tables(prim_verts_np, prim_instance, cache_key)
    sbbox = build_super_bbox(bbox)
    n_super = len(sbbox)
    c_pad = n_super * SUPER
    if c_pad > n_clusters:
        padb = np.zeros((c_pad - n_clusters, 8), np.float32)
        padb[:, 0:3] = 3e38  # never-hit sentinel (see build_cluster_tables)
        padb[:, 3:6] = 3e38
        bbox = np.concatenate([bbox, padb], axis=0)
        padt = np.zeros((c_pad - n_clusters,) + tfm.shape[1:], np.float32)
        padt[:, 11, :] = 1.0  # never-hit transforms
        tfm = np.concatenate([tfm, padt], axis=0)
        nrm = np.concatenate(
            [nrm, np.zeros((c_pad - n_clusters,) + nrm.shape[1:], np.float32)], axis=0
        )
    tfm_d = jnp.asarray(tfm)
    nrm_d = jnp.asarray(nrm)
    bbox_d = jnp.asarray(bbox.reshape(n_super, SUPER, 8))
    sbbox_d = jnp.asarray(sbbox)
    kernel = _make_kernel_streamed(n_super, n_clusters, q)

    vec_spec = pl.BlockSpec((ROWS, LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(
            shape, lambda i, s, _s=shape: tuple(0 for _ in _s),
            memory_space=pltpu.VMEM,
        )

    @jax.jit
    def intersect(ro, rd, tmin, tmax):
        n = ro.shape[0]
        n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
        pad = n_pad - n

        def prep(x):
            return jnp.pad(x, ((0, pad),)).reshape(-1, LANES)

        args = [
            prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(tmin), prep(tmax),
        ]
        nblocks = args[0].shape[0] // ROWS
        shape_f = jax.ShapeDtypeStruct(args[0].shape, jnp.float32)
        shape_i = jax.ShapeDtypeStruct(args[0].shape, jnp.int32)
        outs = pl.pallas_call(
            kernel,
            grid=(nblocks, n_super),
            in_specs=[vec_spec] * 8 + [
                pl.BlockSpec(
                    (1, SUPER, 8), lambda i, s: (s, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                full(sbbox.shape),
                pl.BlockSpec(
                    (SUPER, 12, TRIS), lambda i, s: (s, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (SUPER, 4, TRIS), lambda i, s: (s, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[vec_spec] * 11,
            out_shape=[shape_i] + [shape_f] * 9 + [shape_i],
            scratch_shapes=[
                pltpu.VMEM((SUPER, ROWS), jnp.int32),
                pltpu.VMEM((n_super, 1), jnp.int32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.int32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(*args, bbox_d, sbbox_d, tfm_d, nrm_d)

        unpack = lambda x: x.reshape(-1)[:n]
        prim, u, v, t = (unpack(outs[0]), unpack(outs[1]), unpack(outs[2]), unpack(outs[3]))
        pos = jnp.stack([unpack(outs[4]), unpack(outs[5]), unpack(outs[6])], axis=-1)
        gn = jnp.stack([unpack(outs[7]), unpack(outs[8]), unpack(outs[9])], axis=-1)
        hit = prim >= 0
        return Hit(hit, prim, u, v, jnp.where(hit, t, tmax), pos, gn, unpack(outs[10]))

    return intersect




# ---------------------------------------------------------------------------
# Work-list streamed variant: per-block supercluster queues (heavy scenes)
# ---------------------------------------------------------------------------
#
# The plain streamed kernel's grid is (ray_blocks, ALL superclusters):
# every block pays one step per supercluster even though a coherent
# 1024-ray block intersects only a handful of kitchen's superclusters.
# Here an XLA pre-pass slab-tests each block's rays against the
# supercluster bboxes and builds a per-block work list (live ids
# FRONT-TO-BACK by nearest entry distance, tail padded by repeating the
# last id). The list rides in as a scalar-prefetch operand; BlockSpec
# index_maps read it, so
#   - padded steps map to the same table block as their predecessor and
#     the Mosaic pipeline SKIPS the DMA entirely,
#   - the kernel skips compute via `work[i,s] != work[i,s-1]`, and
#   - in-kernel cluster culls test against the running best-t, giving
#     ordered-traversal early termination.
# Occupancy then scales with the per-block visible set, not with scene
# size — the hierarchy level the round-1 streamed kernel lacked.
#
# Mosaic pays per-grid-step bookkeeping PER OPERAND (~measured 0.8 us/step
# at 19 operands = 75 ms of pure dead-step overhead for kitchen at 262k
# rays), so the 8 ray vectors are packed into ONE input, tfm+nrm into one
# table, and the 11 outputs into one f32 + one i32 array; WL_SUPER = 128
# clusters per supercluster halves the step count again.

WL_SUPER = 128  # clusters per supercluster in the worklist kernel
# ray blocks per pallas_call: bounds the scalar-prefetch work list
# (blocks * n_super * 4 bytes must stay comfortably inside SMEM)
WORKLIST_BLOCKS = 256
# flat-grid ceiling: steps * 4 prefetch arrays * 4 B of scoped SMEM.
# 32768 -> 512 KB, safely under the ~1 MB Mosaic scoped-SMEM limit
# (ecosys hybrid at 78848 steps hard-failed allocation)
_FLAT_STEPS_MAX = 32768


def _make_tri_dot():
    """Dot function for the unit-triangle transform contractions
    (contract dim 0, k=4). On the TPU MXU an f32 dot runs as bf16
    passes: HIGHEST ~ 6, DEFAULT 1. The o'/d' transforms feed t/u/v
    hit tests, where single-pass bf16 (8 mantissa bits) visibly breaks
    precision. Mosaic's Pallas lowering rejects Precision.HIGH (only
    DEFAULT/HIGHEST lower), so `split3` hand-rolls HIGH's 3-pass
    algorithm from supported bf16 DEFAULT dots: a·b ~ ah·bh + ah·bl +
    al·bh with f32 accumulation (~16 usable mantissa bits + exact
    accumulate). JRT_TRI_PREC selects for hardware A/B.

    Measured (kitchen 512px bounce rays, TPU v5e): highest 346 ms,
    split3 286 ms (1.21x), default 248 ms. split3 agrees with highest
    on 99.72% of bounce-ray prim ids (rest are edge ties) and the
    kitchen/bathroom1 goldens match the HIGHEST-mode MSEs within
    sampling noise (0.0430 vs 0.0424 / 0.0393 vs 0.0392), so split3 is
    the default; single-pass bf16 visibly breaks hit tests.

    On non-TPU backends (interpret-mode tests, CPU fallbacks) a dot is
    exact f32 at ANY precision, so the split decomposition only LOSES
    bits there — the default resolves to highest off-TPU."""
    on_tpu = jax.default_backend() == "tpu"
    mode = os.environ.get(
        "JRT_TRI_PREC", "split3" if on_tpu else "highest").lower()
    dims = (((0,), (0,)), ((), ()))
    if mode in ("highest", "default"):
        prec = (jax.lax.Precision.HIGHEST if mode == "highest"
                else jax.lax.Precision.DEFAULT)
        return lambda a, b: jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32, precision=prec)
    if mode == "split3":
        def dot3(a, b):
            d = lambda x, y: jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32)
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            return d(ah, bh) + (d(ah, bl) + d(al, bh))
        return dot3
    raise ValueError(
        f"JRT_TRI_PREC={mode!r}: expected highest|split3|default")


def _nsel_dot(nrm, onehot):
    """Select per-lane winner attributes from the [4,128] normal table
    via one [4,128]x[128,128] MXU dot (four M=1 dots use 1/128 of the
    MXU rows each). HIGHEST keeps the selection exact: onehot is 0/1 so
    every output is a single table value — required because instance
    ids ride the table as f32 (bf16 single-pass would corrupt ids
    above 256)."""
    return jax.lax.dot_general(
        nrm, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _wl_super_bbox(bbox: np.ndarray, sup: int) -> np.ndarray:
    c = len(bbox)
    s = -(-c // sup)
    pad = s * sup - c
    bb = np.concatenate([bbox, np.tile(bbox[-1:], (pad, 1))], axis=0) if pad else bbox
    bb = bb.reshape(s, sup, 8)
    out = np.zeros((s, 8), np.float32)
    out[:, 0:3] = bb[:, :, 0:3].min(axis=1)
    out[:, 3:6] = bb[:, :, 3:6].max(axis=1)
    return out


def _make_kernel_worklist(n_super: int, n_clusters: int, q: int, sup: int,
                          flat: bool = False):
    """flat=False: grid (blocks, S) — every block steps over ALL
    superclusters, dead steps detected by duplicate work-list ids.
    flat=True: grid (sum of per-block counts,) — one step per LIVE
    (block, supercluster) pair, blk/sc/flags ride in as scalar prefetch;
    the dead-step floor (~0.4 ms per 1k grid steps) disappears entirely."""
    S = n_super
    G8 = min(8, sup)  # cluster-scan skip granularity
    assert sup % G8 == 0
    _dot = _make_tri_dot()

    def impl(sc_id, is_first, live, is_last,
             rays_ref, bbox_ref, tab_ref, outf_ref, outi_ref,
             cmask_ref, cany_ref, gany_ref,
             bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
             bin_ref):
        R = ROWS
        ox, oy, oz = rays_ref[0:R], rays_ref[R:2*R], rays_ref[2*R:3*R]
        dx, dy, dz = rays_ref[3*R:4*R], rays_ref[4*R:5*R], rays_ref[5*R:6*R]
        tmin, tmax = rays_ref[6*R:7*R], rays_ref[7*R:8*R]

        inv = lambda d: 1.0 / jnp.where(d == 0.0, 1e-30, d)
        idx_, idy_, idz_ = inv(dx), inv(dy), inv(dz)

        def row_slab(r, bmin, bmax):
            """Slab test of row r's 128 lanes vs per-cluster boxes
            ([K, 1] mins/maxes) or one box (scalars): [K-or-1, LANES]."""
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
            best = jnp.minimum(tmax[r:r + 1, :], bt_ref[r:r + 1, :])
            exit_ = jnp.minimum(exit_, best)
            return enter <= exit_ * jnp.float32(1.00000024)

        def cull(bm):
            """bm [K, 8] -> per-(cluster, row) hit mask [K, ROWS] i32,
            culled against the CURRENT best hit: the work list visits
            superclusters front-to-back, so once near geometry is hit,
            farther clusters fail `enter <= min(exit, best_t)`.

            (A per-row supercluster-level pre-cull was tried and measured
            ~5% SLOWER on kitchen bounce rays: rows almost always reach
            the supercluster bbox, so the extra test is pure overhead.)"""
            bmin = (bm[:, 0:1], bm[:, 1:2], bm[:, 2:3])
            bmax = (bm[:, 3:4], bm[:, 4:5], bm[:, 5:6])
            cols = []
            for r in range(ROWS):
                row_hit = row_slab(r, bmin, bmax)  # [K, LANES]
                cols.append(jnp.any(row_hit, axis=1, keepdims=True).astype(jnp.int32))
            return jnp.concatenate(cols, axis=1)  # [K, ROWS]

        @pl.when(is_first)
        def _():
            bt_ref[:, :] = tmax
            btri_ref[:, :] = jnp.full((ROWS, LANES), -1, jnp.int32)
            bu_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bv_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bnx_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bny_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bnz_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bin_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)

        tri_ids = jax.lax.broadcasted_iota(jnp.int32, (TRIS, LANES), 0)

        def process_cluster(ci):
            T = tab_ref[0, ci, 0:12]  # [12, 128]
            nrm = tab_ref[0, ci, 12:16]  # [4, 128]
            A = [
                jnp.concatenate(
                    [T[3 * r_: 3 * r_ + 3, :], T[9 + r_: 10 + r_, :]], axis=0
                )
                for r_ in range(3)
            ]
            for r in range(ROWS):
              @pl.when(cmask_ref[ci, r] != 0)
              def _row(r=r):
                o_h = jnp.concatenate(
                    [ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :],
                     jnp.ones((1, LANES), jnp.float32)], axis=0,
                )
                d_h = jnp.concatenate(
                    [dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :],
                     jnp.zeros((1, LANES), jnp.float32)], axis=0,
                )
                dot = _dot
                opx, opy, opz = dot(A[0], o_h), dot(A[1], o_h), dot(A[2], o_h)
                dpx, dpy, dpz = dot(A[0], d_h), dot(A[1], d_h), dot(A[2], d_h)

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
                onehot = (tri_ids == arg).astype(jnp.float32)
                sel = lambda x: jnp.sum(x * onehot, axis=0, keepdims=True)
                u_sel = sel(uu)
                v_sel = sel(vv)
                nsel = _nsel_dot(nrm, onehot)
                nx_sel = nsel[0:1, :]
                ny_sel = nsel[1:2, :]
                nz_sel = nsel[2:3, :]
                inst_sel = nsel[3:4, :]  # instance id rides the normal table

                odd = (arg % 2) == 1
                u_sel = jnp.where(odd, 1.0 - u_sel, u_sel)
                v_sel = jnp.where(odd, 1.0 - v_sel, v_sel)

                rsel = pl.ds(r, 1)
                bu_ref[rsel, :] = jnp.where(upd, u_sel, bu_ref[rsel, :])
                bv_ref[rsel, :] = jnp.where(upd, v_sel, bv_ref[rsel, :])
                bnx_ref[rsel, :] = jnp.where(upd, nx_sel, bnx_ref[rsel, :])
                bny_ref[rsel, :] = jnp.where(upd, ny_sel, bny_ref[rsel, :])
                bnz_ref[rsel, :] = jnp.where(upd, nz_sel, bnz_ref[rsel, :])
                bin_ref[rsel, :] = jnp.where(upd, inst_sel, bin_ref[rsel, :])
                btri_ref[rsel, :] = jnp.where(
                    upd, (sc_id * sup + ci) * TRIS + arg, btri_ref[rsel, :]
                )
                bt_ref[rsel, :] = jnp.where(upd, min_t, bt_ref[rsel, :])

        @pl.when(live)
        def _():
            cm = cull(bbox_ref[0])
            cmask_ref[:, :] = cm
            # vectorized any-row reduction: the serial cluster scan then
            # reads ONE scalar per cluster instead of ROWS (scalar VMEM
            # reads at ~18 ns each dominated this loop: 8x fewer = ~35 ms
            # saved per 262k-ray dispatch on kitchen)
            ca = jnp.sum(cm, axis=1, keepdims=True)
            cany_ref[:, :] = ca
            # group-level skip: the serial scan pays per-iteration scalar
            # read + branch overhead even for culled clusters; summing
            # over groups of G8 (8, or sup when smaller) lets a
            # mostly-culled supercluster skip G8 clusters per check
            # (bounce rays with a tight best-t cull most clusters, so
            # the scan overhead dominates)
            gany_ref[:, :] = jnp.sum(ca.reshape(-1, G8, 1), axis=1)

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

        # last step of the block: emit its packed results
        @pl.when(is_last)
        def _():
            best_tri = btri_ref[:]
            best_t = bt_ref[:]
            prim = jnp.where(best_tri >= 0, best_tri // 2, -1)
            prim = jnp.where(prim >= q, -1, prim)
            hit = prim >= 0
            t_out = jnp.where(hit, best_t, tmax)
            outi_ref[0:R, :] = prim
            outi_ref[R:2*R, :] = (bin_ref[:] + 0.5).astype(jnp.int32)
            outf_ref[0:R, :] = bu_ref[:]
            outf_ref[R:2*R, :] = bv_ref[:]
            outf_ref[2*R:3*R, :] = t_out
            outf_ref[3*R:4*R, :] = ox + t_out * dx
            outf_ref[4*R:5*R, :] = oy + t_out * dy
            outf_ref[5*R:6*R, :] = oz + t_out * dz
            outf_ref[6*R:7*R, :] = bnx_ref[:]
            outf_ref[7*R:8*R, :] = bny_ref[:]
            outf_ref[8*R:9*R, :] = bnz_ref[:]

    if flat:
        def kernel(blk_ref, sc_ref, flg_ref, rays_ref, bbox_ref, tab_ref,
                   outf_ref, outi_ref, *scratch):
            del blk_ref  # consumed by the BlockSpec index maps only
            j = pl.program_id(0)
            f = flg_ref[j]
            impl(sc_ref[j],
                 (f & 1) != 0,   # first item of its ray block
                 (f & 4) != 0,   # valid (not tail padding)
                 (f & 2) != 0,   # last item of its ray block
                 rays_ref, bbox_ref, tab_ref, outf_ref, outi_ref, *scratch)
    else:
        def kernel(work_ref, rays_ref, bbox_ref, tab_ref, outf_ref, outi_ref,
                   *scratch):
            i_id = pl.program_id(0)
            s_id = pl.program_id(1)
            sc_id = work_ref[i_id, s_id]
            # live iff first step or a NEW id (each live id appears once
            # in the front-to-back list; only the padded tail repeats)
            prev = work_ref[i_id, jnp.maximum(s_id - 1, 0)]
            impl(sc_id, s_id == 0, (s_id == 0) | (sc_id != prev),
                 s_id == S - 1,
                 rays_ref, bbox_ref, tab_ref, outf_ref, outi_ref, *scratch)

    return kernel


def _flat_dispatch_plan(order, cnt, nb):
    """Shared derivation for the flattened 1-D grids (worklist AND
    instanced kernels): one grid step per live (block, item) pair.

    order: [nb, W] per-block front-to-back candidate ids (tail-padded);
    cnt: [nb] live counts. Returns (blk, idx, flg, caps, total):
    per-flattened-step block id, candidate id, flag bits
    (1 = first item of its block, 2 = last, 4 = valid / not padding),
    the power-of-two static-size ladder (>= 4096 steps, max 8 buckets),
    and the live total. Every block gets >= 1 step so it can emit;
    beyond `total`, blk saturates at nb-1 with valid False — a truncated
    tail is pure no-op padding, so any cap >= total is equivalent to the
    full grid."""
    W = order.shape[1]
    capf = nb * W
    cnt1 = jnp.maximum(cnt, 1)
    starts = jnp.cumsum(cnt1) - cnt1  # exclusive prefix
    total = starts[-1] + cnt1[-1]
    jf = jnp.arange(capf, dtype=jnp.int32)
    marks = jnp.zeros(capf, jnp.int32).at[starts].add(1)
    blk = jnp.cumsum(marks) - 1  # block id per flattened step
    rank = jf - starts[blk]
    valid = rank < cnt1[blk]
    idx = order[blk, jnp.minimum(rank, W - 1)]
    first = (rank == 0) & valid
    last = (rank == cnt1[blk] - 1) & valid
    flg = (
        first.astype(jnp.int32)
        | (last.astype(jnp.int32) << 1)
        | (valid.astype(jnp.int32) << 2)
    )
    caps = [capf]
    while caps[-1] > 4096 and len(caps) < 8:
        caps.append(-(-caps[-1] // 2))
    return blk, idx, flg, sorted(set(caps)), total


def make_cluster_intersect_worklist(prim_verts_np: np.ndarray, prim_instance=None,
                                    interpret: bool = False, cache_key: str = "",
                                    sup: int | None = None,
                                    flat_grid: bool | None = None):
    """Heavy-scene cluster intersector with per-block supercluster work
    lists (see section comment). Drop-in replacement for
    make_cluster_intersect_hbm.

    flat_grid=True runs the 1-D flattened grid (one step per live
    (block, supercluster) pair, bucketed static sizes) instead of the
    rectangular (blocks, S) grid; None reads env JRT_WL_FLAT. sup=None
    reads env JRT_WL_SUP (hardware sweeps: smaller superclusters =
    tighter precull boxes but more grid steps) and defaults to WL_SUPER;
    an explicit sup argument always wins."""
    if flat_grid is None:
        flat_grid = os.environ.get("JRT_WL_FLAT", "") == "1"
    if sup is None:
        sup = int(os.environ.get("JRT_WL_SUP") or WL_SUPER)
        if sup > 8 and sup % 8:
            raise ValueError(
                f"JRT_WL_SUP={sup}: must be <= 8 or a multiple of 8 "
                "(cluster-scan group granularity)"
            )
    q = len(prim_verts_np)
    tfm, nrm, bbox, n_clusters = _load_tables(prim_verts_np, prim_instance, cache_key)
    sbbox = _wl_super_bbox(bbox, sup)
    n_super = len(sbbox)
    c_pad = n_super * sup
    if c_pad > n_clusters:
        padb = np.zeros((c_pad - n_clusters, 8), np.float32)
        padb[:, 0:3] = 3e38  # never-hit sentinel (see build_cluster_tables)
        padb[:, 3:6] = 3e38
        bbox = np.concatenate([bbox, padb], axis=0)
        padt = np.zeros((c_pad - n_clusters,) + tfm.shape[1:], np.float32)
        padt[:, 11, :] = 1.0  # never-hit transforms
        tfm = np.concatenate([tfm, padt], axis=0)
        nrm = np.concatenate(
            [nrm, np.zeros((c_pad - n_clusters,) + nrm.shape[1:], np.float32)], axis=0
        )
    # one packed table: [S, sup, 16, TRIS] = tfm rows 0-11, normals 12-15
    tab = np.concatenate(
        [tfm.reshape(n_super, sup, 12, TRIS), nrm.reshape(n_super, sup, 4, TRIS)],
        axis=2,
    )
    # NB device tables are NOT closed over by the traced intersect body —
    # a closure-captured jax.Array lowers as an inline literal, embedding
    # the whole table (kitchen: ~185 MB) in the program. That bloats the
    # MLIR, can push the serialized executable past the 2 GiB protobuf
    # limit (observed at sup=32 on kitchen), and duplicates the table in
    # HBM per compiled kernel variant. Instead the default tables ride in
    # through the `tables` argument (threaded from dscene.isec_tables by
    # trace_wavefront), so XLA sees parameters, not constants.
    tab_d = jnp.asarray(tab)
    bbox_d = jnp.asarray(bbox.reshape(n_super, sup, 8))
    sbbox_d = jnp.asarray(sbbox)
    default_tables = (tab_d, bbox_d, sbbox_d)
    if flat_grid and WORKLIST_BLOCKS * n_super > _FLAT_STEPS_MAX:
        # the flat grid's scalar-prefetch arrays (blk/sc/flg, one i32
        # per flattened step) live in SMEM; past ~1 MB of scoped SMEM
        # the Mosaic allocator hard-fails (observed: ecosys hybrid,
        # 4 x 308 KB operands). The worst-case step count is static, so
        # fall back to the rect grid before tracing anything.
        print(f"worklist flat grid disabled: {WORKLIST_BLOCKS}x{n_super} "
              f"steps exceed the SMEM prefetch budget", flush=True)
        flat_grid = False
    kernel = _make_kernel_worklist(n_super, n_clusters, q, sup, flat=flat_grid)
    S = n_super

    _scratch_shapes = [
        pltpu.VMEM((sup, ROWS), jnp.int32),
        pltpu.VMEM((sup, 1), jnp.int32),
        pltpu.VMEM((sup // min(8, sup), 1), jnp.int32),
        pltpu.VMEM((ROWS, LANES), jnp.float32),
        pltpu.VMEM((ROWS, LANES), jnp.int32),
    ] + [pltpu.VMEM((ROWS, LANES), jnp.float32)] * 6

    def chunk_call_flat(rays_packed, sub_blocks, order, cnt, bbox_t, tab_t):
        """Flattened 1-D dispatch: one grid step per live (block,
        supercluster) pair. The step count is data-dependent, so it is
        bucketed to a power-of-two ladder of static grid sizes (down to
        4096 steps, max 8 buckets) under a lax.switch — the smallest
        bucket that holds sum(cnt) runs; tail-padding steps carry
        flags=0 and do nothing (their index maps repeat the final
        block/supercluster, so the pipeline skips their DMAs too)."""
        nb = sub_blocks
        blk, sc, flg, caps, total = _flat_dispatch_plan(order, cnt, nb)
        shape_f = jax.ShapeDtypeStruct((nb * 9 * ROWS, LANES), jnp.float32)
        shape_i = jax.ShapeDtypeStruct((nb * 2 * ROWS, LANES), jnp.int32)

        def branch(cap):
            def run(args):
                blk_, sc_, flg_, rays = args
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(cap,),
                    in_specs=[
                        pl.BlockSpec(
                            (8 * ROWS, LANES),
                            lambda j, b, s, f: (b[j], 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (1, sup, 8),
                            lambda j, b, s, f: (s[j], 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (1, sup, 16, TRIS),
                            lambda j, b, s, f: (s[j], 0, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=[
                        pl.BlockSpec(
                            (9 * ROWS, LANES),
                            lambda j, b, s, f: (b[j], 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (2 * ROWS, LANES),
                            lambda j, b, s, f: (b[j], 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    scratch_shapes=_scratch_shapes,
                )
                return pl.pallas_call(
                    kernel,
                    grid_spec=grid_spec,
                    out_shape=[shape_f, shape_i],
                    interpret=interpret,
                )(blk_[:cap], sc_[:cap], flg_[:cap], rays, bbox_t, tab_t)

            return run

        # beyond `total`, blk saturates at nb-1 and valid is False — a
        # truncated tail is pure no-op padding, so any cap >= total is
        # equivalent to the full grid
        idx = jnp.searchsorted(jnp.asarray(caps, jnp.int32), total)
        return jax.lax.switch(
            jnp.minimum(idx, len(caps) - 1),
            [branch(c) for c in caps],
            (blk, sc, flg, rays_packed),
        )

    def chunk_call(rays_packed, sub_blocks, work, bbox_t, tab_t):
        """One pallas_call over sub_blocks ray blocks.
        rays_packed: [sub_blocks*8*ROWS, LANES]; work: [sub_blocks, S]."""
        shape_f = jax.ShapeDtypeStruct((sub_blocks * 9 * ROWS, LANES), jnp.float32)
        shape_i = jax.ShapeDtypeStruct((sub_blocks * 2 * ROWS, LANES), jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(sub_blocks, S),
            in_specs=[
                pl.BlockSpec(
                    (8 * ROWS, LANES), lambda i, s, w: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, sup, 8), lambda i, s, w: (w[i, s], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, sup, 16, TRIS), lambda i, s, w: (w[i, s], 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (9 * ROWS, LANES), lambda i, s, w: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2 * ROWS, LANES), lambda i, s, w: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=_scratch_shapes,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[shape_f, shape_i],
            interpret=interpret,
        )(work, rays_packed, bbox_t, tab_t)

    def precull(ro_c, rd_c, tmin_c, tmax_c, nblocks, sbbox_t):
        """[rays] component arrays -> front-to-back candidate order
        [nblocks, S] + live count [nblocks]. The elementwise tree fuses;
        only the [rays, S] predicate materializes."""
        o = jnp.stack(ro_c, axis=-1).reshape(-1, 1, 3)
        d = jnp.stack(rd_c, axis=-1).reshape(-1, 1, 3)
        di = 1.0 / jnp.where(d == 0.0, 1e-30, d)
        t0 = (sbbox_t[None, :, 0:3] - o) * di
        t1 = (sbbox_t[None, :, 3:6] - o) * di
        enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
        exit_ = jnp.min(jnp.maximum(t0, t1), axis=-1)
        enter = jnp.maximum(enter, tmin_c.reshape(-1, 1))
        exit_ = jnp.minimum(exit_, tmax_c.reshape(-1, 1))
        ray_hit = enter <= exit_ * jnp.float32(1.00000024)  # [rays, S]
        blk_hit = ray_hit.reshape(nblocks, BLOCK_RAYS, S).any(axis=1)
        enter_m = jnp.where(ray_hit, jnp.maximum(enter, 0.0), jnp.float32(jnp.inf))
        blk_enter = enter_m.reshape(nblocks, BLOCK_RAYS, S).min(axis=1)
        sc_ids = jnp.arange(S, dtype=jnp.int32)[None, :]
        order = jnp.argsort(
            jnp.where(blk_hit, blk_enter, jnp.float32(jnp.inf)), axis=1
        ).astype(jnp.int32)
        cnt = blk_hit.sum(axis=1).astype(jnp.int32)
        if flat_grid:
            return order, cnt
        # rectangular-grid work list: tail positions >= cnt repeat the
        # last live id so the kernel's duplicate-id check skips them
        j = jnp.minimum(sc_ids, jnp.maximum(cnt - 1, 0)[:, None])
        return jnp.take_along_axis(order, j, axis=1), cnt  # [nblocks, S]

    def impl_chunk(ccomp, nb, tables):
        """One chunk of nb ray blocks -> (outf [nb,9,ROWS,LANES],
        outi [nb,2,ROWS,LANES]). ccomp: the 8 component arrays
        [nb*ROWS, LANES]. Exposed (intersect.impl_chunk) so the regroup
        intersector can lax.cond into this kernel as its overflow
        fallback without retracing the whole dispatch loop."""
        tab_t, bbox_t, sbbox_t = tables
        work, cnt = precull(
            ccomp[0:3], ccomp[3:6], ccomp[6], ccomp[7], nb, sbbox_t,
        )
        rays_chunk = (
            jnp.stack(ccomp, axis=0)
            .reshape(8, nb, ROWS, LANES)
            .transpose(1, 0, 2, 3)
            .reshape(nb * 8 * ROWS, LANES)
        )
        if flat_grid:
            of, oi = chunk_call_flat(rays_chunk, nb, work, cnt,
                                     bbox_t, tab_t)
        else:
            of, oi = chunk_call(rays_chunk, nb, work, bbox_t, tab_t)
        return of.reshape(nb, 9, ROWS, LANES), oi.reshape(nb, 2, ROWS, LANES)

    def _intersect_impl(ro, rd, tmin, tmax, tables):
        n = ro.shape[0]
        n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
        pad = n_pad - n
        nblocks = n_pad // BLOCK_RAYS

        def prep(x):
            return jnp.pad(x, ((0, pad),)).reshape(-1, LANES)

        comps = [
            prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(tmin), prep(tmax),
        ]
        parts_f, parts_i = [], []
        # scale the chunk inversely with S so the [chunk_rays, S]
        # precull temporaries stay ~180 MB regardless of scene size
        # (S ~= 1000 for the 8M-prim hybrid canopy soup would otherwise
        # materialize ~4 GB of transients per chunk)
        chunk_blocks = max(16, min(WORKLIST_BLOCKS, (256 * 192) // max(S, 1)))
        for blo in range(0, nblocks, chunk_blocks):
            bhi = min(blo + chunk_blocks, nblocks)
            nb = bhi - blo
            # per-chunk precull: the [chunk_rays, S] temporaries stay
            # ~180 MB instead of materializing the whole dispatch's
            # [1M, S] at once (a ~250 ms HBM-pressure cliff at 1M rays)
            rsel = slice(blo * ROWS, bhi * ROWS)
            of, oi = impl_chunk([c[rsel] for c in comps], nb, tables)
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

    intersect.tables = default_tables
    intersect.wants_tables = True
    intersect.impl_chunk = impl_chunk
    return intersect


# ---------------------------------------------------------------------------
# Two-level instanced variant: work items = (instance, shape-supercluster)
# ---------------------------------------------------------------------------
#
# The reference's scene BVH over instances transforms each ray into shape
# space at instance leaves and walks that shape's private BVH
# (src/bvh.jl:306-371, :493-520). The TPU equivalent keeps each shape's
# cluster tables ONCE (shape space, scene/instanced.py) and streams WORK
# ITEMS: each grid step processes one (instance, supercluster) pair for a
# 1024-ray block. Scalar-prefetch index maps pick the supercluster's
# table block by wi_sup[item] and the instance's transform row by
# wi_inst[item]; the kernel transforms the ray block into shape space in
# registers (t is world-consistent because directions are not
# renormalized) and merges against the running best-t.
#
# The per-block work list is K-capped: an XLA beam pre-pass (interval
# bounds of the block's origins/directions) selects and front-to-back
# orders the block's candidate items, and an outer while_loop issues
# rounds of K items until every block is done or provably cannot improve
# (best_t <= the next item's conservative t lower bound). Most blocks
# finish in round 1; the cap keeps the grid static and the dead-step
# overhead bounded at blocks*K instead of blocks*N_items.

WL_INST_K = 64  # work items per block per round
# blocks per instanced pallas_call: dispatches above ~64 blocks fault the
# v5e worker (ecosys at 384px+; 256px/36 blocks is fine) — keep chunks
# comfortably below the cliff
INST_CHUNK_BLOCKS = 32


def _make_kernel_instanced(k_items: int, sup: int, q: int,
                           flat: bool = False):
    """flat=False: grid (blocks, K) round dispatch driven by an outer
    while_loop (one K-item round per call). flat=True: grid (steps,) —
    one step per live (block, work-item) pair; blk/sc/xf-row/flags ride
    in as scalar prefetch and the whole intersect is ONE dispatch."""
    K = k_items
    _dot = _make_tri_dot()

    def impl(sc_id, inst_id, is_first, live, is_last,
             rays_ref, bbox_ref, tab_ref, xf_ref, outf_ref, outi_ref,
             cmask_ref, cany_ref, gany_ref,
             bt_ref, btri_ref, bu_ref, bv_ref, bnx_ref, bny_ref, bnz_ref,
             bin_ref):
        R = ROWS
        wox, woy, woz = rays_ref[0:R], rays_ref[R:2*R], rays_ref[2*R:3*R]
        wdx, wdy, wdz = rays_ref[3*R:4*R], rays_ref[4*R:5*R], rays_ref[5*R:6*R]
        tmin, tmax = rays_ref[6*R:7*R], rays_ref[7*R:8*R]

        @pl.when(is_first)
        def _():
            bt_ref[:, :] = tmax
            btri_ref[:, :] = jnp.full((ROWS, LANES), -1, jnp.int32)
            bu_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bv_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bnx_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bny_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bnz_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)
            bin_ref[:, :] = jnp.zeros((ROWS, LANES), jnp.float32)

        @pl.when(live)
        def _():
            # ray block world -> shape space (obj = world @ Ri + oi;
            # inst_rows layout scene/instanced.py)
            ri = [xf_ref[0, 0, j] for j in range(9)]
            oi = [xf_ref[0, 0, 9 + j] for j in range(3)]
            fw = [xf_ref[0, 0, 12 + j] for j in range(9)]
            ox = wox * ri[0] + woy * ri[3] + woz * ri[6] + oi[0]
            oy = wox * ri[1] + woy * ri[4] + woz * ri[7] + oi[1]
            oz = wox * ri[2] + woy * ri[5] + woz * ri[8] + oi[2]
            dx = wdx * ri[0] + wdy * ri[3] + wdz * ri[6]
            dy = wdx * ri[1] + wdy * ri[4] + wdz * ri[7]
            dz = wdx * ri[2] + wdy * ri[5] + wdz * ri[8]
            inv = lambda d: 1.0 / jnp.where(d == 0.0, 1e-30, d)
            idx_, idy_, idz_ = inv(dx), inv(dy), inv(dz)

            def cull(bm):
                bmin = (bm[:, 0:1], bm[:, 1:2], bm[:, 2:3])
                bmax = (bm[:, 3:4], bm[:, 4:5], bm[:, 5:6])
                cols = []
                for r in range(ROWS):
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
                    best = jnp.minimum(tmax[r:r + 1, :], bt_ref[r:r + 1, :])
                    exit_ = jnp.minimum(exit_, best)
                    row_hit = enter <= exit_ * jnp.float32(1.00000024)
                    cols.append(jnp.any(row_hit, axis=1, keepdims=True).astype(jnp.int32))
                return jnp.concatenate(cols, axis=1)  # [sup, ROWS]

            tri_ids = jax.lax.broadcasted_iota(jnp.int32, (TRIS, LANES), 0)

            def process_cluster(ci):
                T = tab_ref[0, ci, 0:12]
                nrm = tab_ref[0, ci, 12:16]
                A = [
                    jnp.concatenate(
                        [T[3 * r_: 3 * r_ + 3, :], T[9 + r_: 10 + r_, :]], axis=0
                    )
                    for r_ in range(3)
                ]
                for r in range(ROWS):
                  @pl.when(cmask_ref[ci, r] != 0)
                  def _row(r=r):
                    o_h = jnp.concatenate(
                        [ox[r:r + 1, :], oy[r:r + 1, :], oz[r:r + 1, :],
                         jnp.ones((1, LANES), jnp.float32)], axis=0,
                    )
                    d_h = jnp.concatenate(
                        [dx[r:r + 1, :], dy[r:r + 1, :], dz[r:r + 1, :],
                         jnp.zeros((1, LANES), jnp.float32)], axis=0,
                    )
                    dot = _dot
                    opx, opy, opz = dot(A[0], o_h), dot(A[1], o_h), dot(A[2], o_h)
                    dpx, dpy, dpz = dot(A[0], d_h), dot(A[1], d_h), dot(A[2], d_h)

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
                    onehot = (tri_ids == arg).astype(jnp.float32)
                    sel = lambda x: jnp.sum(x * onehot, axis=0, keepdims=True)
                    u_sel = sel(uu)
                    v_sel = sel(vv)
                    nsel = _nsel_dot(nrm, onehot)
                    nx_s = nsel[0:1, :]
                    ny_s = nsel[1:2, :]
                    nz_s = nsel[2:3, :]
                    # shape -> world normal (n_w = n_s @ R, rigid
                    # transform_normal semantics src/math.jl:124-125);
                    # normalized outside the kernel
                    nx_w = nx_s * fw[0] + ny_s * fw[3] + nz_s * fw[6]
                    ny_w = nx_s * fw[1] + ny_s * fw[4] + nz_s * fw[7]
                    nz_w = nx_s * fw[2] + ny_s * fw[5] + nz_s * fw[8]

                    odd = (arg % 2) == 1
                    u_sel = jnp.where(odd, 1.0 - u_sel, u_sel)
                    v_sel = jnp.where(odd, 1.0 - v_sel, v_sel)

                    rsel = pl.ds(r, 1)
                    bu_ref[rsel, :] = jnp.where(upd, u_sel, bu_ref[rsel, :])
                    bv_ref[rsel, :] = jnp.where(upd, v_sel, bv_ref[rsel, :])
                    bnx_ref[rsel, :] = jnp.where(upd, nx_w, bnx_ref[rsel, :])
                    bny_ref[rsel, :] = jnp.where(upd, ny_w, bny_ref[rsel, :])
                    bnz_ref[rsel, :] = jnp.where(upd, nz_w, bnz_ref[rsel, :])
                    bin_ref[rsel, :] = jnp.where(
                        upd, inst_id.astype(jnp.float32), bin_ref[rsel, :]
                    )
                    btri_ref[rsel, :] = jnp.where(
                        upd, (sc_id * sup + ci) * TRIS + arg, btri_ref[rsel, :]
                    )
                    bt_ref[rsel, :] = jnp.where(upd, min_t, bt_ref[rsel, :])

            cm = cull(bbox_ref[0])
            cmask_ref[:, :] = cm
            ca = jnp.sum(cm, axis=1, keepdims=True)
            cany_ref[:, :] = ca
            gany_ref[:, :] = jnp.sum(ca.reshape(-1, 8, 1), axis=1)

            def inner(ci, _):
                @pl.when(cany_ref[ci, 0] != 0)
                def _():
                    process_cluster(ci)
                return 0

            def group(g, _):
                @pl.when(gany_ref[g, 0] != 0)
                def _():
                    jax.lax.fori_loop(g * 8, g * 8 + 8, inner, 0)
                return 0

            jax.lax.fori_loop(0, sup // 8, group, 0)

        @pl.when(is_last)
        def _():
            best_tri = btri_ref[:]
            best_t = bt_ref[:]
            prim = jnp.where(best_tri >= 0, best_tri // 2, -1)
            prim = jnp.where(prim >= q, -1, prim)
            hit = prim >= 0
            t_out = jnp.where(hit, best_t, tmax)
            outi_ref[0:R, :] = prim
            outi_ref[R:2*R, :] = (bin_ref[:] + 0.5).astype(jnp.int32)
            outf_ref[0:R, :] = bu_ref[:]
            outf_ref[R:2*R, :] = bv_ref[:]
            outf_ref[2*R:3*R, :] = t_out
            outf_ref[3*R:4*R, :] = wox + t_out * wdx
            outf_ref[4*R:5*R, :] = woy + t_out * wdy
            outf_ref[5*R:6*R, :] = woz + t_out * wdz
            outf_ref[6*R:7*R, :] = bnx_ref[:]
            outf_ref[7*R:8*R, :] = bny_ref[:]
            outf_ref[8*R:9*R, :] = bnz_ref[:]

    if flat:
        def kernel(blk_ref, sc_ref, xr_ref, flg_ref,
                   rays_ref, bbox_ref, tab_ref, xf_ref, outf_ref, outi_ref,
                   *scratch):
            del blk_ref  # consumed by the BlockSpec index maps only
            j = pl.program_id(0)
            f = flg_ref[j]
            impl(sc_ref[j], xr_ref[j],
                 (f & 1) != 0,   # first item of its ray block
                 (f & 4) != 0,   # valid (not tail padding)
                 (f & 2) != 0,   # last item of its ray block
                 rays_ref, bbox_ref, tab_ref, xf_ref, outf_ref, outi_ref,
                 *scratch)
    else:
        def kernel(wq_ref, cnt_ref, wsup_ref, winst_ref,
                   rays_ref, bbox_ref, tab_ref, xf_ref, outf_ref, outi_ref,
                   *scratch):
            i_id = pl.program_id(0)
            k_id = pl.program_id(1)
            item = wq_ref[i_id, k_id]
            impl(wsup_ref[item], winst_ref[item],
                 k_id == 0, k_id < cnt_ref[i_id], k_id == K - 1,
                 rays_ref, bbox_ref, tab_ref, xf_ref, outf_ref, outi_ref,
                 *scratch)

    return kernel


def make_cluster_intersect_instanced(tables, interpret: bool = False,
                                     k_items: int = WL_INST_K,
                                     flat_grid: bool | None = None):
    """Two-level instanced intersector -> Hit (see section comment).

    `tables` is a scene/instanced.py InstancedTables.

    flat_grid=True replaces the K-item-round while_loop with ONE 1-D
    dispatch: a grid step per live (block, work-item) pair (bucketed to
    a power-of-two ladder of static sizes). The per-chunk cost becomes
    sum(cnt) instead of max-over-blocks(rounds) * blocks * K, and the
    per-round XLA merge traffic disappears; None reads env
    JRT_INST_FLAT."""
    if flat_grid is None:
        flat_grid = os.environ.get("JRT_INST_FLAT", "") == "1"
    sup = tables.sup
    q = tables.n_prims
    n_items = max(len(tables.wi_sup), 1)
    K = min(k_items, max(8, n_items))

    # As with the worklist kernel, device tables must be ARGUMENTS of the
    # traced body, never closure constants — closure-captured jax.Arrays
    # lower as inline literals and bloat the program (ecosys shape tables
    # are ~100 MB). Defaults ride in via `tables=`; trace_wavefront
    # threads dscene.isec_tables through instead.
    tab_d = jnp.asarray(tables.tab)
    bbox_d = jnp.asarray(tables.bbox)
    xf_d = jnp.asarray(tables.inst_rows).reshape(-1, 1, 24)
    wsup_d = jnp.asarray(
        tables.wi_sup if len(tables.wi_sup) else np.zeros(1, np.int32)
    )
    winst_d = jnp.asarray(
        tables.wi_inst if len(tables.wi_inst) else np.zeros(1, np.int32)
    )
    wib = tables.wi_bbox if len(tables.wi_bbox) else np.zeros((1, 6), np.float32)
    wib_d = jnp.asarray(wib)
    default_tables = (tab_d, bbox_d, xf_d, wsup_d, winst_d, wib_d)
    max_rounds = -(-n_items // K)
    n_pad_items = max_rounds * K

    if flat_grid and INST_CHUNK_BLOCKS * n_pad_items > _FLAT_STEPS_MAX:
        # see the identical guard in make_cluster_intersect_worklist:
        # flat-grid prefetch is SMEM-resident and the worst case is
        # static (observed hard allocator failure on ecosys: 78848-step
        # ladder = 4 x 308 KB scoped SMEM)
        print(f"instanced flat grid disabled: {INST_CHUNK_BLOCKS}x"
              f"{n_pad_items} steps exceed the SMEM prefetch budget",
              flush=True)
        flat_grid = False
    kernel = _make_kernel_instanced(K, sup, q, flat=flat_grid)
    _scratch = [
        pltpu.VMEM((sup, ROWS), jnp.int32),
        pltpu.VMEM((sup, 1), jnp.int32),
        pltpu.VMEM((max(sup // 8, 1), 1), jnp.int32),
        pltpu.VMEM((ROWS, LANES), jnp.float32),
        pltpu.VMEM((ROWS, LANES), jnp.int32),
    ] + [pltpu.VMEM((ROWS, LANES), jnp.float32)] * 6

    def chunk_call_flat(rays_packed, sub_blocks, order, cnt,
                        bbox_t, tab_t, xf_t, wsup_t, winst_t):
        """One grid step per live (block, work-item) pair. Data-dependent
        total -> power-of-two ladder of static grid sizes under a
        lax.switch (tail steps carry flags=0 and repeat the previous
        index maps, so their DMAs are skipped)."""
        nb = sub_blocks
        blk, item, flg, caps, total = _flat_dispatch_plan(order, cnt, nb)
        sc = wsup_t[item]
        xr = winst_t[item]
        shape_f = jax.ShapeDtypeStruct((nb * 9 * ROWS, LANES), jnp.float32)
        shape_i = jax.ShapeDtypeStruct((nb * 2 * ROWS, LANES), jnp.int32)

        def branch(cap):
            def run(args):
                blk_, sc_, xr_, flg_, rays = args
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=4,
                    grid=(cap,),
                    in_specs=[
                        pl.BlockSpec(
                            (8 * ROWS, LANES),
                            lambda j, b, s, x, f: (b[j], 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (1, sup, 8),
                            lambda j, b, s, x, f: (s[j], 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (1, sup, 16, TRIS),
                            lambda j, b, s, x, f: (s[j], 0, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (1, 1, 24),
                            lambda j, b, s, x, f: (x[j], 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=[
                        pl.BlockSpec(
                            (9 * ROWS, LANES),
                            lambda j, b, s, x, f: (b[j], 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (2 * ROWS, LANES),
                            lambda j, b, s, x, f: (b[j], 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    scratch_shapes=_scratch,
                )
                return pl.pallas_call(
                    kernel,
                    grid_spec=grid_spec,
                    out_shape=[shape_f, shape_i],
                    interpret=interpret,
                )(blk_[:cap], sc_[:cap], xr_[:cap], flg_[:cap],
                  rays, bbox_t, tab_t, xf_t)

            return run

        # beyond `total`, blk saturates at nb-1 and valid is False — a
        # truncated tail is pure no-op padding, so any cap >= total is
        # equivalent to the full grid
        idx = jnp.searchsorted(jnp.asarray(caps, jnp.int32), total)
        return jax.lax.switch(
            jnp.minimum(idx, len(caps) - 1),
            [branch(c) for c in caps],
            (blk, sc, xr, flg, rays_packed),
        )

    def chunk_call(rays_packed, sub_blocks, wq, cnt,
                   bbox_t, tab_t, xf_t, wsup_t, winst_t):
        shape_f = jax.ShapeDtypeStruct((sub_blocks * 9 * ROWS, LANES), jnp.float32)
        shape_i = jax.ShapeDtypeStruct((sub_blocks * 2 * ROWS, LANES), jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(sub_blocks, K),
            in_specs=[
                pl.BlockSpec(
                    (8 * ROWS, LANES), lambda i, k, wq, c, ws, wi: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, sup, 8), lambda i, k, wq, c, ws, wi: (ws[wq[i, k]], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, sup, 16, TRIS),
                    lambda i, k, wq, c, ws, wi: (ws[wq[i, k]], 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                # [I, 1, 24] with block (1, 1, 24): the trailing two block
                # dims equal the array dims, satisfying TPU (8, 128) tiling
                pl.BlockSpec(
                    (1, 1, 24), lambda i, k, wq, c, ws, wi: (wi[wq[i, k]], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (9 * ROWS, LANES), lambda i, k, wq, c, ws, wi: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2 * ROWS, LANES), lambda i, k, wq, c, ws, wi: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=_scratch,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[shape_f, shape_i],
            interpret=interpret,
        )(wq, cnt, wsup_t, winst_t, rays_packed, bbox_t, tab_t, xf_t)

    def beam_precull(comps, nblocks, wib_t):
        """Per-block candidate items by EXACT per-ray slab tests (same
        idea as the worklist kernel's precull, per work-item bbox):
        an interval-beam overlap test was tried first and passed 84% of
        all 16,485 ecosys items for scanline primary blocks (the beam's
        scene-diagonal reach makes it vacuous), giving 165 average
        K=64 rounds; the exact cull is ~20 flops x rays x items of
        fully-fused VPU work and yields both a tight candidate set and
        a true front-to-back t_low = min over member rays' slab entry."""
        item_lo = wib_t[:, 0:3]  # [Ni, 3]
        item_hi = wib_t[:, 3:6]

        def per_block(args):
            o, d, tn, tx = args  # [BLOCK_RAYS,3]x2, [BLOCK_RAYS]x2
            di = 1.0 / jnp.where(d == 0.0, 1e-30, d)
            t0 = (item_lo[None] - o[:, None]) * di[:, None]  # [B, Ni, 3]
            t1 = (item_hi[None] - o[:, None]) * di[:, None]
            enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
            exit_ = jnp.min(jnp.maximum(t0, t1), axis=-1)
            enter = jnp.maximum(enter, tn[:, None])
            exit_ = jnp.minimum(exit_, tx[:, None])
            ray_hit = enter <= exit_ * jnp.float32(1.00000024)  # [B, Ni]
            enter_m = jnp.where(
                ray_hit, jnp.maximum(enter, 0.0), jnp.float32(jnp.inf)
            )
            return jnp.min(enter_m, axis=0)  # [Ni]; inf = no ray reaches

        o_b = jnp.stack(comps[0:3], axis=-1).reshape(nblocks, BLOCK_RAYS, 3)
        d_b = jnp.stack(comps[3:6], axis=-1).reshape(nblocks, BLOCK_RAYS, 3)
        tn_b = comps[6].reshape(nblocks, BLOCK_RAYS)
        tx_b = comps[7].reshape(nblocks, BLOCK_RAYS)
        key = jax.lax.map(per_block, (o_b, d_b, tn_b, tx_b))  # [nb, Ni]
        order = jnp.argsort(key, axis=1).astype(jnp.int32)
        cnt = jnp.sum(jnp.isfinite(key), axis=1).astype(jnp.int32)
        tlow_sorted = jnp.take_along_axis(key, order, axis=1)
        if n_pad_items > order.shape[1]:
            padw = n_pad_items - order.shape[1]
            order = jnp.pad(order, ((0, 0), (0, padw)), mode="edge")
            tlow_sorted = jnp.pad(
                tlow_sorted, ((0, 0), (0, padw)), constant_values=jnp.inf
            )
        return order, tlow_sorted, cnt

    def _intersect_impl(ro, rd, tmin, tmax, tables):
        tab_t, bbox_t, xf_t, wsup_t, winst_t, wib_t = tables
        n = ro.shape[0]
        n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
        pad = n_pad - n
        nblocks = n_pad // BLOCK_RAYS

        def prep(x):
            return jnp.pad(x, ((0, pad),)).reshape(-1, LANES)

        comps = [
            prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(tmin), prep(tmax),
        ]
        parts_f, parts_i = [], []
        for blo_i in range(0, nblocks, INST_CHUNK_BLOCKS):
            bhi_i = min(blo_i + INST_CHUNK_BLOCKS, nblocks)
            nb = bhi_i - blo_i
            rsel = slice(blo_i * ROWS, bhi_i * ROWS)
            ccomp = [c[rsel] for c in comps]
            order, tlow_sorted, cnt = beam_precull(ccomp, nb, wib_t)

            if flat_grid:
                of, oi = chunk_call_flat(
                    jnp.stack(ccomp, axis=0)
                    .reshape(8, nb, ROWS, LANES)
                    .transpose(1, 0, 2, 3)
                    .reshape(nb * 8 * ROWS, LANES),
                    nb, order, cnt,
                    bbox_t, tab_t, xf_t, wsup_t, winst_t,
                )
                parts_f.append(of.reshape(nb, 9, ROWS, LANES))
                parts_i.append(oi.reshape(nb, 2, ROWS, LANES))
                continue

            packed0 = (
                jnp.stack(ccomp, axis=0)
                .reshape(8, nb, ROWS, LANES)
                .transpose(1, 0, 2, 3)
            )  # [nb, 8, ROWS, LANES]
            tmax0 = packed0[:, 7]
            init_f = jnp.zeros((nb, 9, ROWS, LANES), jnp.float32)
            init_f = init_f.at[:, 2].set(tmax0)
            init_i = jnp.concatenate(
                [
                    jnp.full((nb, 1, ROWS, LANES), -1, jnp.int32),
                    jnp.zeros((nb, 1, ROWS, LANES), jnp.int32),
                ],
                axis=1,
            )

            def cond(carry):
                r, _, _, active = carry
                return (r < max_rounds) & jnp.any(active)

            def body(carry):
                r, accf, acci, active = carry
                wq = jax.lax.dynamic_slice(order, (0, r * K), (nb, K))
                cntr = jnp.clip(cnt - r * K, 0, K) * active.astype(jnp.int32)
                # feed the running best t as tmax: in-kernel culls reject
                # anything not strictly closer
                best_t = accf[:, 2]
                rays = packed0.at[:, 7].set(jnp.minimum(tmax0, best_t))
                of, oi = chunk_call(
                    rays.reshape(nb * 8 * ROWS, LANES), nb, wq, cntr,
                    bbox_t, tab_t, xf_t, wsup_t, winst_t,
                )
                of = of.reshape(nb, 9, ROWS, LANES)
                oi = oi.reshape(nb, 2, ROWS, LANES)
                new_hit = oi[:, 0:1] >= 0
                accf = jnp.where(new_hit, of, accf)
                acci = jnp.where(new_hit, oi, acci)
                nxt = jnp.minimum((r + 1) * K, n_pad_items - 1)
                next_tlow = jax.lax.dynamic_slice(
                    tlow_sorted, (0, nxt), (nb, 1)
                )  # [nb, 1]
                remaining = cnt > (r + 1) * K
                improvable = jnp.any(
                    accf[:, 2].reshape(nb, -1) > next_tlow, axis=1
                )
                return (r + 1, accf, acci, active & remaining & improvable)

            active0 = cnt > 0
            _, outf, outi, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), init_f, init_i, active0)
            )
            parts_f.append(outf)
            parts_i.append(outi)
        outf = parts_f[0] if len(parts_f) == 1 else jnp.concatenate(parts_f, axis=0)
        outi = parts_i[0] if len(parts_i) == 1 else jnp.concatenate(parts_i, axis=0)

        comp_f = lambda k: outf[:, k].reshape(-1)[:n]
        comp_i = lambda k: outi[:, k].reshape(-1)[:n]
        prim = comp_i(0)
        u, v, t = comp_f(0), comp_f(1), comp_f(2)
        pos = jnp.stack([comp_f(3), comp_f(4), comp_f(5)], axis=-1)
        gn = jnp.stack([comp_f(6), comp_f(7), comp_f(8)], axis=-1)
        gl = jnp.sqrt(jnp.sum(gn * gn, axis=-1, keepdims=True))
        gn = gn / jnp.where(gl > 0, gl, 1.0)
        hit = prim >= 0
        return Hit(hit, prim, u, v, jnp.where(hit, t, tmax), pos, gn, comp_i(1))

    jitted = jax.jit(_intersect_impl)

    def intersect(ro, rd, tmin, tmax, tables=None):
        return jitted(ro, rd, tmin, tmax,
                      default_tables if tables is None else tables)

    intersect.tables = default_tables
    intersect.wants_tables = True
    return intersect
