"""Pallas TPU kernel: dense ray-vs-all-prims intersection.

Why: the jnp brute-force path (ops/traversal.py) broadcasts rays against
primitives, so XLA materializes ~20 [N, Q] f32 intermediates in HBM —
at 262k rays x 36 prims that is >100 MB per op and the whole intersect
becomes HBM-bandwidth-bound (~32 ms measured on v5e). This kernel keeps
the primitive soup resident in VMEM, streams ray blocks through the VPU,
and carries the running closest-hit in registers, so HBM traffic is one
read of the rays + one write of the hit record (speed of light).

Semantics identical to intersect_quad over every prim with
closest-hit/lowest-index tie-breaking (src/geometry.jl:206-258 via
ops/geometry.py); validated against the jnp path in tests.

Layout: rays are reshaped to [R, 128] lanes (padded); primitives are a
[Q, 12] f32 table (p1 p2 p3 p4 xyz) read as broadcast scalars, with the
prim loop unrolled at trace time (Q is a compile-time constant <= the
brute-force threshold).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from julia_raytracer_tpu.ops.traversal import Hit

F32_MAX = jnp.float32(3.4028235e38)

LANES = 128
ROWS = 64  # rows per block: 64*128 = 8192 rays/block


def _moller(rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
            p1, p2, p3):
    """Scalar-prim Moller-Trumbore on [rows, lanes] ray vectors.
    p1/p2/p3 are python 3-tuples of scalars. Returns (hit, u, v, t)."""
    e1x, e1y, e1z = p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2]
    e2x, e2y, e2z = p3[0] - p1[0], p3[1] - p1[1], p3[2] - p1[2]
    # pvec = rd x e2
    pvx = rdy * e2z - rdz * e2y
    pvy = rdz * e2x - rdx * e2z
    pvz = rdx * e2y - rdy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tvx, tvy, tvz = rox - p1[0], roy - p1[1], roz - p1[2]
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (
        (det != 0.0)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= tmin) & (t <= tmax)
    )
    return hit, u, v, t


def _quad_normal_const(r):
    """Per-prim constant element normal (quad_normal, src/geometry.jl:267)."""
    p = np.asarray(r, np.float64).reshape(4, 3)

    def tn(a, b, c):
        n = np.cross(b - a, c - a)
        l = np.linalg.norm(n)
        return n / l if l > 0 else n

    n = tn(p[0], p[1], p[3]) + tn(p[2], p[3], p[1])
    l = np.linalg.norm(n)
    return tuple((n / l if l > 0 else n).astype(np.float32))


def _make_kernel(prims: np.ndarray, inst_ids):
    """Bake the prim table into the kernel as unrolled constants."""
    q = len(prims)
    rows = [tuple(float(x) for x in prims[i]) for i in range(q)]
    normals = [_quad_normal_const(prims[i]) for i in range(q)]
    insts = [int(inst_ids[i]) for i in range(q)] if inst_ids is not None else [0] * q

    def kernel(rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               tmin_ref, tmax_ref,
               prim_ref, u_ref, v_ref, t_ref,
               px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref, in_ref):
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
        tmin, tmax = tmin_ref[:], tmax_ref[:]

        best_t = tmax
        best_prim = jnp.full(rox.shape, -1, jnp.int32)
        best_u = jnp.zeros_like(rox)
        best_v = jnp.zeros_like(rox)

        for i in range(q):
            r = rows[i]
            p1 = (r[0], r[1], r[2])
            p2 = (r[3], r[4], r[5])
            p3 = (r[6], r[7], r[8])
            p4 = (r[9], r[10], r[11])
            # quad = (p1,p2,p4) + (p3,p4,p2), second uv flipped
            h1, u1, v1, t1 = _moller(
                rox, roy, roz, rdx, rdy, rdz, tmin, best_t, p1, p2, p4
            )
            upd = h1 & (t1 < best_t)
            best_t = jnp.where(upd, t1, best_t)
            best_u = jnp.where(upd, u1, best_u)
            best_v = jnp.where(upd, v1, best_v)
            best_prim = jnp.where(upd, i, best_prim)
            degenerate = (p3 == p4)
            if not degenerate:
                h2, u2, v2, t2 = _moller(
                    rox, roy, roz, rdx, rdy, rdz, tmin, best_t, p3, p4, p2
                )
                upd = h2 & (t2 < best_t)
                best_t = jnp.where(upd, t2, best_t)
                best_u = jnp.where(upd, 1.0 - u2, best_u)
                best_v = jnp.where(upd, 1.0 - v2, best_v)
                best_prim = jnp.where(upd, i, best_prim)

        # reconstruction pass: position (interpolate_quad semantics,
        # src/geometry.jl:278-283) + constant element normal, selected by
        # winning prim — replaces the [N,4,3] vertex gather at shade time
        lower = best_u + best_v <= 1.0
        iu = jnp.where(lower, best_u, 1.0 - best_u)
        iv = jnp.where(lower, best_v, 1.0 - best_v)
        iw = 1.0 - iu - iv
        px = jnp.zeros_like(rox)
        py = jnp.zeros_like(rox)
        pz = jnp.zeros_like(rox)
        nx = jnp.zeros_like(rox)
        ny = jnp.zeros_like(rox)
        nz = jnp.zeros_like(rox)
        inst = jnp.zeros(rox.shape, jnp.int32)
        for i in range(q):
            m = best_prim == i
            r = rows[i]
            nrm = normals[i]
            # lower tri (p1,p2,p4); upper tri (p3,p4,p2) with flipped uv
            ax = jnp.where(lower, r[0], r[6])
            ay = jnp.where(lower, r[1], r[7])
            az = jnp.where(lower, r[2], r[8])
            bx = jnp.where(lower, r[3], r[9])
            by = jnp.where(lower, r[4], r[10])
            bz = jnp.where(lower, r[5], r[11])
            cx = jnp.where(lower, r[9], r[3])
            cy = jnp.where(lower, r[10], r[4])
            cz = jnp.where(lower, r[11], r[5])
            px = jnp.where(m, ax * iw + bx * iu + cx * iv, px)
            py = jnp.where(m, ay * iw + by * iu + cy * iv, py)
            pz = jnp.where(m, az * iw + bz * iu + cz * iv, pz)
            nx = jnp.where(m, nrm[0], nx)
            ny = jnp.where(m, nrm[1], ny)
            nz = jnp.where(m, nrm[2], nz)
            inst = jnp.where(m, insts[i], inst)

        prim_ref[:] = best_prim
        u_ref[:] = best_u
        v_ref[:] = best_v
        t_ref[:] = best_t
        px_ref[:] = px
        py_ref[:] = py
        pz_ref[:] = pz
        nx_ref[:] = nx
        ny_ref[:] = ny
        nz_ref[:] = nz
        in_ref[:] = inst

    return kernel


def make_bruteforce_pallas(prim_verts_np: np.ndarray, prim_instance=None,
                           interpret: bool = False):
    """Build intersect(ro, rd, tmin, tmax) -> Hit backed by the Pallas
    kernel. Prim table (and instance ids) are baked in (static per scene)."""
    q = len(prim_verts_np)
    prims = np.asarray(prim_verts_np, np.float32).reshape(q, 12)
    kernel = _make_kernel(prims, prim_instance)
    block = ROWS * LANES

    @jax.jit
    def intersect(ro, rd, tmin, tmax):
        n = ro.shape[0]
        n_pad = -(-n // block) * block
        pad = n_pad - n

        def prep(x):
            return jnp.pad(x, ((0, pad),)).reshape(-1, LANES)

        rox, roy, roz = prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2])
        rdx, rdy, rdz = prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2])
        tmin_p = prep(tmin)
        # padded lanes get tmax = 0 -> no hit work
        tmax_p = prep(tmax)

        rblocks = rox.shape[0] // ROWS
        spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def call_on(args, nb):
            shp = (nb * ROWS, LANES)
            out_shape = [jax.ShapeDtypeStruct(shp, jnp.int32)] + [
                jax.ShapeDtypeStruct(shp, jnp.float32) for _ in range(9)
            ] + [jax.ShapeDtypeStruct(shp, jnp.int32)]
            return pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[spec] * 8,
                out_specs=[spec] * 11,
                out_shape=out_shape,
                interpret=interpret,
            )(*args)

        ins = (rox, roy, roz, rdx, rdy, rdz, tmin_p, tmax_p)
        outs = call_on(ins, rblocks)
        prim, u, v, t, px, py, pz, nx, ny, nz, inst = outs

        def unpack(x):
            return x.reshape(-1)[:n]

        prim, u, v, t = unpack(prim), unpack(u), unpack(v), unpack(t)
        pos = jnp.stack([unpack(px), unpack(py), unpack(pz)], axis=-1)
        gn = jnp.stack([unpack(nx), unpack(ny), unpack(nz)], axis=-1)
        hit = prim >= 0
        return Hit(hit, prim, u, v, jnp.where(hit, t, tmax), pos, gn, unpack(inst))

    return intersect
