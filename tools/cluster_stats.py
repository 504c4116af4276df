"""Clustering-quality experiment: how many 128-tri clusters does a
bounce ray actually visit under the current prim order, and would a
different clustering visit fewer?

The worklist kernel's per-ray cost is ~linear in visited cluster-rows,
so clusters/ray is THE traversal-quality metric (the reference's
answer is its per-shape BVH, src/bvh.jl:373-491; ours is cluster
granularity + front-to-back supercluster worklists).

Stage 1 (any backend, TPU preferred): render primary hits for the
scene, scatter deterministic bounce rays, record (o, d, t_hit).
Stage 2 (numpy): for each candidate prim order, rebuild 64-prim
cluster bboxes and count clusters whose slab test passes with
enter <= min(exit, t_hit) — i.e. clusters the kernel would process.

Usage: python tools/cluster_stats.py [scene.json] [res] [n_rays]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRIMS_PER_CLUSTER = 64
SUPER = 128  # clusters per supercluster (WL_SUPER)


def median_split_order(cent: np.ndarray, leaf: int) -> np.ndarray:
    """Geometric median-split order: recursively split each range at the
    median of the longest centroid axis (true spatial partition, unlike
    the positional-median-in-Morton-order the BVH build uses). Leaves
    come out in DFS order, so consecutive `leaf`-sized runs are tight."""
    q = len(cent)
    order = np.arange(q)
    out = []
    stack = [order]
    while stack:
        ids = stack.pop()
        if len(ids) <= leaf:
            out.append(ids)
            continue
        c = cent[ids]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        mid = len(ids) // 2
        part = np.argpartition(c[:, ax], mid)
        stack.append(ids[part[mid:]])
        stack.append(ids[part[:mid]])
    return np.concatenate(out)


def cluster_bboxes(pv: np.ndarray, order: np.ndarray) -> np.ndarray:
    """[C, 6] min/max over 64-prim clusters of pv[order]."""
    q = len(order)
    c = -(-q // PRIMS_PER_CLUSTER)
    pad = c * PRIMS_PER_CLUSTER - q
    o = np.concatenate([order, np.repeat(order[-1:], pad)]) if pad else order
    v = pv[o].reshape(c, -1, 3)
    return np.concatenate([v.min(axis=1), v.max(axis=1)], axis=1)


def visits(bb: np.ndarray, o: np.ndarray, d: np.ndarray,
           tcap: np.ndarray, chunk: int = 512):
    """[R] visited-cluster count + [R] visited-supercluster count."""
    inv = 1.0 / np.where(d == 0.0, 1e-30, d)
    nvis = np.zeros(len(o), np.int64)
    nsup = np.zeros(len(o), np.int64)
    c = len(bb)
    s = -(-c // SUPER)
    sup_pad = s * SUPER - c
    bbp = np.concatenate([bb, np.tile(bb[-1:], (sup_pad, 1))]) if sup_pad else bb
    for lo in range(0, len(o), chunk):
        sl = slice(lo, lo + chunk)
        t0 = (bb[None, :, 0:3] - o[sl, None, :]) * inv[sl, None, :]
        t1 = (bb[None, :, 3:6] - o[sl, None, :]) * inv[sl, None, :]
        enter = np.minimum(t0, t1).max(axis=2)
        exit_ = np.maximum(t0, t1).min(axis=2)
        hit = enter <= np.minimum(exit_, tcap[sl, None]) * 1.00000024
        nvis[sl] = hit.sum(axis=1)
        # supercluster visit = any cluster of the group passes
        hp = np.zeros((hit.shape[0], s * SUPER), bool)
        hp[:, :c] = hit
        nsup[sl] = hp.reshape(hit.shape[0], s, SUPER).any(axis=2).sum(axis=1)
    return nvis, nsup


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/scenes/kitchen/kitchen.json"
    )
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_rays = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

    import jax
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.camera import sample_camera
    from julia_raytracer_tpu.render.renderer import Params, Renderer, make_trace_state
    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.utils import rng as rng_mod

    scene = load_scene(scene_path)
    params = Params(resolution=res, samples=1, bounces=8, sampler="path")
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    n = state.n_pixels
    pix = jnp.arange(n, dtype=jnp.int32)
    rng = rng_mod.seed_state(pix, jnp.int32(0), 0)
    puv, rng = rng_mod.rand2f(rng)
    luv, rng = rng_mod.rand2f(rng)
    ij = jnp.stack([pix % state.width, pix // state.width], axis=-1)
    ro, rd = sample_camera(
        r.cam_arrays, ij, (state.width, state.height), puv, luv, False)
    tmin = jnp.full(n, 1e-4)
    tmax = jnp.full(n, 3.4e38)
    if getattr(r.intersect, "wants_tables", False):
        import functools
        isec = jax.jit(lambda a, b, tb: r.intersect(a, b, tmin, tmax, tables=tb))
        isec = functools.partial(isec, tb=r.intersect.tables)
    else:
        isec = jax.jit(lambda a, b: r.intersect(a, b, tmin, tmax))
    h0 = jax.block_until_ready(isec(ro, rd))
    hitm = np.asarray(h0.hit)
    pos = np.asarray(h0.position)
    gn = np.asarray(h0.gnormal)
    g = np.random.default_rng(0)
    d2 = g.normal(size=pos.shape).astype(np.float32)
    d2 /= np.maximum(np.linalg.norm(d2, axis=1, keepdims=True), 1e-9)
    flip = (d2 * gn).sum(1) < 0
    d2[flip] = -d2[flip]
    o2 = np.where(hitm[:, None], pos + gn * 1e-3, np.asarray(ro))
    d2 = np.where(hitm[:, None], d2, np.asarray(rd))
    h1 = jax.block_until_ready(isec(jnp.asarray(o2), jnp.asarray(d2)))
    t1 = np.asarray(h1.t)
    hit1 = np.asarray(h1.hit)

    # sample bounce rays that originated at a surface
    idx = np.flatnonzero(hitm)
    idx = idx[g.permutation(len(idx))[:n_rays]]
    o_s, d_s = o2[idx], d2[idx]
    tcap = np.where(hit1[idx], t1[idx] * 1.001, 3.4e38).astype(np.float32)

    pv = np.asarray(
        r.config.host_prim_verts
        if r.config.host_prim_verts is not None
        else r.dscene.prim_verts
    )
    q = len(pv)
    cent = pv.mean(axis=1)

    candidates = {"current(morton)": np.arange(q)}
    t0 = time.time()
    candidates["median-split"] = median_split_order(cent, PRIMS_PER_CLUSTER)
    print(f"median-split order built in {time.time()-t0:.1f}s "
          f"({q} prims)", flush=True)

    for name, order in candidates.items():
        bb = cluster_bboxes(pv, order)
        area = ((bb[:, 3] - bb[:, 0]) * (bb[:, 4] - bb[:, 1])
                + (bb[:, 4] - bb[:, 1]) * (bb[:, 5] - bb[:, 2])
                + (bb[:, 3] - bb[:, 0]) * (bb[:, 5] - bb[:, 2]))
        nv, ns = visits(bb, o_s, d_s, tcap)
        print(f"{name:18s}: clusters/ray mean {nv.mean():7.1f} "
              f"p50 {np.percentile(nv, 50):6.0f} p90 {np.percentile(nv, 90):6.0f}"
              f"  sup/ray mean {ns.mean():6.1f}"
              f"  sum-bbox-area {area.sum():.3e}", flush=True)


if __name__ == "__main__":
    main()
