"""Row/block union cost model for the worklist intersector.

The kernel's work is NOT per-ray: every (128-lane row) pays for each
cluster ANY of its lanes visits (cmask granularity), and every
1024-ray block pays a supercluster cull per live (block, supercluster)
step. So the lever is the SORT KEY: how tightly it packs rays whose
cluster footprints coincide.

Stage 1 dumps real bounce rays once (tools/cluster_stats.py recipe) to
/tmp/rowstats_<scene>.npz; stage 2 (numpy, re-runnable instantly)
sorts by candidate keys and reports:
  row-visits  = mean over rows of |union_lanes visited clusters|
                (~ kernel cluster-row steps / row)
  blk-sups    = mean over blocks of |union visited superclusters|
                (~ live (block, supercluster) grid steps / block)

Usage: python tools/row_union_stats.py [scene.json] [res] [n_blocks]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRIMS_PER_CLUSTER = 64
SUPER = 128
LANES = 128
BLOCK = 1024


def dump(scene_path: str, res: int, out: str):
    import jax
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.camera import sample_camera
    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state)
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
    pv = np.asarray(
        r.config.host_prim_verts
        if r.config.host_prim_verts is not None
        else r.dscene.prim_verts
    )
    np.savez(out, o=o2, d=d2, t=np.asarray(h1.t), hit=np.asarray(h1.hit),
             live=hitm, src_prim=np.asarray(h0.prim), pv_lo=pv.min((0, 1)),
             pv_hi=pv.max((0, 1)),
             cbb=cluster_bboxes(pv))
    print(f"dumped {out}", flush=True)


def cluster_bboxes(pv: np.ndarray) -> np.ndarray:
    q = len(pv)
    c = -(-q // PRIMS_PER_CLUSTER)
    pad = c * PRIMS_PER_CLUSTER - q
    v = np.concatenate([pv, np.tile(pv[-1:], (pad, 1, 1))]) if pad else pv
    v = v.reshape(c, -1, 3)
    return np.concatenate([v.min(axis=1), v.max(axis=1)], axis=1)


def _spread3(x):
    x = x.astype(np.uint64)
    x &= 0x1FFFFF
    x = (x | (x << 32)) & 0x1F00000000FFFF
    x = (x | (x << 16)) & 0x1F0000FF0000FF
    x = (x | (x << 8)) & 0x100F00F00F00F00F
    x = (x | (x << 4)) & 0x10C30C30C30C30C3
    x = (x | (x << 2)) & 0x1249249249249249
    return x


def morton3(p, lo, hi, bits=21):
    ext = np.where(hi - lo > 0, hi - lo, 1.0)
    q = np.clip((p - lo) / ext * ((1 << bits) - 1), 0, (1 << bits) - 1)
    q = q.astype(np.uint64)
    return (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
            | (_spread3(q[:, 2]) << 2))


def keys(name, o, d, t, lo, hi, src_prim):
    octant = (((d[:, 0] < 0).astype(np.uint64) << 2)
              | ((d[:, 1] < 0).astype(np.uint64) << 1)
              | (d[:, 2] < 0).astype(np.uint64))
    if name == "current":
        om = morton3(o, lo, hi) >> np.uint64(45)  # top 18 bits
        ad = np.abs(d)
        qd = np.clip(ad * 7.999, 0.0, 7.0).astype(np.uint64)
        dm = (_spread3(qd[:, 0]) | (_spread3(qd[:, 1]) << 1)
              | (_spread3(qd[:, 2]) << 2)) & np.uint64(0x1FF)
        return (octant << np.uint64(27)) | (om << np.uint64(9)) | dm
    if name == "om24":  # origin-major, fine origin bits, no direction
        return morton3(o, lo, hi) >> np.uint64(39)
    if name == "om18_oct_dm":  # origin-major then octant then dir
        om = morton3(o, lo, hi) >> np.uint64(45)
        ad = np.abs(d)
        qd = np.clip(ad * 7.999, 0.0, 7.0).astype(np.uint64)
        dm = (_spread3(qd[:, 0]) | (_spread3(qd[:, 1]) << 1)
              | (_spread3(qd[:, 2]) << 2)) & np.uint64(0x1FF)
        return (om << np.uint64(12)) | (octant << np.uint64(9)) | dm
    if name == "cluster_oct":  # source cluster id, then direction octant
        cid = (np.maximum(src_prim, 0) // (2 * PRIMS_PER_CLUSTER)).astype(np.uint64)
        return (cid << np.uint64(3)) | octant
    if name == "oct_om21":  # current minus direction refinement, finer om
        om = morton3(o, lo, hi) >> np.uint64(42)
        return (octant << np.uint64(21)) | om
    if name == "6dmorton":  # interleave origin(16b/ax) + dir(5b/ax)
        ext = np.where(hi - lo > 0, hi - lo, 1.0)
        qo = np.clip((o - lo) / ext * 65535, 0, 65535).astype(np.uint64)
        qd = np.clip((d * 0.5 + 0.5) * 31.999, 0, 31).astype(np.uint64)
        key = np.zeros(len(o), np.uint64)
        # dir bits are the TOP interleave group every ~3 origin bits
        for b in range(16):
            for ax in range(3):
                key |= ((qo[:, ax] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + ax)
        for b in range(5):
            for ax in range(3):
                key |= ((qd[:, ax] >> np.uint64(b)) & np.uint64(1)) << np.uint64(48 + 3 * b + ax)
        return key
    raise ValueError(name)


def analyze(npz: str, n_blocks: int):
    z = np.load(npz)
    o, d, t, hit, live = z["o"], z["d"], z["t"], z["hit"], z["live"]
    lo, hi, cbb = z["pv_lo"], z["pv_hi"], z["cbb"]
    src = z["src_prim"]
    tcap = np.where(hit, t * 1.001, 3.4e38).astype(np.float32)
    C = len(cbb)
    S = -(-C // SUPER)
    n = len(o) // BLOCK * BLOCK

    # The visibility matrix is key-INDEPENDENT: a ray visits cluster c
    # regardless of how rays are later grouped into rows/blocks. Compute
    # it once, bit-packed [N, ceil(C/8)], then every sort key reduces to
    # cheap row-gather + bitwise-or unions.
    packed = np.zeros((len(o), (C + 7) // 8), np.uint8)
    lane_ct = np.zeros(len(o), np.int64)
    CH = 2048
    for s in range(0, len(o), CH):
        ob, db, tb = o[s:s+CH], d[s:s+CH], tcap[s:s+CH]
        inv = 1.0 / np.where(db == 0.0, 1e-30, db)
        t0 = (cbb[None, :, 0:3] - ob[:, None, :]) * inv[:, None, :]
        t1 = (cbb[None, :, 3:6] - ob[:, None, :]) * inv[:, None, :]
        enter = np.minimum(t0, t1).max(axis=2)
        exit_ = np.maximum(t0, t1).min(axis=2)
        vis = (enter <= np.minimum(exit_, tb[:, None]) * 1.00000024)
        vis &= live[s:s+CH, None]
        lane_ct[s:s+CH] = vis.sum(1)
        packed[s:s+CH] = np.packbits(vis, axis=1)
        if (s // CH) % 16 == 0:
            print(f"pack {s}/{len(o)}", flush=True)
    popcnt = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                           axis=1).sum(1).astype(np.int64)
    # supercluster membership: cluster c -> super c // SUPER
    sup_of = np.arange(C) // SUPER

    for name in ("current", "oct_om21", "om24", "om18_oct_dm",
                 "cluster_oct", "6dmorton"):
        k = keys(name, o, d, t, lo, hi, src)
        # dead lanes to the tail (kernel behavior)
        k = np.where(live, k, np.uint64(1) << np.uint64(62))
        perm = np.argsort(k, kind="stable")
        nb = min(n_blocks, n // BLOCK)
        idx = perm[:nb * BLOCK]
        p = packed[idx].reshape(nb, 8, LANES, -1)
        rows = np.bitwise_or.reduce(p, axis=2)           # [nb, 8, C/8]
        row_vis = popcnt[rows].sum(2).mean()
        blocks = np.bitwise_or.reduce(rows, axis=1)      # [nb, C/8]
        bvis = np.unpackbits(blocks, axis=1)[:, :C].astype(bool)
        blk_sup = np.array([
            np.unique(sup_of[bv]).size for bv in bvis]).mean()
        lane_vis = lane_ct[idx].mean()
        print(f"{name:12s}: lane-visits {lane_vis:7.1f}  "
              f"row-visits {row_vis:7.1f}  "
              f"blk-sups {blk_sup:6.1f}  "
              f"(x{row_vis/max(lane_vis,1e-9):.1f} row amp)",
              flush=True)


if __name__ == "__main__":
    scene_path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/scenes/kitchen/kitchen.json")
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    tag = os.path.splitext(os.path.basename(scene_path))[0]
    npz = f"/tmp/rowstats_{tag}_{res}.npz"
    if not os.path.exists(npz):
        dump(scene_path, res, npz)
    analyze(npz, nb)
