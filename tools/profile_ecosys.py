"""Profile the two-level instanced intersector on ecosys (real TPU).

Measures, for primary rays and synthetic bounce-like rays (hit position
+ cosine-hemisphere direction, octant+morton sorted like the
integrator):
  - beam-precull candidate counts per 1024-ray block (cnt histogram)
  - implied K-capped round counts
  - wall time per intersect call

Usage: python tools/profile_ecosys.py [--res 480]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=480)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )

    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state,
    )
    from julia_raytracer_tpu.ops.camera import sample_camera
    from julia_raytracer_tpu.utils import rng as rng_mod

    scene_path = "/root/reference/scenes/ecosys/ecosys.json"
    t0 = time.time()
    scene = load_scene(scene_path)
    params = Params(scene=scene_path, resolution=args.res, sampler="path")
    r = Renderer(scene, params)
    print(f"host prep {time.time()-t0:.1f}s")
    tabs = r.config.inst_tables
    assert tabs is not None
    print(
        f"items={len(tabs.wi_sup)} instances={tabs.inst_rows.shape[0]} "
        f"sup={tabs.sup} n_prims={tabs.n_prims}"
    )
    hyb = getattr(r.config, "hyb_world_verts", None)
    if hyb is not None and len(hyb):
        print(
            f"hybrid: {len(hyb)} world prims flattened; instanced branch "
            f"keeps {len(set(np.asarray(tabs.wi_inst).tolist()))} instances"
        )

    state = make_trace_state(scene, params)
    W, H = state.width, state.height
    n = W * H
    pix = jnp.arange(n, dtype=jnp.int32)
    rng = rng_mod.seed_state(pix, jnp.int32(0), 0)
    puv, rng = rng_mod.rand2f(rng)
    luv, rng = rng_mod.rand2f(rng)
    ij = jnp.stack([pix % W, pix // W], axis=-1)
    ro, rd = sample_camera(r.cam_arrays, ij, (W, H), puv, luv, False)
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), 1e9, jnp.float32)

    intersect = r.intersect

    def timed(name, f, *a):
        from julia_raytracer_tpu.utils.timing import fence

        out = fence(f(*a))
        t1 = time.time()
        out = fence(f(*a))
        dt = time.time() - t1
        print(f"{name}: {dt*1e3:.1f} ms ({n/dt/1e6:.2f} Mrays/s)")
        return out

    hit = timed("primary intersect", intersect, ro, rd, tmin, tmax)
    hr = float(jnp.mean(hit.hit.astype(jnp.float32)))
    print(f"  hit rate {hr:.3f}")

    # hybrid branch split (intersect.flat_part / .inst_part diagnostics)
    flat_part = getattr(intersect, "flat_part", None)
    inst_part = getattr(intersect, "inst_part", None)
    unwrapped = intersect
    if flat_part is None and hasattr(intersect, "__wrapped__"):
        unwrapped = intersect.__wrapped__
        flat_part = getattr(unwrapped, "flat_part", None)
        inst_part = getattr(unwrapped, "inst_part", None)

    def timed_part(name, part, *a):
        if part is None:
            return None
        tbs = getattr(part, "tables", None)
        if tbs is not None:
            return timed(name, lambda *b: part(*b, tables=tbs), *a)
        return timed(name, part, *a)

    # ---- beam precull stats ----------------------------------------------
    wib = np.asarray(tabs.wi_bbox, np.float32)

    def cnt_stats(ro_, rd_, label):
        BLOCK = 1024
        n_pad = -(-n // BLOCK) * BLOCK
        ro_p = np.pad(np.asarray(ro_), ((0, n_pad - n), (0, 0)))
        rd_p = np.pad(np.asarray(rd_), ((0, n_pad - n), (0, 0)))
        nb = n_pad // BLOCK
        ro_b = ro_p.reshape(nb, BLOCK, 3)
        rd_b = rd_p.reshape(nb, BLOCK, 3)
        blo, bhi = wib[:, 0:3], wib[:, 3:6]
        cnt = np.zeros(nb, np.int64)
        for b in range(nb):  # exact per-ray slab cull (matches the kernel)
            o, d = ro_b[b], rd_b[b]
            di = 1.0 / np.where(d == 0, 1e-30, d)
            t0 = (blo[None] - o[:, None]) * di[:, None]
            t1 = (bhi[None] - o[:, None]) * di[:, None]
            enter = np.minimum(t0, t1).max(-1)
            exit_ = np.maximum(t0, t1).min(-1)
            enter = np.maximum(enter, 1e-4)
            hit = enter <= exit_ * 1.00000024
            cnt[b] = hit.any(0).sum()
        print(
            f"{label} cnt/block: med {np.median(cnt):.0f} mean {cnt.mean():.0f} "
            f"p90 {np.percentile(cnt, 90):.0f} max {cnt.max()} "
            f"rounds(K=64): mean {np.ceil(cnt / 64).mean():.1f} "
            f"max {int(np.ceil(cnt.max() / 64))}"
        )
        return cnt

    cnt_stats(ro, rd, "primary")

    # ---- synthetic bounce rays -------------------------------------------
    pos = np.asarray(hit.position)
    gn = np.asarray(hit.gnormal)
    hm = np.asarray(hit.hit)
    idx = np.nonzero(hm)[0]
    take = np.resize(idx, n)
    p, nrm = pos[take], gn[take]
    rg = np.random.default_rng(0)
    u1 = rg.random(n).astype(np.float32)
    u2 = rg.random(n).astype(np.float32)
    rr = np.sqrt(u1)
    phi = 2 * np.pi * u2
    x, y = rr * np.cos(phi), rr * np.sin(phi)
    z = np.sqrt(np.maximum(1 - u1, 0))
    up = np.where(np.abs(nrm[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
    t1v = np.cross(up, nrm)
    t1v /= np.linalg.norm(t1v, axis=1, keepdims=True) + 1e-12
    t2v = np.cross(nrm, t1v)
    d = x[:, None] * t1v + y[:, None] * t2v + z[:, None] * nrm
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    o = (p + 1e-3 * d).astype(np.float32)
    d = d.astype(np.float32)

    # octant+morton sort (integrator key)
    from julia_raytracer_tpu.ops.bvh import _morton3 as m3
    lo = wib[:, 0:3].min(0)
    hi = wib[:, 3:6].max(0)
    ext = np.maximum(hi - lo, 1e-30)
    q = np.clip((o - lo) / ext * ((1 << 21) - 1), 0, (1 << 21) - 1).astype(np.uint64)
    mk = m3(q)
    octant = (
        ((d[:, 0] < 0).astype(np.int64) << 2)
        | ((d[:, 1] < 0).astype(np.int64) << 1)
        | (d[:, 2] < 0).astype(np.int64)
    )
    key_s = (octant << 58) | (mk.astype(np.int64) >> 5)
    perm = np.argsort(key_s)
    o_s, d_s = o[perm], d[perm]

    cnt_stats(o_s, d_s, "bounce(sorted)")
    cnt_stats(o, d, "bounce(unsorted)")

    o_sd, d_sd = jnp.asarray(o_s), jnp.asarray(d_s)
    timed("bounce intersect (sorted)", intersect, o_sd, d_sd, tmin, tmax)
    # branch split: flat soup vs work-item kernel, primary and bounce
    timed_part("  flat_part primary", flat_part, ro, rd, tmin, tmax)
    timed_part("  inst_part primary", inst_part, ro, rd, tmin, tmax)
    timed_part("  flat_part bounce(sorted)", flat_part, o_sd, d_sd, tmin, tmax)
    timed_part("  inst_part bounce(sorted)", inst_part, o_sd, d_sd, tmin, tmax)


if __name__ == "__main__":
    main()
