"""Predict the faster bounce intersector (worklist vs regroup) per scene
from BUILD-TIME data only (VERDICT r4 item 5: replace the static 150k-prim
threshold with a per-scene decision).

Method: sample bounce-like rays (surface points + uniform-sphere
directions — the divergent population the bounce dispatch actually sees),
reproduce both kernels' dynamic pass/pair counts in numpy
(utils/kernel_flops.py — exact for regroup, upper bound for worklist),
and convert to predicted dispatch times with per-unit costs measured on
the v5e in round 4 (INTERSECT_MFU_r04.json + its device-trace split):

  worklist: 458.7 ms / 436,350 passes (kitchen bounce)  -> 1.051 us/pass
  regroup:  tri 169 ms / 208,212 passes -> 0.81 us/pass
            pack+unpack 90 ms / ~23k live pairs         -> 3.9 us/pair
            merge 35 ms / 294,912 rays                  -> 0.12 us/ray
            count ~2 ms fixed

Run: python tools/kernel_select_probe.py [scene ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_PLATFORMS"] = os.environ.get("JRT_PROBE_PLATFORM", "cpu")

import numpy as np


def bounce_rays(prim_verts: np.ndarray, n_rays: int, seed: int = 11):
    """Surface-sampled divergent rays: uniform prim pick, bilinear point
    on the (possibly degenerate) quad, uniform-sphere direction."""
    rng = np.random.default_rng(seed)
    q = len(prim_verts)
    pi = rng.integers(0, q, n_rays)
    pv = prim_verts[pi]                      # [n, 4, 3]
    u = rng.random((n_rays, 1), dtype=np.float32)
    v = rng.random((n_rays, 1), dtype=np.float32)
    p = ((1 - u) * (1 - v) * pv[:, 0] + u * (1 - v) * pv[:, 1]
         + u * v * pv[:, 2] + (1 - u) * v * pv[:, 3]).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-20
    ext = float(prim_verts.reshape(-1, 3).max() - prim_verts.reshape(-1, 3).min())
    tmin = np.full(n_rays, 1e-4 * max(ext, 1.0), np.float32)
    tmax = np.full(n_rays, 3.0e38, np.float32)
    return p, d, tmin, tmax


# measured per-unit costs (v5e, INTERSECT_MFU_r04 + trace split)
US_WL_PASS = 1.051
US_RG_PASS = 0.81
US_RG_PAIR = 3.9
US_RG_RAY = 0.12
MS_RG_FIXED = 2.0


def predict(verts_np, inst_np, cache_key, n_rays=65536, seed=11):
    from julia_raytracer_tpu.ops.pallas_cluster import _load_tables
    from julia_raytracer_tpu.utils import kernel_flops as kf

    tfm, nrm, bbox, n_clusters = _load_tables(verts_np, inst_np, cache_key)
    o, d, tmin, tmax = bounce_rays(verts_np, n_rays, seed)
    rg = kf.regroup_dispatch_stats(o, d, tmin, tmax, bbox[:n_clusters, 0:6])
    wl = kf.worklist_dispatch_stats(o, d, tmin, tmax, bbox[:n_clusters, 0:6])
    t_wl = wl["passes"] * US_WL_PASS * 1e-3
    t_rg = (rg["passes"] * US_RG_PASS * 1e-3
            + rg["pairs_live"] * US_RG_PAIR * 1e-3
            + n_rays * US_RG_RAY * 1e-3
            + MS_RG_FIXED)
    return dict(
        n_rays=n_rays, n_super=rg["n_super"],
        passes_wl=wl["passes"], passes_rg=rg["passes"],
        pairs_wl=wl["pairs_live"], pairs_rg=rg["pairs_live"],
        rows_rg=rg["rows"],
        t_wl_ms=round(t_wl, 1), t_rg_ms=round(t_rg, 1),
        ratio=round(t_rg / max(t_wl, 1e-9), 3),
    )


def main():
    from julia_raytracer_tpu.render.scene_device import build_device_scene
    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.utils.diskcache import scene_cache_key

    names = sys.argv[1:] or ["features1", "kitchen", "bathroom1"]
    for name in names:
        scene_path = f"/root/reference/scenes/{name}/{name}.json"
        scene = load_scene(scene_path)
        ck = scene_cache_key(scene_path, "mid", "sky0:env-")
        dscene, config = build_device_scene(scene, cache_key=ck)
        verts = config.host_prim_verts
        inst = config.host_prim_instance
        if verts is None:
            print(f"{name}: no flattened prim soup (instanced path) — skip")
            continue
        t0 = time.time()
        st = predict(np.asarray(verts), np.asarray(inst), config.cache_key)
        st["probe_s"] = round(time.time() - t0, 1)
        print(name, st)


if __name__ == "__main__":
    main()
