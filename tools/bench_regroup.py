"""Bench worklist vs regroup intersectors on a real bounce-ray dump.

Reuses tools/row_union_stats.dump() to produce /tmp/rowstats_<scene>.npz
(primary hits reflected into a diffuse bounce wavefront), then times
both intersectors on the SAME rays, fencing every iteration
(utils/timing.fence; see PERF_r03.md "The axon fence problem") and
reporting the measured fence round-trip separately so per-iteration
numbers can be discounted.

Usage: python tools/bench_regroup.py [scene] [res] [iters]
       (defaults: kitchen 512 5)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "kitchen"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    scene_path = f"/root/reference/scenes/{scene}/{scene}.json"
    dump_path = f"/tmp/rowstats_{scene}_{res}.npz"

    import jax
    import jax.numpy as jnp

    from julia_raytracer_tpu.utils.timing import fence

    if not os.path.exists(dump_path):
        from tools.row_union_stats import dump
        dump(scene_path, res, dump_path)

    z = np.load(dump_path)
    o, d = z["o"], z["d"]
    n = len(o)
    print(f"{scene} {res}px: {n} bounce rays", flush=True)

    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.render.renderer import Params, Renderer

    sc = load_scene(scene_path)
    r = Renderer(sc, Params(resolution=res, samples=1, bounces=2))
    pv = np.asarray(
        r.config.host_prim_verts if r.config.host_prim_verts is not None
        else r.dscene.prim_verts)
    inst = np.asarray(
        r.config.host_prim_instance if r.config.host_prim_instance is not None
        else r.dscene.prim_instance)
    ck = r.config.cache_key

    from julia_raytracer_tpu.ops.pallas_cluster import (
        make_cluster_intersect_worklist,
    )
    from julia_raytracer_tpu.ops.pallas_regroup import (
        make_cluster_intersect_regroup,
    )

    wl = make_cluster_intersect_worklist(pv, inst, cache_key=ck)
    rg = make_cluster_intersect_regroup(pv, inst, cache_key=ck)

    o_d, d_d = jnp.asarray(o), jnp.asarray(d)
    tmin = jnp.full(n, 1e-4, jnp.float32)
    tmax = jnp.full(n, 3.4e38, jnp.float32)

    # fence round-trip baseline
    x = jnp.zeros(8)
    fence(x)
    t0 = time.perf_counter()
    for _ in range(10):
        fence(x + 1.0)
    rt = (time.perf_counter() - t0) / 10
    print(f"fence round-trip: {rt*1e3:.1f} ms", flush=True)

    out = {"scene": scene, "res": res, "n_rays": n, "fence_ms": rt * 1e3}
    hits = {}
    for name, isec in (("worklist", wl), ("regroup", rg)):
        h = fence(isec(o_d, d_d, tmin, tmax))  # compile + warm
        hits[name] = jax.tree.map(np.asarray, h)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fence(isec(o_d, d_d, tmin, tmax))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        best = min(ts)
        print(f"{name}: median {med*1e3:.1f} ms  min {best*1e3:.1f} ms "
              f"(minus fence ~{(med-rt)*1e3:.1f} ms)", flush=True)
        out[name + "_ms"] = med * 1e3
        out[name + "_minus_fence_ms"] = (med - rt) * 1e3

    ha, hb = hits["worklist"], hits["regroup"]
    both = ha.hit & hb.hit
    out["hit_match"] = float((ha.hit == hb.hit).mean())
    out["prim_match"] = float((ha.prim[both] == hb.prim[both]).mean())
    out["speedup"] = out["worklist_ms"] / out["regroup_ms"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
