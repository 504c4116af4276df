"""Liveness-sweep A/B: what do DEAD lanes cost each bounce intersector?

The integrator dispatches full fixed-shape wavefronts every bounce; dead
lanes ride along with tmax=RAY_EPS (render/integrator.py:906) sorted to
the tail. A dead ray whose origin sits INSIDE a supercluster bbox still
passes the count/precull slab test (enter clamps to tmin < exit=RAY_EPS
iff slab entry < RAY_EPS, true inside the box), so dead tails still
generate pack/sweep work. This bench sweeps the alive fraction and
compares dead-tmax = RAY_EPS (today) vs dead-tmax = -1 (bits
unconditionally 0) for both kernels, on a real kitchen bounce dump.

Hypothesis under test (round-5): the regroup kernel's end-to-end
regression on kitchen (+4.5%, KNOBS_r04) despite a 1.30x dispatch win at
full liveness is late-bounce dead-lane overhead + fixed grid costs.

Run (TPU): python tools/liveness_ab.py [scene] [res] [--json OUT]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RAY_EPS = 1e-4


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    scene = args[0] if args else "kitchen"
    res = int(args[1]) if len(args) > 1 else 512
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    scene_path = f"/root/reference/scenes/{scene}/{scene}.json"
    dump_path = f"/tmp/rowstats_{scene}_{res}.npz"

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from julia_raytracer_tpu.utils.timing import fence

    if not os.path.exists(dump_path):
        from tools.row_union_stats import dump
        dump(scene_path, res, dump_path)
    z = np.load(dump_path)
    o, d = z["o"], z["d"]
    n = len(o)

    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.render.renderer import Params, Renderer

    sc = load_scene(scene_path)
    r = Renderer(sc, Params(resolution=res, samples=1, bounces=2))
    pv = np.asarray(r.config.host_prim_verts)
    inst = np.asarray(r.config.host_prim_instance)
    ck = r.config.cache_key

    from julia_raytracer_tpu.ops.pallas_cluster import (
        make_cluster_intersect_worklist,
    )
    from julia_raytracer_tpu.ops.pallas_regroup import (
        make_cluster_intersect_regroup,
    )

    isecs = {
        "worklist": make_cluster_intersect_worklist(pv, inst, cache_key=ck),
        "regroup": make_cluster_intersect_regroup(pv, inst, cache_key=ck),
    }

    print(f"{scene} {res}px: {n} bounce rays; sweeping alive fraction",
          flush=True)
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)
    tmin = jnp.full(n, RAY_EPS, jnp.float32)

    result = {"scene": scene, "res": res, "n_rays": n, "rows": []}
    for frac in (1.0, 0.5, 0.25, 0.1, 0.03):
        n_live = max(1, int(n * frac))
        aliveh = np.zeros(n, np.float32)
        aliveh[:n_live] = 1.0  # dump order ~ the integrator's sorted order
        for dead_tmax, mode in ((RAY_EPS, "eps"), (-1.0, "neg")):
            tmax_np = np.where(aliveh > 0, 3.4e38, dead_tmax).astype(np.float32)
            tmax = jnp.asarray(tmax_np)
            row = {"alive_frac": frac, "dead_tmax": mode}
            for name, isec in isecs.items():
                fence(isec(o_d, d_d, tmin, tmax))
                k = 6
                best = None
                for _ in range(2):
                    oo = o_d
                    t0 = time.perf_counter()
                    h = None
                    for _i in range(k):
                        h = isec(oo, d_d, tmin, tmax)
                        oo = o_d + 0.0 * h.t[:, None]
                    fence(h)
                    dt = (time.perf_counter() - t0) / k
                    best = dt if best is None else min(best, dt)
                row[name + "_ms"] = round(best * 1e3, 1)
            row["speedup_rg"] = round(
                row["worklist_ms"] / max(row["regroup_ms"], 1e-9), 3)
            result["rows"].append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps(result))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
