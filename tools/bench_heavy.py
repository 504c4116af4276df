"""Heavy-tier benchmark (BASELINE config 4): kitchen + bathroom1 at 720p.

Renders a small sample count at the full config-4 resolution and
extrapolates wall-time for 256 spp from the steady-state per-sample
time (the accumulation is a running mean, so per-sample cost is
constant). Writes BENCH_HEAVY.json at the repo root:

  {scene: {resolution, spp_measured, ms_per_sample, mrays_per_s,
           est_wall_256spp_s, host_prep_s, compile_s}}

Usage: python tools/bench_heavy.py [scene ...]   (default: both)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCENES = {
    "kitchen": 720,
    "bathroom1": 720,
    "ecosys": 480,
}


def bench(name: str, resolution: int, warm: int = 1, measured: int = 4) -> dict:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    from julia_raytracer_tpu.render.renderer import Params, Renderer, make_trace_state
    from julia_raytracer_tpu.scene.loader import load_scene

    scene_path = f"/root/reference/scenes/{name}/{name}.json"
    t0 = time.time()
    scene = load_scene(scene_path)
    params = Params(
        scene=scene_path, resolution=resolution, samples=warm + measured,
        batch=warm, bounces=8, sampler="path",
    )
    r = Renderer(scene, params)
    host_prep = time.time() - t0

    from julia_raytracer_tpu.utils.timing import fence

    state = make_trace_state(scene, params)
    t0 = time.time()
    state = r.trace_samples(state)  # warm batch: includes compile
    fence(state.image)
    compile_s = time.time() - t0

    r.params.batch = measured
    t0 = time.time()
    state = r.trace_samples(state)
    fence(state.image)
    dt = time.time() - t0

    ms_per_sample = dt / measured * 1e3
    n_px = state.n_pixels
    # paths/s: one camera path per pixel per sample
    mrays = n_px * measured / dt / 1e6
    extra = {}
    # MFU/roofline (VERDICT r2 item 5): cost analysis of the compiled
    # per-sample kernel vs v5e peaks; TPU only.
    if jax.devices()[0].platform != "cpu":
        from julia_raytracer_tpu.utils.roofline import roofline

        cost = r.sample_kernel_cost(state)
        if cost:
            extra.update(roofline(
                cost["flops"] * measured,
                cost["bytes_accessed"] * measured, dt,
            ))
    tb = r.config.inst_tables
    if tb is not None:
        inst_extra = extra
        # two-level instancing: report device-table footprint vs what the
        # single-level flatten would have uploaded (VERDICT r1 item 2)
        inst_bytes = tb.tab.nbytes + tb.bbox.nbytes + tb.inst_rows.nbytes + tb.wi_bbox.nbytes
        shape_prims = {}
        for inst in scene.instances:
            if 0 <= inst.shape < len(scene.shapes):
                sh = scene.shapes[inst.shape]
                shape_prims[inst.shape] = max(len(sh.quads), len(sh.triangles))
        flat_prims = sum(shape_prims.get(i.shape, 0) for i in scene.instances)
        extra = {
            **inst_extra,
            "instanced": True,
            "device_tables_mb": round(inst_bytes / 1e6, 1),
            "flattened_prims": flat_prims,
            "instanced_prims": tb.n_prims,
            "est_flattened_tables_mb": round(
                inst_bytes / max(tb.n_prims, 1) * flat_prims / 1e6, 1
            ),
            "work_items": int(len(tb.wi_sup)),
        }
        hyb = getattr(r.config, "hyb_world_verts", None)
        if hyb is not None and len(hyb):
            # hybrid build: world soup tables are intersector-only
            # (128 B/prim cluster tables); eval stays shape-space
            extra["hybrid_world_prims"] = int(len(hyb))
            extra["hybrid_world_tables_mb"] = round(len(hyb) * 128 / 1e6, 1)
    return {
        "resolution": f"{state.width}x{state.height}",
        "spp_measured": measured,
        "ms_per_sample": round(ms_per_sample, 1),
        "mpaths_per_s": round(mrays, 3),
        "est_wall_256spp_s": round(ms_per_sample * 256 / 1e3, 1),
        "host_prep_s": round(host_prep, 1),
        "first_batch_incl_compile_s": round(compile_s, 1),
        **extra,
    }


def main() -> None:
    names = sys.argv[1:] or list(SCENES)
    out_path = os.path.join(REPO, "BENCH_HEAVY.json")
    if len(names) > 1:
        # One scene per subprocess: benching several scenes in one
        # process polluted the third scene's measured batch (ecosys
        # reported 0.6 ms/sample after kitchen+bathroom1 filled HBM;
        # alone it reports its true ~8 s/sample). Each child rewrites
        # its own key in BENCH_HEAVY.json.
        import subprocess

        failed = {}
        for name in names:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name]
            ).returncode
            if rc != 0:
                # record and continue: aborting here left the remaining
                # scenes' BENCH_HEAVY entries silently stale (advisor r3)
                failed[name] = rc
                print(f"bench_heavy: {name} FAILED rc={rc}; continuing",
                      flush=True)
        if failed:
            print(f"bench_heavy: failed scenes (entries NOT refreshed): "
                  f"{failed}", flush=True)
            sys.exit(1)
        return
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name in names:
        print(f"benchmarking {name}...", flush=True)
        results[name] = bench(name, SCENES[name])
        print(json.dumps({name: results[name]}), flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
