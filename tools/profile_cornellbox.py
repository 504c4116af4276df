"""Flagship-bench breakdown (VERDICT r3 item 4): where does the
cornellbox 512px/32spp bench time go — kernel, dispatch, accumulation,
or tunnel? Captures a device trace of the exact bench workload and
aggregates on-device kernel time vs wall.

Usage: python tools/profile_cornellbox.py [--json PROFILE_CB_r04.json]
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state,
    )
    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.utils.timing import fence

    scene = load_scene("/root/reference/scenes/cornellbox/cornellbox.json")
    # warm with the SAME batch size as the traced window: the compiled
    # kernel depends on the batch structure (loop_s in-dispatch sample
    # loop), and a mismatched warmup puts its compile inside the trace
    # (bench.py has the same rule)
    params = Params(resolution=512, samples=64, bounces=8, sampler="path",
                    batch=32)
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    state = r.trace_samples(state)      # warm (compile + 2 spp)
    fence(state.image)

    r.params.batch = 32
    tdir = "/tmp/jaxtrace_cb"
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        state = r.trace_samples(state)
        fence(state.image)
    wall = time.perf_counter() - t0

    files = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
    agg = collections.Counter()
    dev_busy = 0.0
    if files:
        with gzip.open(files[-1]) as f:
            tr = json.load(f)
        pids = {e["pid"]: e["args"].get("name", "")
                for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        for e in tr["traceEvents"]:
            if (e.get("ph") == "X" and e.get("dur", 0) > 0
                    and "TPU" in pids.get(e["pid"], "")
                    and e.get("tid") in (2,)):  # top-level device lane
                agg[e["name"][:48]] += e["dur"]
                dev_busy += e["dur"]
    paths = state.n_pixels * 32
    out = {
        "wall_s": round(wall, 3),
        "mpaths_per_s": round(paths / wall / 1e6, 2),
        "device_busy_s": round(dev_busy / 1e6, 3),
        "device_busy_frac": round(dev_busy / 1e6 / wall, 3),
        "top_device_spans_ms": {
            k: round(v / 1e3, 1) for k, v in agg.most_common(8)
        },
        "note": "device_busy_frac < 1 means the flagship number is "
                "bounded by host dispatch / tunnel latency, not kernels",
    }
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
