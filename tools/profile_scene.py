"""Per-stage device-trace breakdown for ANY scene (VERDICT r4 item 3:
split the non-intersector megakernel time on a heavy scene).

Captures a jax.profiler trace of N samples at the given resolution and
buckets on-device time by kernel class:
  custom-call  -> Pallas intersector kernels (pack/tri/unpack/worklist)
  sort         -> the between-bounce wavefront sort
  gather/scatter -> texture taps, table lookups, compaction moves
  fusion       -> fused XLA elementwise (shading/eval/light-pdf math)
Plus the top named spans, so regressions name their kernel.

Usage: python tools/profile_scene.py [scene] [res] [spp] [--json OUT]
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify(name: str) -> str:
    n = name.lower()
    if n.startswith("while") or n.startswith("jit_"):
        return "_envelope"  # contains children: excluded from sums
    if "custom-call" in n or "tpu_custom_call" in n or \
            "intersect" in n or n.startswith("pack") or \
            n.startswith("unpack") or n.startswith("tri"):
        return "pallas_custom_call"
    if "sort" in n:
        return "sort"
    if "gather" in n or "scatter" in n:
        return "gather_scatter"
    if "fusion" in n or "multiply" in n or "add" in n or "select" in n \
            or "reduce" in n or "compare" in n or "and" in n or "or" in n:
        return "fusion_elementwise"
    if "copy" in n or "transpose" in n or "reshape" in n \
            or "dynamic" in n or "bitcast" in n or "convert" in n:
        return "layout"
    return "other"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    scene_name = args[0] if args else "kitchen"
    res = int(args[1]) if len(args) > 1 else 720
    spp = int(args[2]) if len(args) > 2 else 1
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

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

    scene_path = f"/root/reference/scenes/{scene_name}/{scene_name}.json"
    scene = load_scene(scene_path)
    params = Params(
        scene=scene_path, resolution=res, samples=2 * spp, bounces=8,
        sampler="path", batch=spp,
    )
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    # warm with the SAME batch size as the traced window: the compiled
    # kernel depends on batch structure (loop_s), and a mismatched
    # warmup puts the real kernel's compile inside the trace
    state = r.trace_samples(state)
    fence(state.image)

    r.params.batch = spp
    tdir = f"/tmp/jaxtrace_{scene_name}"
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        state = r.trace_samples(state)
        fence(state.image)
    wall = time.perf_counter() - t0

    files = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
    agg = collections.Counter()
    cats = collections.Counter()
    dev_busy = 0.0
    if files:
        with gzip.open(files[-1]) as f:
            tr = json.load(f)
        pids = {e["pid"]: e["args"].get("name", "")
                for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        for e in tr["traceEvents"]:
            if (e.get("ph") == "X" and e.get("dur", 0) > 0
                    and "TPU" in pids.get(e["pid"], "")):
                if e.get("tid") == 2:  # top-level device lane
                    dev_busy += e["dur"]
                else:  # nested XLA-op lane: the real breakdown
                    agg[e["name"][:56]] += e["dur"]
                    c = classify(e["name"])
                    if c != "_envelope":  # envelopes contain children
                        cats[c] += e["dur"]
    n_paths = state.n_pixels * spp
    out = {
        "scene": scene_name, "res": res, "spp": spp,
        "wall_s": round(wall, 3),
        "ms_per_sample_wall": round(wall * 1e3 / spp, 1),
        "device_busy_s": round(dev_busy / 1e6, 3),
        "device_busy_frac": round(dev_busy / 1e6 / wall, 3),
        "mpaths_per_s": round(n_paths / wall / 1e6, 3),
        "category_ms": {
            k: round(v / 1e3, 1) for k, v in cats.most_common()
        },
        "top_device_spans_ms": {
            k: round(v / 1e3, 1) for k, v in agg.most_common(14)
        },
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
