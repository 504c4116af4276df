"""Which fusion grows superlinearly with lane count in the megakernel?

bench A/B at correct warmup shows the device cost of one dispatch going
8.06 ms (262k lanes, k=1) -> ~40 ms (1M lanes, k=4): 4x the work for
4.96x the time. If the extra ~8 ms were found and fixed, k=4 dispatch
amortization would put the flagship at ~32 Mpaths/s. This traces a few
dispatches at k=1 and k=4 and prints per-fusion device totals
(normalized per sample) side by side.

Usage: python tools/probe_k_fusions.py
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def capture(k: int, dispatches: int = 8):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state,
    )
    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.utils.timing import fence

    os.environ["JRT_SPP_K"] = str(k)
    # pin the in-dispatch sample loop OFF: its default (8) would change
    # the dispatch shape mid-probe and re-introduce the in-window
    # compile artifact this tool exists to rule out
    os.environ["JRT_SPP_LOOP"] = "1"
    n_samples = k * dispatches
    scene = load_scene("/root/reference/scenes/cornellbox/cornellbox.json")
    params = Params(resolution=512, samples=2 * k + n_samples, bounces=8,
                    sampler="path", batch=2 * k)
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    state = r.trace_samples(state)
    fence(state.image)

    r.params.batch = n_samples
    tdir = f"/tmp/jaxtrace_kf_{k}"
    shutil.rmtree(tdir, ignore_errors=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        state = r.trace_samples(state)
        fence(state.image)
    wall = time.perf_counter() - t0

    files = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
    agg = collections.Counter()
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X" and e.get("dur", 0) > 0
                and "TPU" in pids.get(e["pid"], "")):
            nm = e.get("args", {}).get("long_name", e["name"])
            # strip XLA unique suffixes so k=1/k=4 keys line up
            key = nm.split(" ")[0].rstrip("0123456789.").rstrip("_")
            if e.get("tid") in (2,):
                key = "TOTAL:" + e["name"][:24]
            agg[key] += e["dur"]
    os.environ.pop("JRT_SPP_K", None)
    os.environ.pop("JRT_SPP_LOOP", None)
    # per-sample us
    return {kk: v / n_samples for kk, v in agg.items()}, wall / n_samples


def main():
    a1, w1 = capture(1)
    a4, w4 = capture(4)
    keys = sorted(set(a1) | set(a4),
                  key=lambda kk: -(a4.get(kk, 0) - a1.get(kk, 0)))
    print(f"{'fusion':<52} {'k=1 us/smp':>12} {'k=4 us/smp':>12} {'x':>6}")
    rows = []
    for kk in keys:
        v1, v4 = a1.get(kk, 0.0), a4.get(kk, 0.0)
        if max(v1, v4) < 20:
            continue
        ratio = v4 / v1 if v1 > 0 else float("inf")
        print(f"{kk[:52]:<52} {v1:>12.1f} {v4:>12.1f} {ratio:>6.2f}")
        rows.append({"fusion": kk[:80], "k1_us": round(v1, 1),
                     "k4_us": round(v4, 1), "ratio": round(ratio, 2)})
    out = {"wall_ms_per_sample": {"k1": round(w1 * 1e3, 2),
                                  "k4": round(w4 * 1e3, 2)},
           "rows": rows}
    with open(os.path.join(REPO, "K_FUSIONS_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote K_FUSIONS_r05.json")


if __name__ == "__main__":
    main()
