"""Minimal repro / cap-lift experiment for the round-2 instanced-dispatch
fault (VERDICT r2 item 4).

Round-2 symptom: instanced intersector dispatches above ~64 ray blocks
INSIDE the integrator program faulted the axon v5e worker (ecosys at
384px+), while the same intersect standalone was fine; worked around by
a 32k-lane chunk cap in renderer.trace_samples.

Round-3 hypothesis (this experiment tests it): the intersector tables
were closure-captured jax.Arrays, which lower as inline program
literals. The ecosys instanced+hybrid tables are ~100 MB-1 GB; every
sample-kernel variant embedded them, producing near-protobuf-limit
executables (kitchen sup=32 demonstrably EXCEEDED the 2 GiB limit).
Oversized programs + per-executable HBM constants are exactly the class
of thing that kills a worker at larger dispatch sizes. The tables now
ride as jit arguments (commit "Thread Pallas intersector tables...").

Runs ecosys one-sample renders at increasing chunk caps in SUBPROCESSES
(a worker fault must not kill the harness) and reports per-cap status.

Usage: python tools/repro_inst_fault.py [resolutions...]  (default 480)
Writes tools/../INST_FAULT_r03.md with the verdict.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join({repo!r}, ".jax_cache"))
from julia_raytracer_tpu.render.renderer import Params, Renderer, make_trace_state
from julia_raytracer_tpu.scene.loader import load_scene

res = {res}
scene = load_scene("/root/reference/scenes/ecosys/ecosys.json")
params = Params(resolution=res, samples=1, batch=1, bounces=4, sampler="path",
                scene="/root/reference/scenes/ecosys/ecosys.json")
r = Renderer(scene, params)
state = make_trace_state(scene, params)
t0 = time.time()
state = r.trace_samples(state)
from julia_raytracer_tpu.utils.timing import fence
fence(state.image)
dt = time.time() - t0
import numpy as np
# slice to the real pixel count: trace_samples pads the buffers to a
# chunk multiple, and a mean over the padded rows would differ by
# exactly n_pixels/n_padded between cap sizes
img = np.asarray(state.image)[: state.n_pixels]
print(f"RESULT ok dt={{dt:.1f}} finite={{bool(np.isfinite(img).all())}} "
      f"mean={{float(img[:, :3].mean()):.5f}}")
"""


def main() -> None:
    resolutions = [int(a) for a in sys.argv[1:]] or [480]
    results = []
    for res in resolutions:
        # blocks = ceil(res * res/2 / 1024) per dispatch at cap lanes
        for cap_log2 in (15, 16, 17, 18, 20):
            cap = 1 << cap_log2
            n_px = res * (res // 2)
            lanes = min(cap, n_px)
            blocks = -(-lanes // 1024)
            env = {
                **os.environ,
                "JRT_INST_CHUNK": str(cap),
                "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, ".jax_cache"),
            }
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, "-u", "-c",
                     CHILD.format(repo=REPO, res=res)],
                    env=env, capture_output=True, text=True, timeout=2400,
                )
                out_all = p.stdout + p.stderr
                ok = p.returncode == 0 and "RESULT ok" in out_all
                status = "ok" if ok else "FAULT"
                lines = [l for l in out_all.strip().splitlines()
                         if "RESULT ok" in l] or out_all.strip().splitlines()
                tail = lines[-1] if lines else ""
            except subprocess.TimeoutExpired:
                status, tail = "TIMEOUT", ""
            rec = {
                "resolution": res,
                "chunk_cap": cap,
                "blocks_per_dispatch": blocks,
                "status": status,
                "wall_s": round(time.time() - t0, 1),
                "tail": tail[-240:],
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
            if status != "ok":
                break  # no point going bigger once it faults
    out = os.path.join(REPO, "INST_FAULT_r03.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
