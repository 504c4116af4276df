"""Probe the per-lane-count superlinearity that killed k-sample dispatch.

Round 5 measured a 4x-lane megakernel (JRT_SPP_K=4, 1M lanes) running
~12x SLOWER than 4 sequential 262k dispatches, with the device mostly
idle (PERF_r05 "Flagship status" item 4). Root cause unknown. This
probe separates the candidate axes:

  A. real megakernel, k=1, lanes grown via resolution
     (512 -> 262k, 724 -> 524k, 1024 -> 1M): is it LANE COUNT?
  B. real megakernel, 512px, k in {1,2,4} (the k-sample mechanism):
     is it the k-dispatch code path specifically?
  C. synthetic while_loop over [n, 46] f32 state with gathers into a
     small table (megakernel-shaped, no Pallas): is it XLA/axon infra?

Protocol: warm 1 dispatch (compile), then time `iters` chained
dispatches, fence once (utils/timing.fence; per-dispatch fences are
tunnel-dominated, memory: axon-tpu-measurement).

Usage: python tools/probe_lane_scaling.py [A|B|C ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))


def _fence(x):
    from julia_raytracer_tpu.utils.timing import fence

    fence(x)


def probe_A(resolutions=(512, 724, 1024), iters=8):
    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state,
    )
    from julia_raytracer_tpu.scene.loader import load_scene

    scene = load_scene("/root/reference/scenes/cornellbox/cornellbox.json")
    out = []
    for res in resolutions:
        params = Params(
            resolution=res, samples=1 + iters, bounces=8,
            sampler="path", batch=1,
        )
        r = Renderer(scene, params)
        state = make_trace_state(scene, params)
        t0 = time.time()
        state = r.trace_samples(state)
        _fence(state.image)
        compile_s = time.time() - t0
        r.params.batch = iters
        t0 = time.perf_counter()
        state = r.trace_samples(state)
        _fence(state.image)
        dt = time.perf_counter() - t0
        lanes = state.n_pixels
        row = {
            "res": res, "lanes": lanes,
            "ms_per_sample": round(dt / iters * 1e3, 2),
            "ms_per_mlane": round(dt / iters * 1e3 / (lanes / 2**20), 2),
            "compile_s": round(compile_s, 1),
        }
        print("A", json.dumps(row), flush=True)
        out.append(row)
    return out


def probe_B(ks=(1, 2, 4), iters=8):
    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state,
    )
    from julia_raytracer_tpu.scene.loader import load_scene

    scene = load_scene("/root/reference/scenes/cornellbox/cornellbox.json")
    out = []
    for k in ks:
        os.environ["JRT_SPP_K"] = str(k)
        params = Params(
            resolution=512, samples=k + iters * k, bounces=8,
            sampler="path", batch=k,
        )
        r = Renderer(scene, params)
        state = make_trace_state(scene, params)
        t0 = time.time()
        state = r.trace_samples(state)  # one k-dispatch
        _fence(state.image)
        compile_s = time.time() - t0
        r.params.batch = iters * k
        t0 = time.perf_counter()
        state = r.trace_samples(state)  # iters k-dispatches
        _fence(state.image)
        dt = time.perf_counter() - t0
        row = {
            "k": k, "lanes": 512 * 512 * k,
            "ms_per_sample": round(dt / (iters * k) * 1e3, 2),
            "ms_per_dispatch": round(dt / iters * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }
        print("B", json.dumps(row), flush=True)
        out.append(row)
    os.environ.pop("JRT_SPP_K", None)
    return out


def probe_C(sizes=(1 << 18, 1 << 19, 1 << 20), iters=16, planes=46):
    """Megakernel-shaped synthetic: while_loop(8) over [n, planes] state,
    each iteration a gather into a small table + elementwise mix."""
    table = jnp.arange(36 * 16, dtype=jnp.float32).reshape(36, 16) * 1e-3

    def make(n):
        @jax.jit
        def step(state, tbl):
            def body(c):
                i, s = c
                idx = (s[:, 0].astype(jnp.int32) & 31) % 36
                g = tbl[idx]  # [n, 16] gather
                s = s.at[:, :16].add(g * 1e-6)
                s = s * 0.999 + jnp.sin(s * 0.01) * 0.01
                return i + 1, s

            def cond(c):
                return c[0] < 8

            _, s = jax.lax.while_loop(cond, body, (0, state))
            return s

        return step

    out = []
    for n in sizes:
        state = jnp.ones((n, planes), jnp.float32)
        step = make(n)
        state = step(state, table)
        _fence(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state, table)
        _fence(state)
        dt = time.perf_counter() - t0
        row = {
            "lanes": n,
            "ms_per_iter": round(dt / iters * 1e3, 3),
            "ms_per_mlane": round(dt / iters * 1e3 / (n / 2**20), 3),
        }
        print("C", json.dumps(row), flush=True)
        out.append(row)
    return out


def main():
    which = sys.argv[1:] or ["C", "A", "B"]
    results = {}
    for w in which:
        results[w] = {"A": probe_A, "B": probe_B, "C": probe_C}[w]()
    with open(os.path.join(REPO, "LANE_SCALING_r05.json"), "w") as f:
        json.dump(
            {
                "platform": jax.devices()[0].platform,
                "note": __doc__.split("\n")[0],
                **results,
            },
            f, indent=1,
        )
    print("wrote LANE_SCALING_r05.json")


if __name__ == "__main__":
    main()
