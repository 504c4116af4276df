"""Scaling-efficiency harness (BASELINE config 5): rays/s vs device count.

Runs the sharded forward renderer on meshes of 1..N devices and reports
per-count throughput + scaling efficiency. On the single-chip dev box
use the virtual CPU mesh (numbers are only meaningful relative to each
other); on a pod slice it measures the real thing:

  SCALING_CPU=1 python tools/scaling_bench.py [scene.json] [resolution]

With SCALING_JSON=path, also writes a JSON artifact containing, per
device count: wall time, rays/s, speedup, AND the XLA cost-analysis
per-device FLOP fraction (compile-time, contention-free): on a
shared-core CPU proxy the wall clock cannot show real scaling, but the
compiled per-device program's FLOPs dropping as total/N proves the
sharding divides the work — the quantity that determines efficiency on
a real ICI mesh, where the forward pass has zero collectives.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# dev-box fallback: the host sitecustomize pins jax_platforms to the
# single-chip axon backend; SCALING_CPU=1 forces the virtual CPU mesh
if os.environ.get("SCALING_CPU"):
    # NOTE on the CPU proxy: the virtual devices SHARE the host's cores
    # (and one XLA-CPU device already multithreads over all of them), so
    # raw rays/s CANNOT scale with device count here. The meaningful
    # quantities on this proxy are (a) the sharded path compiling and
    # running at every mesh size and (b) the speedup vs the HARDWARE
    # BOUND min(n_devices, n_cores) — reported below as "of hw bound".
    # Real scaling numbers require a real multi-chip mesh.
    n = os.environ.get("SCALING_CPU_DEVICES", "8")
    if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        )
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from julia_raytracer_tpu.ops.camera import sample_camera
from julia_raytracer_tpu.parallel.mesh import make_mesh, shard_render_fn
from julia_raytracer_tpu.render.renderer import Params, Renderer, make_trace_state
from julia_raytracer_tpu.scene.loader import load_scene
from julia_raytracer_tpu.utils import rng as rng_mod


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/scenes/staircase2/staircase2.json"
    )
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    scene = load_scene(scene_path)
    params = Params(resolution=res, samples=1, bounces=8, sampler="path")
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    n = state.n_pixels
    print(f"scene={scene_path} rays={n} devices_avail={len(jax.devices())}")

    pix = jnp.arange(n, dtype=jnp.int32)
    rng = rng_mod.seed_state(pix, jnp.int32(0), 0)
    puv, rng = rng_mod.rand2f(rng)
    luv, rng = rng_mod.rand2f(rng)
    ij = jnp.stack([pix % state.width, pix // state.width], axis=-1)
    ro, rd = sample_camera(
        r.cam_arrays, ij, (state.width, state.height), puv, luv, False
    )

    counts = []
    d = 1
    while d <= len(jax.devices()):
        counts.append(d)
        d *= 2
    base = None
    base_flops = None
    rows = []
    for nd in counts:
        mesh = make_mesh(nd)
        render = shard_render_fn(mesh, r.dscene, r.config, r.options)
        # compile-time per-device cost: FLOPs of ONE device's program.
        # shard_map lowers to a per-device module; flops scaling as
        # total/N is the contention-free proof the work is divided.
        flops = None
        try:
            ca = (
                jax.jit(render)
                .lower(r.dscene, ro, rd, rng)
                .compile()
                .cost_analysis()
            )
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        out = render(r.dscene, ro, rd, rng)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = render(r.dscene, ro, rd, rng)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        rays_s = n / dt
        if base is None:
            base = rays_s
            base_flops = flops
        bound = min(nd, os.cpu_count() or nd) if os.environ.get("SCALING_CPU") else nd
        eff = rays_s / (base * bound)
        # parallel efficiency implied by the divided work: ideal would be
        # base_flops / nd per device; >= 1.0 means no redundant compute
        flop_eff = (
            (base_flops / nd) / flops if flops and base_flops else None
        )
        msg = (
            f"devices={nd:2d}  {dt*1e3:8.2f} ms  {rays_s/1e6:8.2f} Mrays/s  "
            f"speedup {rays_s/base:4.2f}x  {eff*100:5.1f}% of hw bound ({bound})"
        )
        if flop_eff is not None:
            msg += f"  per-dev flops {flops:.3e} ({flop_eff*100:.1f}% flop-eff)"
        print(msg)
        rows.append(
            {
                "devices": nd,
                "ms": dt * 1e3,
                "rays_per_s": rays_s,
                "speedup": rays_s / base,
                "per_device_flops": flops,
                "flop_efficiency": flop_eff,
            }
        )

    path = os.environ.get("SCALING_JSON")
    if path:
        with open(path, "w") as f:
            json.dump(
                {
                    "scene": scene_path,
                    "resolution": res,
                    "rays": n,
                    "proxy": "virtual CPU mesh (shared cores)"
                    if os.environ.get("SCALING_CPU")
                    else "hardware mesh",
                    "note": (
                        "flop_efficiency = (1-dev flops / N) / per-device "
                        "flops from XLA cost analysis; wall-clock speedup "
                        "on the CPU proxy is bounded by physical cores, "
                        "not devices"
                    ),
                    "results": rows,
                },
                f,
                indent=1,
            )
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
