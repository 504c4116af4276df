"""TPU throughput profiling: isolate where sample time goes.

Usage: python tools/profile_tpu.py [scene] [resolution]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from julia_raytracer_tpu.ops.camera import sample_camera
from julia_raytracer_tpu.render.integrator import (
    TraceOptions, build_intersector, make_intersect, trace_wavefront,
)
from julia_raytracer_tpu.render.renderer import Params, Renderer, make_trace_state
from julia_raytracer_tpu.scene.loader import load_scene
from julia_raytracer_tpu.utils import rng as rng_mod


def timeit(fn, *args, n=5):
    """Chained timing: each iteration's first argument is perturbed by a
    zero-scaled function of the previous output, so the tail fence
    provably waits for ALL n dispatches (advisor r3: an unchained loop
    under-reports by up to n x if the runtime does not drain FIFO)."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.utils.timing import fence

    out = fence(fn(*args))
    lead = jax.tree.leaves(out)[0]
    probe = (lead.reshape(-1)[0] * 0.0).astype(args[0].dtype)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(args[0] + probe, *args[1:])
        probe = (jax.tree.leaves(out)[0].reshape(-1)[0] * 0.0).astype(
            args[0].dtype)
    fence(out)
    return (time.perf_counter() - t0) / n


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/scenes/cornellbox/cornellbox.json"
    )
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    scene = load_scene(scene_path)
    params = Params(resolution=res, samples=1, bounces=8, sampler="path")
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    n = state.n_pixels
    print(f"device={jax.devices()[0]}  lanes={n}  prims={r.config.n_prims}")

    pix = jnp.arange(n, dtype=jnp.int32)
    rng = rng_mod.seed_state(pix, jnp.int32(0), 0)
    puv, rng = rng_mod.rand2f(rng)
    luv, rng = rng_mod.rand2f(rng)
    ij = jnp.stack([pix % state.width, pix // state.width], axis=-1)
    ro, rd = sample_camera(r.cam_arrays, ij, (state.width, state.height), puv, luv, False)
    ro, rd = jax.block_until_ready((ro, rd))

    # 1. pure intersect (jnp vs prebuilt/pallas). The gather-BVH jnp path
    # is minutes-per-call at 1M+ prims — skip it there.
    tmin = jnp.full(n, 1e-4)
    tmax = jnp.full(n, 3.4e38)
    if r.config.n_prims <= 300_000 and not os.environ.get("PROF_SKIP_JNP"):
        intersect = make_intersect(r.dscene, r.config)
        isec_j = jax.jit(lambda a, b: intersect(a, b, tmin, tmax))
        t = timeit(isec_j, ro, rd)
        print(f"intersect jnp    : {t*1e3:8.2f} ms  -> {n/t/1e6:8.1f} Mrays/s")
    if getattr(r.intersect, "wants_tables", False):
        # pass tables as jit arguments (closure capture would inline the
        # whole table into the program as a literal)
        isec_p = jax.jit(
            lambda a, b, tb: r.intersect(a, b, tmin, tmax, tables=tb)
        )
        isec_p = partial(isec_p, tb=r.intersect.tables)
    else:
        isec_p = jax.jit(lambda a, b: r.intersect(a, b, tmin, tmax))
    t = timeit(isec_p, ro, rd)
    print(f"intersect fast   : {t*1e3:8.2f} ms  -> {n/t/1e6:8.1f} Mrays/s", flush=True)

    # 1a. BOUNCE intersect: incoherent rays scattered from the primary
    # hits (uniform hemisphere around the geometric normal), sorted with
    # the integrator's octant+morton key — the dominant cost of
    # kitchen-class sample time (~85% intersector, mostly bounces)
    h0 = jax.block_until_ready(isec_p(ro, rd))
    import numpy as np

    from julia_raytracer_tpu.render.integrator import _sort_key

    hitm = np.asarray(h0.hit)
    pos = np.asarray(h0.position)
    gn = np.asarray(h0.gnormal)
    rngnp = np.random.default_rng(0)
    d2 = rngnp.normal(size=pos.shape).astype(np.float32)
    d2 /= np.maximum(np.linalg.norm(d2, axis=1, keepdims=True), 1e-9)
    flip = (d2 * gn).sum(1) < 0
    d2[flip] = -d2[flip]
    o2 = np.where(hitm[:, None], pos + gn * 1e-3, np.asarray(ro))
    d2 = np.where(hitm[:, None], d2, np.asarray(rd))
    pv_flat = np.asarray(r.config.host_prim_verts
                         if r.config.host_prim_verts is not None
                         else r.dscene.prim_verts).reshape(-1, 3)
    vmin, vmax = jnp.asarray(pv_flat.min(0)), jnp.asarray(pv_flat.max(0))
    o2j, d2j = jnp.asarray(o2), jnp.asarray(d2)
    perm = jnp.argsort(_sort_key(o2j, d2j, vmin, vmax))
    o2s, d2s = jax.block_until_ready((o2j[perm], d2j[perm]))
    t = timeit(isec_p, o2s, d2s)
    print(f"bounce isect sort: {t*1e3:8.2f} ms  -> {n/t/1e6:8.1f} Mrays/s",
          flush=True)
    if os.environ.get("PROF_ONLY") == "isec":
        return

    # 1b. shade-once ablation: specialized surface eval + dispatch
    cfg = r.config

    def shade_once(dscene, prim, u, v, gn):
        from julia_raytracer_tpu.ops import eval as eval_ops
        from julia_raytracer_tpu.render import dispatch

        inst = dscene.prim_instance[prim]
        vidx = dscene.prim_vidx[prim]
        flags = dscene.prim_flags[prim]
        if cfg.has_texcoords:
            texcoord = eval_ops.eval_texcoord(dscene, vidx, flags, u, v)
        else:
            texcoord = jnp.stack([u, v], axis=-1)
        shp_color = jnp.ones(u.shape + (4,), jnp.float32)
        material = eval_ops.eval_material(dscene, inst, texcoord, shp_color)
        mid = dscene.inst_material[inst]
        ntex = dscene.materials.normal_tex[mid]
        normal = eval_ops.eval_shading_normal(
            dscene, gn, dscene.prim_verts[prim], vidx, inst, flags, u, v, -rd,
            material.type, ntex,
            texcoord, with_normalmap=cfg.has_normal_maps,
            with_vertex_normals=cfg.has_vertex_normals,
            refractive_present=4 in cfg.present_types,
        )
        f = dispatch.eval_bsdfcos(material, normal, -rd, rd, present=cfg.present_types)
        pdf = dispatch.sample_bsdfcos_pdf(material, normal, -rd, rd, present=cfg.present_types)
        smp = dispatch.sample_bsdfcos(
            material, normal, -rd, u, jnp.stack([u, v], -1), present=cfg.present_types
        )
        return normal, f, pdf, smp

    t = timeit(jax.jit(shade_once), r.dscene, h0.prim, h0.u, h0.v, h0.gnormal)
    print(f"shade+dispatch   : {t*1e3:8.2f} ms", flush=True)
    if os.environ.get("PROF_ONLY") == "shade":
        return

    # 2. full wavefront variants (prebuilt intersect)
    for label, opts in [
        ("path pdf_extra=2", r.options),
        ("path pdf_extra=0", r.options._replace(light_pdf_extra_steps=0)),
        ("naive           ", r.options._replace(sampler="naive")),
    ]:
        f = jax.jit(
            lambda dsc, a, b, s, o=opts: trace_wavefront(
                dsc, r.config, o, a, b, s, intersect=r.intersect
            )[0]
        )
        t = timeit(f, r.dscene, ro, rd, rng)
        print(f"trace {label}: {t*1e3:8.2f} ms  -> {n/t/1e6:8.2f} Mpaths/s")

    # 3. renderer kernel (with accumulation)
    kern = r._sample_kernel(state.width, state.height, n)
    img, alb, nrm, hits = state.image, state.albedo, state.normal, state.hits
    out = kern(r.dscene, r.cam_arrays, img, alb, nrm, hits, jnp.int32(0), jnp.int32(0))
    jax.block_until_ready(out)
    img, alb, nrm, hits = out
    t0 = time.perf_counter()
    N = 5
    for i in range(N):
        img, alb, nrm, hits = kern(
            r.dscene, r.cam_arrays, img, alb, nrm, hits, jnp.int32(0), jnp.int32(i + 1)
        )
    jax.block_until_ready(img)
    t = (time.perf_counter() - t0) / N
    print(f"full sample kernel : {t*1e3:8.2f} ms  -> {n/t/1e6:8.2f} Mpaths/s")


if __name__ == "__main__":
    main()
