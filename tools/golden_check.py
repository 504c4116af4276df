"""Golden-image validation harness: render reference scenes and compare
statistically against /root/reference/images (the reference's only test
artifact — SURVEY §4). Comparisons are tolerance-based: the reference's
global-rand() renders are non-reproducible, golden images are 512 spp,
and env-lit scenes legitimately differ (we load HDR correctly; the
reference clamps it, report §Results).

Tolerance ladder (documented per VERDICT r1 #6):
  0.006-0.015  clean scenes, moderate spp — noise + estimator variance
  0.030        scenes with one stripped asset (shape or texture blob in
               the corpus is absent; loader substitutes an empty shape /
               mid-gray texture, a REAL image difference, flagged)
  <= 0.030     ceiling for every scene since round 4 (the weak tail was
               raised to 48-64 spp once full-frame dispatch got cheap);
               wrong lighting/geometry is >= 0.1 MSE in practice.
               Sole exception: ecosys at 0.040 (two stripped terrain
               shapes put a ~0.038 geometry floor under its MSE)

env_compat scenes: the reference's HDR loader is broken ("#todo fix
wrong values", src/scene.jl:166-171 — Julia `load` returns values
CLAMPED to [0,1]), so goldens of scenes whose env HDR carries real
dynamic range were rendered with a clamped sky. Measured on livingroom1
(env mean 8.2, every texel > 1): our correct-HDR render scores MSE
0.085 against the golden, and 0.0156 once the env is clamped to emulate
the reference loader. For those scenes the harness clamps the env
texels before rendering — a like-for-like comparison, flagged in the
output; the CLI keeps loading HDR correctly.

Usage:
  python tools/golden_check.py [scene ...]     # default: fast tier
  python tools/golden_check.py --all           # all 19 (slow; TPU)
  python tools/golden_check.py --json OUT ...  # write a JSON artifact
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

# name: (resolution, spp, bounces, mse_tolerance, time_budget_s, flags)
#
# time_budget_s gates WALL TIME as well as MSE (VERDICT r4 item 1: a
# 7.6x features1 perf regression sailed through an MSE-only table).
# Budgets are ~3x a healthy-session render (r04 sweep times; features1
# from the r05 re-measure — its r04 348 s was a tunnel stall, not code:
# same scene measured 26-44 s across warm/cold/regroup/worklist in r05).
# 3x absorbs tunnel variance between sessions; a stall- or
# default-regression-class slowdown (>3x) FAILS the table.
SCENES = {
    "cornellbox": (128, 64, 8, 0.006, 30, ""),
    "materials1": (256, 48, 8, 0.006, 70, ""),
    "materials2": (256, 48, 8, 0.010, 80, ""),
    "materials4": (256, 48, 8, 0.012, 85, ""),
    "shapes1": (256, 48, 8, 0.012, 70, ""),
    "shapes2": (256, 32, 8, 0.030, 45, "missing shape: displacedsubdiv"),
    "features1": (192, 32, 8, 0.015, 120, ""),
    "features2": (192, 32, 8, 0.030, 45, "missing shapes: hairball, displacedsubdiv"),
    # coffee healthy warm render measured 26.6 s this era (round 5);
    # the old 50 s budget was < 2x that and tripped on ordinary tunnel
    # variance (26.6 / 54.5 / 59.5 across same-code runs) — 80 ≈ 3x
    # healthy per the rule above
    "coffee": (192, 32, 8, 0.015, 80, ""),
    "staircase1": (160, 48, 8, 0.030, 45, "3 placeholder textures"),
    "staircase2": (200, 32, 8, 0.030, 90, ""),
    "classroom": (192, 256, 8, 0.012, 2200, "converges monotonically to golden: MSE 0.0050 @256spp, 0.0028 @512 (CONVERGENCE_r03.json)"),
    "livingroom1": (192, 48, 8, 0.030, 120, "1 placeholder texture; env_compat"),
    "livingroom2": (160, 64, 6, 0.030, 80, "1 placeholder texture + 1 missing shape"),
    "livingroom3": (160, 64, 6, 0.030, 70, "1 placeholder texture"),
    "bathroom1": (160, 64, 6, 0.030, 70, "3 placeholder textures"),
    "bathroom2": (160, 64, 6, 0.030, 80, "1 placeholder texture + 1 missing shape"),
    "kitchen": (160, 256, 8, 0.012, 4900, "1 placeholder texture; converges monotonically to golden: MSE 0.0065 @256spp, 0.0044 @512 (CONVERGENCE_r03.json)"),
    # ecosys floor is the 2 stripped terrain shapes (REAL missing
    # geometry, unmaskable): MSE converges 0.0387 @32spp -> 0.0379
    # @48spp — geometry-floored, not noise-floored. The only tol > 0.03.
    "ecosys": (160, 48, 4, 0.040, 400, "2 missing shapes"),
}

FAST = [
    "cornellbox", "materials1", "shapes1", "staircase2", "materials4",
    "features1", "bathroom1",
]


def placeholder_mask(r, scene, width, height):
    """[H, W] bool mask of pixels whose PRIMARY hit uses a material that
    references a placeholder (stripped-blob) texture, dilated 2 px.
    Masking these out of the MSE measures what we can actually compare —
    the placeholder is a REAL image difference the reference renders with
    the true texture — instead of absorbing it in a fat tolerance
    (VERDICT r2 item 6a). Indirect tinting from placeholder surfaces
    remains in the metric (small, and honest to keep)."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.camera import sample_camera

    ph_tex = {i for i, t in enumerate(scene.textures) if t.placeholder}
    if not ph_tex:
        return None
    tex_fields = (
        "emission_tex", "color_tex", "roughness_tex", "scattering_tex",
        "normal_tex",
    )
    ph_mats = {
        i for i, m in enumerate(scene.materials)
        if any(getattr(m, k) in ph_tex for k in tex_fields)
    }
    if not ph_mats:
        return None
    n = width * height
    pix = jnp.arange(n, dtype=jnp.int32)
    ij = jnp.stack([pix % width, pix // width], axis=-1)
    half = jnp.full((n, 2), 0.5, jnp.float32)
    ro, rd = sample_camera(r.cam_arrays, ij, (width, height), half, half, False)
    h = r.intersect(ro, rd, jnp.full(n, 1e-4), jnp.full(n, 3.4e38))
    inst_mat = np.asarray(r.dscene.inst_material)
    mat = inst_mat[np.clip(np.asarray(h.instance), 0, len(inst_mat) - 1)]
    mask = (np.isin(mat, list(ph_mats)) & np.asarray(h.hit)).reshape(height, width)
    # dilate 2 px (filter edges + bilinear taps straddling the boundary)
    d = mask
    for _ in range(2):
        p = np.pad(d, 1)
        d = (
            p[:-2, 1:-1] | p[2:, 1:-1] | p[1:-1, :-2] | p[1:-1, 2:] | d
        )
    return d


def run(name: str) -> tuple[float, float, bool, float]:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JRT_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        ),
    )
    from julia_raytracer_tpu.render.renderer import Params, Renderer, make_trace_state
    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.utils.color import rgb_to_srgb

    res, spp, bounces, tol, budget_s, flags = SCENES[name]
    scene_path = f"/root/reference/scenes/{name}/{name}.json"
    scene = load_scene(scene_path)
    if "env_compat" in flags:
        # emulate the reference's broken (clamping) HDR loader for the
        # env so the comparison is like-for-like (see module docstring)
        for env in scene.environments:
            if env.emission_tex >= 0:
                t = scene.textures[env.emission_tex]
                t.pixels = np.minimum(t.pixels, 1.0)
    params = Params(
        scene=scene_path, resolution=res, samples=spp, batch=min(spp, 32),
        bounces=bounces, sampler="path",
    )
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    t0 = time.time()
    # trace_samples advances ONE batch; loop to the full spp target
    # (a single call silently rendered min(spp, batch) samples — every
    # >32 spp scene in the r2 table was actually compared at 32)
    while state.samples < params.samples:
        state = r.trace_samples(state)
    img = r.get_image(state)
    dt = time.time() - t0
    ours = np.clip(np.asarray(rgb_to_srgb(img))[..., :3], 0, 1)

    gold_img = Image.open(f"/root/reference/images/{name}_path.png").convert("RGB")
    gold = (
        np.asarray(
            gold_img.resize((ours.shape[1], ours.shape[0]), Image.BOX), np.float32
        )
        / 255.0
    )
    err = (ours - gold) ** 2
    mask = placeholder_mask(r, scene, ours.shape[1], ours.shape[0])
    if mask is not None and mask.any() and not mask.all():
        keep = ~mask
        mse = float(err[keep].mean())
        mask_frac = float(mask.mean())
    else:
        mse = float(err.mean())
        mask_frac = 0.0
    return mse, dt, mse < tol and dt < budget_s, mask_frac


def main():
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if "--all" in args:
        names = list(SCENES)
    else:
        names = args or FAST
    results = []
    for name in names:
        try:
            mse, dt, ok, mask_frac = run(name)
        except Exception as e:  # keep the sweep going; report the wreck
            print(f"{name:12s}  ERROR {type(e).__name__}: {e}")
            results.append((name, float("nan"), 0.0, False, 0.0))
            continue
        flags = SCENES[name][5]
        results.append((name, mse, dt, ok, mask_frac))
        masked = f"  masked {mask_frac*100:.1f}%" if mask_frac else ""
        t_ok = dt < SCENES[name][4]
        print(
            f"{name:12s}  MSE {mse:8.5f}  tol {SCENES[name][3]:.3f}  "
            f"{'PASS' if ok else 'FAIL'}  ({dt:7.1f}s render, "
            f"budget {SCENES[name][4]}s{'' if t_ok else ' TIME-FAIL'})"
            f"{masked}" + (f"  [{flags}]" if flags else "")
        )
    failed = [n for n, _, _, ok, _ in results if not ok]
    print(f"\n{len(results) - len(failed)}/{len(results)} passed")
    if json_out:
        payload = {
            n: {
                "mse": None if np.isnan(m) else m,
                "tol": SCENES[n][3],
                "pass": ok,
                "render_s": round(dt, 1),
                "resolution": SCENES[n][0],
                "spp": SCENES[n][1],
                "time_budget_s": SCENES[n][4],
                "time_pass": dt < SCENES[n][4],
                "flags": SCENES[n][5],
                "masked_frac": round(mf, 4),
            }
            for n, m, dt, ok, mf in results
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {json_out}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
