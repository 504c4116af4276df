"""Golden-image validation harness: render reference scenes and compare
statistically against /root/reference/images (the reference's only test
artifact — SURVEY §4). Comparisons are tolerance-based: the reference's
global-rand() renders are non-reproducible, golden images are 512 spp,
and env-lit scenes legitimately differ (we load HDR correctly; the
reference clamps it, report §Results).

Usage: python tools/golden_check.py [scene ...]   (default: fast set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

SCENES = {
    # name: (resolution, spp, bounces, mse_tolerance)
    "cornellbox": (128, 64, 8, 0.006),
    "materials1": (256, 48, 8, 0.006),
    "shapes1": (256, 48, 8, 0.012),
    "staircase2": (200, 32, 8, 0.030),
    "materials4": (256, 48, 8, 0.012),
    "features1": (192, 32, 8, 0.015),
    "bathroom1": (160, 48, 6, 0.040),
}


def run(name: str) -> tuple[float, float, bool]:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    from julia_raytracer_tpu.render.renderer import Params, Renderer, make_trace_state
    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.utils.color import rgb_to_srgb

    res, spp, bounces, tol = SCENES[name]
    scene_path = f"/root/reference/scenes/{name}/{name}.json"
    scene = load_scene(scene_path)
    params = Params(
        scene=scene_path, resolution=res, samples=spp, batch=spp,
        bounces=bounces, sampler="path",
    )
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    t0 = time.time()
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
    mse = float(((ours - gold) ** 2).mean())
    return mse, dt, mse < tol


def main():
    names = sys.argv[1:] or list(SCENES)
    results = []
    for name in names:
        mse, dt, ok = run(name)
        results.append((name, mse, dt, ok))
        print(
            f"{name:12s}  MSE {mse:8.5f}  tol {SCENES[name][3]:.3f}  "
            f"{'PASS' if ok else 'FAIL'}  ({dt:6.1f}s render)"
        )
    failed = [n for n, _, _, ok in results if not ok]
    print(f"\n{len(results) - len(failed)}/{len(results)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
