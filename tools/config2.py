"""BASELINE config #2 at EXACT spec: shapes1 + materials1, 512x512,
64 spp, path+MIS, 8 bounces (BASELINE.md table row 2; the golden ladder
runs these scenes at 256 px / 48 spp, VERDICT r3 item 7).

Writes CONFIG2_r04.json with wall-clock, Mpaths/s, and MSE vs the
reference golden (downscaled to 512 from the 1280-px golden, same
protocol as tools/golden_check.py).

Usage: python tools/config2.py [--json CONFIG2_r04.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def run(name: str) -> dict:
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
    from julia_raytracer_tpu.utils.color import rgb_to_srgb
    from julia_raytracer_tpu.utils.timing import fence

    scene_path = f"/root/reference/scenes/{name}/{name}.json"
    scene = load_scene(scene_path)
    params = Params(
        scene=scene_path, resolution=512, samples=64, batch=16,
        bounces=8, sampler="path",
    )
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    t0 = time.time()
    while state.samples < params.samples:
        state = r.trace_samples(state)
    fence(state.image)
    wall = time.time() - t0
    img = r.get_image(state)
    ours = np.clip(np.asarray(rgb_to_srgb(img))[..., :3], 0, 1)

    gold_img = Image.open(
        f"/root/reference/images/{name}_path.png").convert("RGB")
    gold = np.asarray(
        gold_img.resize((ours.shape[1], ours.shape[0]), Image.BOX),
        np.float32) / 255.0
    mse = float(((ours - gold) ** 2).mean())
    paths = state.n_pixels * 64
    return {
        "scene": name, "resolution": 512, "spp": 64, "bounces": 8,
        "sampler": "path", "wall_s": round(wall, 2),
        "mpaths_per_s": round(paths / wall / 1e6, 3),
        "mse_vs_golden": round(mse, 5),
        "note": "wall includes first-batch compile when the cache is "
                "cold; MSE vs the 1280px reference golden box-downscaled",
    }


def main():
    out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv \
        else "CONFIG2_r04.json"
    results = {}
    for name in ("shapes1", "materials1"):
        print(f"config2: {name}...", flush=True)
        results[name] = run(name)
        print(json.dumps(results[name]), flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
