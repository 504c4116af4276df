"""Host-side image IO: PNG (LDR, sRGB) and Radiance HDR (linear).

Replaces the reference's Images/FileIO usage (src/scene.jl:164-189,
src/sceneio.jl:585-611). Note the reference's HDR path is known-broken
(values clamped to [0,1], report §Results); we load HDR correctly.
"""

from __future__ import annotations

import numpy as np

from julia_raytracer_tpu.utils.color import float_to_byte, rgb_to_srgb


def load_png_rgba(path: str) -> np.ndarray:
    """PNG -> uint8 [H, W, 4] (RGBA)."""
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    return np.asarray(img, dtype=np.uint8)


def load_hdr_rgba(path: str) -> np.ndarray:
    """Radiance .hdr -> float32 [H, W, 4] (linear, alpha=1)."""
    import cv2

    bgr = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if bgr is None:
        raise IOError(f"failed to load HDR image: {path}")
    rgb = np.asarray(bgr, dtype=np.float32)[..., ::-1]
    alpha = np.ones(rgb.shape[:2] + (1,), dtype=np.float32)
    return np.concatenate([rgb, alpha], axis=-1)


def save_png(path: str, pixels: np.ndarray, linear: bool = True) -> None:
    """Save float [H, W, 4] to PNG; linear data is sRGB-encoded first.

    Mirrors save_image + to_srgb + clamp01nan (src/sceneio.jl:585-611).
    """
    from PIL import Image

    pix = np.asarray(pixels, dtype=np.float32)
    pix = np.where(np.isfinite(pix), pix, 0.0)
    if linear:
        pix = rgb_to_srgb(pix)
        pix = np.clip(pix, 0.0, 1.0)
        data = np.clip(np.rint(pix * 255.0), 0, 255).astype(np.uint8)
    else:
        data = np.asarray(float_to_byte(pix))
    Image.fromarray(data, mode="RGBA").save(path)
