"""Material-type BSDF dispatch as branchless masked selection.

The reference dispatches with an if/elseif chain per ray
(src/trace.jl:692-966). On a TPU wavefront every lane carries its own
material type, so each lobe is evaluated for the whole batch (cheap VPU
math) and the per-lane result selected by type mask. `subsurface` aliases
to the refractive lobes (src/trace.jl:733-741) and `volumetric` is
delta-passthrough (src/trace.jl:771-773, 865-867).

Rough (roughness != 0) lobes live in eval/sample/pdf_bsdfcos; delta
(roughness == 0) lobes in eval/sample/pdf_delta — the roughness gate at
the top of each reference function is reproduced with a where().
"""

from __future__ import annotations

import jax.numpy as jnp

from julia_raytracer_tpu.ops import bsdf
from julia_raytracer_tpu.scene.types import MaterialType

_ZERO3 = 0.0


def _sel(mtype, pairs, default_shape, width=3):
    """Masked select: pairs = [(MaterialType, value [..., W])]."""
    out = jnp.zeros(default_shape if width == 3 else default_shape[:-1], jnp.float32)
    for t, val in pairs:
        mask = mtype == t
        out = jnp.where(mask[..., None] if width == 3 else mask, val, out)
    return out


def eval_bsdfcos(material, normal, outgoing, incoming):
    """src/trace.jl:692-755 (roughness == 0 -> black)."""
    c, r = material.color, material.roughness
    pairs = [
        (MaterialType.MATTE, bsdf.eval_matte(c, normal, outgoing, incoming)),
        (
            MaterialType.GLOSSY,
            bsdf.eval_glossy(c, material.ior, r, normal, outgoing, incoming),
        ),
        (MaterialType.REFLECTIVE, bsdf.eval_reflective(c, r, normal, outgoing, incoming)),
        (
            MaterialType.TRANSPARENT,
            bsdf.eval_transparent(c, material.ior, r, normal, outgoing, incoming),
        ),
        (
            MaterialType.REFRACTIVE,
            bsdf.eval_refractive(c, material.ior, r, normal, outgoing, incoming),
        ),
        (
            MaterialType.SUBSURFACE,
            bsdf.eval_refractive(c, material.ior, r, normal, outgoing, incoming),
        ),
        (
            MaterialType.GLTFPBR,
            bsdf.eval_gltfpbr(
                c, material.ior, r, material.metallic, normal, outgoing, incoming
            ),
        ),
    ]
    out = _sel(material.type, pairs, c.shape)
    return jnp.where((r == 0.0)[..., None], 0.0, out)


def sample_bsdfcos(material, normal, outgoing, rnl, rn):
    """src/trace.jl:780-849. Returns zero direction where roughness == 0."""
    c, r = material.color, material.roughness
    pairs = [
        (MaterialType.MATTE, bsdf.sample_matte(c, normal, outgoing, rn)),
        (
            MaterialType.GLOSSY,
            bsdf.sample_glossy(c, material.ior, r, normal, outgoing, rnl, rn),
        ),
        (MaterialType.REFLECTIVE, bsdf.sample_reflective(c, r, normal, outgoing, rn)),
        (
            MaterialType.TRANSPARENT,
            bsdf.sample_transparent(c, material.ior, r, normal, outgoing, rnl, rn),
        ),
        (
            MaterialType.REFRACTIVE,
            bsdf.sample_refractive(c, material.ior, r, normal, outgoing, rnl, rn),
        ),
        (
            MaterialType.SUBSURFACE,
            bsdf.sample_refractive(c, material.ior, r, normal, outgoing, rnl, rn),
        ),
        (
            MaterialType.GLTFPBR,
            bsdf.sample_gltfpbr(
                c, material.ior, r, material.metallic, normal, outgoing, rnl, rn
            ),
        ),
    ]
    out = _sel(material.type, pairs, c.shape)
    return jnp.where((r == 0.0)[..., None], 0.0, out)


def sample_bsdfcos_pdf(material, normal, outgoing, incoming):
    """src/trace.jl:874-943."""
    c, r = material.color, material.roughness
    pairs = [
        (MaterialType.MATTE, bsdf.sample_matte_pdf(c, normal, outgoing, incoming)),
        (
            MaterialType.GLOSSY,
            bsdf.sample_glossy_pdf(c, material.ior, r, normal, outgoing, incoming),
        ),
        (
            MaterialType.REFLECTIVE,
            bsdf.sample_reflective_pdf(c, r, normal, outgoing, incoming),
        ),
        (
            MaterialType.TRANSPARENT,
            bsdf.sample_transparent_pdf(c, material.ior, r, normal, outgoing, incoming),
        ),
        (
            MaterialType.REFRACTIVE,
            bsdf.sample_refractive_pdf(c, material.ior, r, normal, outgoing, incoming),
        ),
        (
            MaterialType.SUBSURFACE,
            bsdf.sample_refractive_pdf(c, material.ior, r, normal, outgoing, incoming),
        ),
        (
            MaterialType.GLTFPBR,
            bsdf.sample_gltfpbr_pdf(
                c, material.ior, r, material.metallic, normal, outgoing, incoming
            ),
        ),
    ]
    out = _sel(material.type, pairs, c.shape, width=1)
    return jnp.where(r == 0.0, 0.0, out)


def eval_delta(material, normal, outgoing, incoming):
    """src/trace.jl:757-778 (roughness != 0 -> black)."""
    c = material.color
    pairs = [
        (MaterialType.REFLECTIVE, bsdf.eval_reflective_delta(c, normal, outgoing, incoming)),
        (
            MaterialType.TRANSPARENT,
            bsdf.eval_transparent_delta(c, material.ior, normal, outgoing, incoming),
        ),
        (
            MaterialType.REFRACTIVE,
            bsdf.eval_refractive_delta(c, material.ior, normal, outgoing, incoming),
        ),
        (MaterialType.VOLUMETRIC, bsdf.eval_passthrough(c, normal, outgoing, incoming)),
    ]
    out = _sel(material.type, pairs, c.shape)
    return jnp.where((material.roughness != 0.0)[..., None], 0.0, out)


def sample_delta(material, normal, outgoing, rnl):
    """src/trace.jl:851-872."""
    c = material.color
    pairs = [
        (MaterialType.REFLECTIVE, bsdf.sample_reflective_delta(c, normal, outgoing)),
        (
            MaterialType.TRANSPARENT,
            bsdf.sample_transparent_delta(c, material.ior, normal, outgoing, rnl),
        ),
        (
            MaterialType.REFRACTIVE,
            bsdf.sample_refractive_delta(c, material.ior, normal, outgoing, rnl),
        ),
        (MaterialType.VOLUMETRIC, bsdf.sample_passthrough(c, normal, outgoing)),
    ]
    out = _sel(material.type, pairs, c.shape)
    return jnp.where((material.roughness != 0.0)[..., None], 0.0, out)


def sample_delta_pdf(material, normal, outgoing, incoming):
    """src/trace.jl:945-966."""
    c = material.color
    pairs = [
        (
            MaterialType.REFLECTIVE,
            bsdf.sample_reflective_delta_pdf(c, normal, outgoing, incoming),
        ),
        (
            MaterialType.TRANSPARENT,
            bsdf.sample_transparent_delta_pdf(c, material.ior, normal, outgoing, incoming),
        ),
        (
            MaterialType.REFRACTIVE,
            bsdf.sample_refractive_delta_pdf(c, material.ior, normal, outgoing, incoming),
        ),
        (
            MaterialType.VOLUMETRIC,
            bsdf.sample_passthrough_pdf(c, normal, outgoing, incoming),
        ),
    ]
    out = _sel(material.type, pairs, c.shape, width=1)
    return jnp.where(material.roughness != 0.0, 0.0, out)


# ---------------------------------------------------------------------------
# Volume scattering (src/trace.jl:1086-1112)
# ---------------------------------------------------------------------------


def eval_scattering(vol_scattering, vol_density, vol_anisotropy, outgoing, incoming):
    """scattering * density * phase (src/trace.jl:1086-1093)."""
    has = jnp.sum(jnp.abs(vol_density), axis=-1) > 0
    phase = bsdf.eval_phasefunction(vol_anisotropy, outgoing, incoming)
    return jnp.where(
        has[..., None], vol_scattering * vol_density * phase[..., None], 0.0
    )


def sample_scattering(vol_density, vol_anisotropy, outgoing, rn):
    """src/trace.jl:1095-1103."""
    has = jnp.sum(jnp.abs(vol_density), axis=-1) > 0
    incoming = bsdf.sample_phasefunction(vol_anisotropy, outgoing, rn)
    return jnp.where(has[..., None], incoming, 0.0)


def sample_scattering_pdf(vol_density, vol_anisotropy, outgoing, incoming):
    """src/trace.jl:1105-1112."""
    has = jnp.sum(jnp.abs(vol_density), axis=-1) > 0
    return jnp.where(
        has, bsdf.sample_phasefunction_pdf(vol_anisotropy, outgoing, incoming), 0.0
    )
