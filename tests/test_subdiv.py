"""Catmull-Clark subdivision tessellation (beyond reference — the
reference never loads subdivs, src/sceneio.jl:73). Validation ground
truth: the corpus ships Yocto's own pre-tessellated PLYs next to the
control-cage OBJs, so our tessellation of the cage must reproduce them."""

import os

import numpy as np
import pytest

from julia_raytracer_tpu.scene.objio import load_obj_cage
from julia_raytracer_tpu.scene.subdiv import (
    catmull_clark, tessellate_subdiv, vertex_normals,
)

SUBDIVS = "/root/reference/scenes/shapes2/subdivs"
SHAPES = "/root/reference/scenes/shapes2/shapes"


def _chamfer(a, b, k=800, seed=0):
    rng = np.random.default_rng(seed)
    ia = rng.choice(len(a), min(k, len(a)), replace=False)
    d_ab = np.sqrt(((a[ia, None, :] - b[None, :, :]) ** 2).sum(-1)).min(1)
    ib = rng.choice(len(b), min(k, len(b)), replace=False)
    d_ba = np.sqrt(((b[ib, None, :] - a[None, :, :]) ** 2).sum(-1)).min(1)
    diag = float(np.linalg.norm(b.max(0) - b.min(0)))
    return max(d_ab.max(), d_ba.max()) / diag


def test_cube_level1_topology():
    pos, faces, ns, uvs, vtf = load_obj_cage(f"{SUBDIVS}/cubesubdiv.obj")
    assert faces.shape == (6, 4) and (ns == 4).all()
    p1, q1 = catmull_clark(pos, faces, ns, 1)
    # closed cube: 8 updated + 6 face + 12 edge verts, 24 quads
    assert p1.shape == (26, 3)
    assert q1.shape == (24, 4)
    # watertight: every edge shared by exactly 2 quads
    e = np.sort(
        np.stack([q1, np.roll(q1, -1, axis=1)], axis=-1).reshape(-1, 2),
        axis=1,
    )
    _, cnt = np.unique(e, axis=0, return_counts=True)
    assert (cnt == 2).all()


def test_cube_matches_yocto_pretessellation():
    """4 levels of our Catmull-Clark must reproduce Yocto's exported
    cubesubdiv.ply point set essentially bit-exactly (closed mesh — the
    interior rules are the whole story)."""
    from julia_raytracer_tpu.scene.loader import load_shape

    pos, quads, _, _ = tessellate_subdiv(f"{SUBDIVS}/cubesubdiv.obj", 4, True)
    ref = np.asarray(load_shape(f"{SHAPES}/cubesubdiv.ply").positions)
    assert len(quads) == 6 * 4**4
    assert _chamfer(pos, ref) < 1e-5


def test_suzanne_close_to_yocto_pretessellation():
    """Suzanne's cage has boundary holes (45 boundary edges); the
    corpus PLY appears to use a slightly different boundary variant, so
    the match is near-exact except within a ~1%-of-diagonal band at the
    holes."""
    from julia_raytracer_tpu.scene.loader import load_shape

    pos, quads, nrm, _ = tessellate_subdiv(
        f"{SUBDIVS}/suzannesubdiv.obj", 2, True
    )
    ref = np.asarray(load_shape(f"{SHAPES}/suzannesubdiv.ply").positions)
    assert _chamfer(pos, ref) < 0.012
    assert nrm is not None and np.allclose(
        np.linalg.norm(nrm, axis=1), 1.0, atol=1e-4
    )


def test_loader_tessellates_on_optin(monkeypatch):
    from julia_raytracer_tpu.scene.loader import load_scene

    monkeypatch.setenv("JRT_TESSELLATE", "1")
    scene = load_scene("/root/reference/scenes/shapes2/shapes2.json")
    sh = scene.shapes[3]  # cubesubdiv
    assert len(sh.quads) == 6 * 4**4
    assert len(sh.normals) == len(sh.positions)
    # displacedsubdiv: both blobs stripped -> placeholder survives
    monkeypatch.delenv("JRT_TESSELLATE")
    scene2 = load_scene("/root/reference/scenes/shapes2/shapes2.json")
    # default path: pre-tessellated PLY untouched (reference behavior)
    assert len(scene2.shapes[3].positions) == 1734


def test_cube_fvar_texcoords_match_yocto_export():
    """Face-varying texcoords subdivide as their own mesh and merge by
    (pos, vt) seam splitting — reproducing Yocto's exported vertex
    split EXACTLY: 1538 geometric verts -> 1734 split verts, and every
    (position, uv) pair in the export appears in ours."""
    from julia_raytracer_tpu.scene.loader import load_shape

    pos, quads, nrm, tc = tessellate_subdiv(f"{SUBDIVS}/cubesubdiv.obj", 4, True)
    assert tc is not None
    assert len(pos) == 1734  # seam-split count matches the export
    ref = load_shape(f"{SHAPES}/cubesubdiv.ply")
    rp = np.asarray(ref.positions)
    rtc = np.asarray(ref.texcoords)
    # association check, robust to 1e-7 position noise: every geometric
    # position must carry exactly the same SET of uvs as the export
    from collections import defaultdict

    def k3(v):
        return tuple(np.round(v, 5))

    ours = defaultdict(set)
    refs = defaultdict(set)
    for i in range(len(pos)):
        ours[k3(pos[i])].add(k3(tc[i]))
    for i in range(len(rp)):
        refs[k3(rp[i])].add(k3(rtc[i]))
    assert ours == refs


def test_displacement_moves_surface():
    from julia_raytracer_tpu.scene.types import TextureData

    flat = TextureData(
        width=2, height=2, linear=True,
        pixels=np.full((4, 4), 1.0, np.float32),
    )
    p0, q0, n0, t0 = tessellate_subdiv(f"{SUBDIVS}/cubesubdiv.obj", 2, True)
    p1, q1, n1, t1 = tessellate_subdiv(
        f"{SUBDIVS}/cubesubdiv.obj", 2, True,
        displacement=0.05, disp_tex=flat,
    )
    d = np.linalg.norm(p1 - p0, axis=1)
    np.testing.assert_allclose(d, 0.05, atol=1e-5)  # uniform outward push
