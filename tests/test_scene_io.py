"""Scene/PLY/texture loading contract tests against the reference corpus."""

import numpy as np
import pytest

from julia_raytracer_tpu.scene.loader import find_camera, load_scene, load_shape
from julia_raytracer_tpu.scene.flatten import flatten_scene
from julia_raytracer_tpu.scene.types import MaterialType


def test_cornellbox_counts(cornellbox):
    s = cornellbox
    assert len(s.cameras) == 1
    assert len(s.shapes) == 8
    assert len(s.materials) == 8
    assert len(s.instances) == 8
    # 36 faces total across shapes (PLY headers); all triangle meshes
    total = sum(len(sh.quads) + len(sh.triangles) for sh in s.shapes)
    assert total == 36
    assert all(len(sh.quads) == 0 for sh in s.shapes)


def test_cornellbox_camera(cornellbox):
    cam = cornellbox.cameras[0]
    assert cam.name == "camera1"
    assert cam.aspect == pytest.approx(1.0)
    assert cam.lens == pytest.approx(0.035, rel=1e-5)
    assert cam.film == pytest.approx(0.024, rel=1e-4)
    assert cam.focus == pytest.approx(3.9, rel=1e-5)
    np.testing.assert_allclose(cam.frame[3], [0, 1, 3.9], rtol=1e-6)
    assert find_camera(cornellbox, "") == 0


def test_cornellbox_materials(cornellbox):
    mats = cornellbox.materials
    assert all(m.type == MaterialType.MATTE for m in mats)
    light = mats[4]
    np.testing.assert_allclose(light.emission, [17, 12, 4])
    assert mats[0].ior == pytest.approx(1.5)
    assert mats[0].trdepth == pytest.approx(0.01)
    assert mats[0].opacity == pytest.approx(1.0)


def test_ply_triangle_pair(scenes_dir):
    shape = load_shape(f"{scenes_dir}/cornellbox/shapes/light.ply")
    assert shape.positions.shape == (4, 3)
    assert shape.triangles.shape == (2, 3)
    assert shape.quads.shape == (0, 4)
    assert shape.triangles.min() >= 0 and shape.triangles.max() <= 3


def test_ply_triangle_shape_with_attrs(scenes_dir):
    shape = load_shape(f"{scenes_dir}/shapes1/shapes/sphere.ply")
    assert shape.positions.shape == (6534, 3)
    assert shape.normals.shape == (6534, 3)
    assert shape.texcoords.shape == (6534, 2)
    # sphere.ply is a quad mesh per its header (6144 faces)
    assert len(shape.quads) + len(shape.triangles) == 6144
    # normals should be ~unit length
    lens = np.linalg.norm(shape.normals, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-3)


def test_flatten_cornellbox(cornellbox):
    flat = flatten_scene(cornellbox)
    g = flat.geometry
    assert g.prim_verts.shape == (36, 4, 3)
    assert g.prim_instance.shape == (36,)
    assert g.inst_frame.shape == (8, 4, 3)
    # identity frames -> world verts equal object verts
    v0 = cornellbox.shapes[0].positions
    np.testing.assert_allclose(
        g.vert_positions[: len(v0)], v0, rtol=1e-6
    )
    assert flat.materials.type.shape == (8,)
    np.testing.assert_allclose(flat.materials.emission[4], [17, 12, 4])


def test_flatten_instanced_scene(scenes_dir):
    scene = load_scene(f"{scenes_dir}/materials1/materials1.json")
    flat = flatten_scene(scene)
    # materials1 expands 6147 unique faces to 30723 prims (5 instances reuse)
    assert flat.geometry.prim_verts.shape[0] == 30723
    # world-space transform applied: instance frames differ
    assert flat.n_instances == len(scene.instances)


def test_environment_scene(scenes_dir):
    scene = load_scene(f"{scenes_dir}/features1/features1.json")
    assert len(scene.environments) == 1
    env = scene.environments[0]
    assert env.emission_tex == 0
    np.testing.assert_allclose(env.emission, [0.5, 0.5, 0.5])
    tex = scene.textures[0]
    assert tex.linear  # HDR
    assert tex.width > 0 and tex.pixels.shape[0] == tex.width * tex.height
    # real HDR: should have values > 1 (reference's loader clamps; ours must not)
    assert tex.pixels[:, :3].max() > 1.0
