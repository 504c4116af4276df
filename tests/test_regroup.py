"""Regroup intersector (ops/pallas_regroup.py) vs the worklist kernel.

Interpret-mode A/B on a clustered quad soup: the regroup pipeline
(count -> pack -> tri-test -> unpack -> attribute recompute) must
reproduce the worklist kernel's hits exactly — same culls, same split
precision, same tie-breaking within a supercluster sweep.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from julia_raytracer_tpu.ops.pallas_cluster import (
    make_cluster_intersect_worklist,
)
from julia_raytracer_tpu.ops.pallas_regroup import (
    make_cluster_intersect_regroup,
)


def _soup(n_prims, rng):
    centers = rng.random((n_prims, 3))
    order = np.argsort(
        (centers[:, 0] * 64).astype(np.int64) * 4096
        + (centers[:, 1] * 64).astype(np.int64) * 64
        + (centers[:, 2] * 64).astype(np.int64)
    )
    centers = centers[order]
    e1 = rng.normal(size=(n_prims, 3)) * 0.02
    e2 = rng.normal(size=(n_prims, 3)) * 0.02
    return np.stack(
        [centers, centers + e1, centers + e1 + e2, centers + e2], axis=1
    ).astype(np.float32)


@pytest.fixture(scope="module")
def soup_isecs():
    rng = np.random.default_rng(11)
    pv = _soup(12000, rng)  # ~188 clusters -> 2 superclusters
    inst = np.arange(12000, dtype=np.int32) % 7
    wl = make_cluster_intersect_worklist(pv, inst, interpret=True)
    rg = make_cluster_intersect_regroup(pv, inst, interpret=True)
    return pv, wl, rg, rng


@pytest.mark.parametrize("divergent", [False, True])
def test_regroup_matches_worklist(soup_isecs, divergent):
    pv, wl, rg, rng = soup_isecs
    n = 1024
    if divergent:
        o = rng.random((n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
    else:
        o = np.tile(np.array([[0.5, 0.5, -1.0]], np.float32), (n, 1))
        d = rng.random((n, 3)).astype(np.float32) - [0.5, 0.5, -1.5]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    tmin = jnp.full(n, 1e-4, jnp.float32)
    tmax = jnp.full(n, 3.0e38, jnp.float32)

    hw = wl(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    hr = rg(jnp.asarray(o), jnp.asarray(d), tmin, tmax)

    hw_hit = np.asarray(hw.hit)
    hr_hit = np.asarray(hr.hit)
    assert hw_hit.any(), "test soup produced no hits"
    np.testing.assert_array_equal(hw_hit, hr_hit)
    both = hw_hit & hr_hit
    np.testing.assert_array_equal(
        np.asarray(hw.prim)[both], np.asarray(hr.prim)[both]
    )
    np.testing.assert_allclose(
        np.asarray(hw.t)[both], np.asarray(hr.t)[both], rtol=1e-5, atol=1e-6
    )
    # winner attributes are recomputed from the triangle transform at
    # merge time — agree with the worklist's in-kernel selection
    np.testing.assert_allclose(
        np.asarray(hw.u)[both], np.asarray(hr.u)[both], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(hw.instance)[both], np.asarray(hr.instance)[both]
    )


def test_regroup_overflow_falls_back(soup_isecs):
    """A chunk whose packed size exceeds the static capacity must give
    the same answer via the lax.cond worklist fallback."""
    rng = np.random.default_rng(3)
    pv = _soup(12000, rng)
    inst = np.zeros(12000, np.int32)
    rg_small = make_cluster_intersect_regroup(
        pv, inst, interpret=True, blk_cap=64  # tiny: always overflows
    )
    wl = make_cluster_intersect_worklist(pv, inst, interpret=True)
    n = 1024
    o = rng.random((n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.full(n, 1e-4, jnp.float32)
    tmax = jnp.full(n, 3.0e38, jnp.float32)
    hr = rg_small(jnp.asarray(o), jnp.asarray(d.astype(np.float32)), tmin, tmax)
    hw = wl(jnp.asarray(o), jnp.asarray(d.astype(np.float32)), tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hw.hit), np.asarray(hr.hit))
    np.testing.assert_array_equal(np.asarray(hw.prim), np.asarray(hr.prim))
