"""Multi-device sharding tests on the virtual 8-device CPU mesh:
sharded render == single-device render; sharded train step runs and
produces finite grads (the XLA-inserted psum path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from julia_raytracer_tpu.parallel.mesh import make_mesh, shard_render_fn, shard_train_step
from julia_raytracer_tpu.render.integrator import trace_wavefront
from julia_raytracer_tpu.render.renderer import Params, Renderer, make_trace_state
from julia_raytracer_tpu.utils import rng as rng_mod
from julia_raytracer_tpu.ops.camera import sample_camera


@pytest.fixture(scope="module")
def setup():
    from julia_raytracer_tpu.scene.loader import load_scene

    scene = load_scene("/root/reference/scenes/cornellbox/cornellbox.json")
    params = Params(resolution=32, samples=1, bounces=3, sampler="path")
    r = Renderer(scene, params)
    state = make_trace_state(scene, params)
    return r, state


def _rays(r, state):
    n = state.width * state.height
    pix = jnp.arange(n, dtype=jnp.int32)
    rng = rng_mod.seed_state(pix, jnp.int32(0), 0)
    puv, rng = rng_mod.rand2f(rng)
    luv, rng = rng_mod.rand2f(rng)
    ij = jnp.stack([pix % state.width, pix // state.width], axis=-1)
    ro, rd = sample_camera(
        r.cam_arrays, ij, (state.width, state.height), puv, luv, False
    )
    return ro, rd, rng


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"


def test_sharded_render_matches_single(setup):
    r, state = setup
    ro, rd, rng = _rays(r, state)
    mesh = make_mesh(8)
    render = shard_render_fn(mesh, r.dscene, r.config, r.options)
    rad_sh, hit_sh, alb_sh, nrm_sh = render(r.dscene, ro, rd, rng)
    rad_1, hit_1, alb_1, nrm_1, _ = trace_wavefront(
        r.dscene, r.config, r.options, ro, rd, rng
    )
    # shard-invariance: the counter-based RNG makes lanes independent of
    # placement; tiny fp drift comes only from GSPMD changing op fusion
    np.testing.assert_allclose(
        np.asarray(rad_sh), np.asarray(rad_1), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(hit_sh), np.asarray(hit_1))


def test_sharded_train_step(setup):
    r, state = setup
    n = state.width * state.height
    mesh = make_mesh(8)
    step = shard_train_step(
        mesh, r.dscene, r.config, r.options, r.cam_arrays, state.width, state.height
    )
    pix = jnp.arange(n, dtype=jnp.int32)
    target = jnp.zeros((n, 3), jnp.float32)
    mats = r.dscene.materials
    loss, new_color, new_emission = step(mats.color, mats.emission, pix, target, 1)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(new_color)).all()
    assert np.isfinite(np.asarray(new_emission)).all()
    # the light's emission must move (grad flows through the psum)
    assert not np.allclose(np.asarray(new_emission), np.asarray(mats.emission))
