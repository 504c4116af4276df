"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

# FORCE the virtual 8-device CPU mesh. The host sitecustomize registers the
# axon TPU backend and sets jax.config jax_platforms="axon,cpu", which
# overrides the JAX_PLATFORMS env var — so update the config, not the env.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: XLA-CPU compiles of the traversal/integrator
# while-loops take minutes; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SCENES_DIR = "/root/reference/scenes"


@pytest.fixture(scope="session")
def scenes_dir():
    return SCENES_DIR


@pytest.fixture(scope="session")
def cornellbox():
    from julia_raytracer_tpu.scene.loader import load_scene

    return load_scene(f"{SCENES_DIR}/cornellbox/cornellbox.json")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)
