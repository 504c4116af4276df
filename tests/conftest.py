"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

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
