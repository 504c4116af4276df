"""On-hardware smoke tier (VERDICT r4 item 7).

Unlike tests/ (which forces a virtual 8-device CPU mesh and runs Pallas
in interpret mode), this tier runs REAL Mosaic lowering on the live TPU.
Collected only when pointed at explicitly (pytest.ini testpaths=tests);
every test skips cleanly off-hardware. Driver entry:
tools/tpu_tests.sh -> TPU_TESTS_r{N}.json.
"""

import os

import numpy as np
import pytest

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.devices()[0].platform == "tpu":
        return
    skip = pytest.mark.skip(reason="TPU smoke tier requires TPU hardware")
    for item in items:
        item.add_marker(skip)


@pytest.fixture(scope="session")
def soup():
    """Morton-ordered clustered quad soup (tools/ab_regroup.py recipe)."""
    rng = np.random.default_rng(7)
    n_prims = 200_000
    centers = rng.random((n_prims, 3))
    order = np.argsort(
        (centers[:, 0] * 1024).astype(np.int64) * 1048576
        + (centers[:, 1] * 1024).astype(np.int64) * 1024
        + (centers[:, 2] * 1024).astype(np.int64)
    )
    centers = centers[order]
    e1 = rng.normal(size=(n_prims, 3)) * 0.01
    e2 = rng.normal(size=(n_prims, 3)) * 0.01
    pv = np.stack(
        [centers, centers + e1, centers + e1 + e2, centers + e2], axis=1
    ).astype(np.float32)
    return pv


@pytest.fixture(scope="session")
def bounce_rays():
    rng = np.random.default_rng(13)
    n = 16384
    o = rng.random((n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)
