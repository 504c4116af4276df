"""utils/kernel_select.py: the on-device pass-count mirrors must equal
the numpy models in utils/kernel_flops.py (which are themselves exact
reproductions of the kernels' culls — tools/intersector_mfu.py lineage),
and the decision rule must be stable."""

import numpy as np


def _soup(n_prims, seed=3):
    rng = np.random.default_rng(seed)
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


def test_device_pass_counts_match_numpy_models():
    from julia_raytracer_tpu.ops.pallas_cluster import _load_tables
    from julia_raytracer_tpu.utils import kernel_flops as kf
    from julia_raytracer_tpu.utils import kernel_select as ks

    pv = _soup(40_000)
    inst = np.zeros(len(pv), np.int32)
    tfm, nrm, bbox, n_clusters = _load_tables(pv, inst, "")
    cbbox = bbox[:n_clusters, 0:6]
    o, d, tmin, tmax = ks.bounce_rays(pv, 8192, seed=5)

    st = ks.predict_ratio(pv, inst, "", n_rays=8192, seed=5)
    rg_np = kf.regroup_dispatch_stats(o, d, tmin, tmax, cbbox)
    wl_np = kf.worklist_dispatch_stats(o, d, tmin, tmax, cbbox)
    assert st["passes_rg"] == rg_np["passes"], (st, rg_np)
    assert st["passes_wl"] == wl_np["passes"], (st, wl_np)
    assert st["pairs"] == rg_np["pairs_live"]
    assert 0 < st["ratio"]
    assert st["n_super"] == rg_np["n_super"]


def test_selection_threshold():
    from julia_raytracer_tpu.utils import kernel_select as ks

    pv = _soup(30_000)
    inst = np.zeros(len(pv), np.int32)
    sel = ks.select_bounce_kernel(pv, inst, "")  # no cache key: not cached
    assert sel["kernel"] in ("regroup", "worklist")
    assert (sel["kernel"] == "regroup") == (sel["ratio"] < sel["threshold"])
