"""A/B the regroup intersector against the worklist kernel.

Random quad soup + random rays (primary-ish and divergent bounce-ish),
comparing Hit fields. Run on CPU (interpret mode) or --tpu.

Run: python tools/ab_regroup.py [--tpu] [--prims N] [--rays N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ON_TPU = "--tpu" in sys.argv
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
# exactness harness: pin the regroup kernel to full-precision u/v range
# tests so hit/prim comparisons stay bit-level (JRT_RG_UVFAST defaults
# on for production renders; its golden-level validation lives in
# PERF_r04.md)
os.environ.setdefault("JRT_RG_UVFAST", "0")

import jax
import jax.numpy as jnp
import numpy as np


def arg(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def make_soup(n_prims, rng):
    """Morton-ish clustered quad soup in [0,1]^3."""
    centers = rng.random((n_prims, 3))
    order = np.argsort(
        (centers[:, 0] * 1024).astype(np.int64) * 1048576
        + (centers[:, 1] * 1024).astype(np.int64) * 1024
        + (centers[:, 2] * 1024).astype(np.int64)
    )
    centers = centers[order]
    e1 = rng.normal(size=(n_prims, 3)) * 0.01
    e2 = rng.normal(size=(n_prims, 3)) * 0.01
    p1 = centers
    p2 = centers + e1
    p4 = centers + e2
    p3 = centers + e1 + e2
    return np.stack([p1, p2, p3, p4], axis=1).astype(np.float32)


def make_rays(n_rays, rng, divergent):
    if divergent:
        o = rng.random((n_rays, 3)).astype(np.float32)
        d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    else:
        o = np.tile(np.array([[0.5, 0.5, -1.0]], np.float32), (n_rays, 1))
        o += rng.normal(size=(n_rays, 3)).astype(np.float32) * 0.01
        d = rng.random((n_rays, 3)).astype(np.float32) - [0.5, 0.5, -1.5]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)


def compare(name, ha, hb, t_tol=1e-5):
    ha = jax.tree.map(np.asarray, ha)
    hb = jax.tree.map(np.asarray, hb)
    n = len(ha.hit)
    hit_match = (ha.hit == hb.hit).mean()
    both = ha.hit & hb.hit
    prim_match = (ha.prim[both] == hb.prim[both]).mean() if both.any() else 1.0
    t_close = (
        np.isclose(ha.t[both], hb.t[both], rtol=t_tol, atol=1e-6).mean()
        if both.any() else 1.0
    )
    exact = ((ha.hit == hb.hit) & ((ha.prim == hb.prim) | ~both)).mean()
    print(f"{name}: hit match {hit_match:.6f}  prim match {prim_match:.6f} "
          f" t close {t_close:.6f}  hits {ha.hit.mean():.3f}/{hb.hit.mean():.3f}")
    ok = hit_match > 0.9995 and prim_match > 0.999 and t_close > 0.999
    if not ok:
        bad = np.nonzero(ha.hit != hb.hit)[0][:5]
        print("  first hit mismatches:", bad,
              "a", ha.t[bad] if len(bad) else "", "b", hb.t[bad] if len(bad) else "")
        bd = np.nonzero(both & (ha.prim != hb.prim))[0][:5]
        print("  first prim mismatches:", bd)
        if len(bd):
            print("   a prim/t:", ha.prim[bd], ha.t[bd])
            print("   b prim/t:", hb.prim[bd], hb.t[bd])
    return ok


def main():
    from julia_raytracer_tpu.ops.pallas_cluster import (
        make_cluster_intersect_worklist,
    )
    from julia_raytracer_tpu.ops.pallas_regroup import (
        make_cluster_intersect_regroup,
    )

    n_prims = arg("--prims", 20000 if not ON_TPU else 200000)
    n_rays = arg("--rays", 4096 if not ON_TPU else 147456)
    rng = np.random.default_rng(7)
    pv = make_soup(n_prims, rng)
    inst = np.zeros(n_prims, np.int32)

    interp = not ON_TPU
    wl = make_cluster_intersect_worklist(pv, inst, interpret=interp)
    rg = make_cluster_intersect_regroup(pv, inst, interpret=interp)

    oks = []
    for divergent, label in ((False, "primary"), (True, "bounce")):
        o, d = make_rays(n_rays, rng, divergent)
        tmin = jnp.full(n_rays, 1e-4, jnp.float32)
        tmax = jnp.full(n_rays, 3.0e38, jnp.float32)
        o_d, d_d = jnp.asarray(o), jnp.asarray(d)
        t0 = time.time()
        hw = wl(o_d, d_d, tmin, tmax)
        jax.block_until_ready(hw)
        t1 = time.time()
        hr = rg(o_d, d_d, tmin, tmax)
        jax.block_until_ready(hr)
        t2 = time.time()
        print(f"[{label}] worklist {t1-t0:.2f}s  regroup {t2-t1:.2f}s "
              "(first call incl compile)")
        oks.append(compare(label, hw, hr))

    print("AB REGROUP", "PASS" if all(oks) else "FAIL")
    sys.exit(0 if all(oks) else 1)


if __name__ == "__main__":
    main()
