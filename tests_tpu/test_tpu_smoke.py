"""TPU smoke tier: real Mosaic lowering of every kernel family + one
low-spp golden + determinism, in ~2-4 min warm. Each test is the
hardware twin of an interpret-mode test in tests/ (VERDICT r4 weak #6:
a Mosaic regression used to surface as a broken bench, not a red test).
"""

import os

import numpy as np
import pytest


def _hits_equal(ha, hb, t_tol=1e-5, prim_tol=0.999, t_frac=0.999):
    import jax

    ha = jax.tree.map(np.asarray, ha)
    hb = jax.tree.map(np.asarray, hb)
    both = ha.hit & hb.hit
    assert (ha.hit == hb.hit).mean() > 0.9995
    if both.any():
        # prim_tol < 1: the synthetic soup has near-duplicate quads, so
        # equal-t ties can break differently between kernel families
        # (t must still agree)
        assert (ha.prim[both] == hb.prim[both]).mean() > prim_tol
        assert np.isclose(
            ha.t[both], hb.t[both], rtol=t_tol, atol=1e-6
        ).mean() > t_frac


def _full_rays(n):
    import jax.numpy as jnp

    return jnp.full(n, 1e-4, jnp.float32), jnp.full(n, 3.0e38, jnp.float32)


def test_worklist_vs_jnp_bruteforce(soup, bounce_rays):
    """Worklist Pallas kernel == jnp brute force on a small soup slice."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.pallas_cluster import (
        make_cluster_intersect_worklist,
    )
    from julia_raytracer_tpu.ops.traversal import intersect_bruteforce

    pv = soup[:2048]
    o, d = bounce_rays
    n = len(o)
    wl = make_cluster_intersect_worklist(pv, np.zeros(len(pv), np.int32))
    tmin, tmax = _full_rays(n)
    hw = wl(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    hr = intersect_bruteforce(
        jnp.asarray(pv), jnp.asarray(o), jnp.asarray(d), tmin, tmax,
        prim_instance=jnp.zeros(len(pv), jnp.int32),
    )
    # cross-FORMULA comparison (unit-triangle transform rows vs direct
    # Moller-Trumbore): t agrees to ~1e-4 relative on thin random
    # quads, and near-duplicate prims tie-break differently
    _hits_equal(hw, hr, t_tol=1e-3, prim_tol=0.995, t_frac=0.99)


def test_dense_vs_jnp_bruteforce(soup, bounce_rays):
    """Tiny-scene dense Pallas kernel == jnp brute force. 112 prims =
    BRUTEFORCE_THRESHOLD (lowered from 256 after this tier caught
    Mosaic scoped-vmem compile OOMs: the stack scales with the prim
    unroll and crosses the 16M limit at ~125 prims)."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.pallas_intersect import make_bruteforce_pallas
    from julia_raytracer_tpu.ops.traversal import intersect_bruteforce

    pv = soup[:112]
    o, d = bounce_rays
    n = len(o)
    bf = make_bruteforce_pallas(pv, np.zeros(len(pv), np.int32))
    tmin, tmax = _full_rays(n)
    hp = bf(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    hr = intersect_bruteforce(
        jnp.asarray(pv), jnp.asarray(o), jnp.asarray(d), tmin, tmax,
        prim_instance=jnp.zeros(len(pv), jnp.int32),
    )
    _hits_equal(hp, hr, t_tol=1e-3, prim_tol=0.995, t_frac=0.99)


def test_regroup_vs_worklist_hit_identical(soup, bounce_rays):
    """Regroup pipeline == worklist kernel, full-liveness bounce rays
    (exact tri-test mode pins bit-level winner comparisons)."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.pallas_cluster import (
        make_cluster_intersect_worklist,
    )
    from julia_raytracer_tpu.ops.pallas_regroup import (
        make_cluster_intersect_regroup,
    )

    o, d = bounce_rays
    n = len(o)
    inst = np.zeros(len(soup), np.int32)
    os.environ["JRT_RG_UVFAST"] = "0"
    try:
        wl = make_cluster_intersect_worklist(soup, inst)
        rg = make_cluster_intersect_regroup(soup, inst)
    finally:
        del os.environ["JRT_RG_UVFAST"]
    tmin, tmax = _full_rays(n)
    hw = wl(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    hr = rg(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    _hits_equal(hw, hr, t_tol=0.0)  # same sweep math -> bit-identical t
    assert (np.asarray(hw.prim) == np.asarray(hr.prim)).all()


def test_regroup_default_is_winner_exact(soup, bounce_rays):
    """The DEFAULT tri-test mode must be winner-exact vs the worklist
    kernel. History: round 4 shipped JRT_RG_UVFAST=1 (bf16 u/v range
    tests) as the default after golden validation; this tier's first
    run showed uv-fast picks ~28% DIFFERENT winners with materially
    different t on divergent soup rays (bf16 edge misclassification on
    disjoint quads — real meshes mask it via shared edges, which is why
    goldens passed). Round 5 flipped the default to exact; this test
    pins that the default stays bit-level correct."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.pallas_cluster import (
        make_cluster_intersect_worklist,
    )
    from julia_raytracer_tpu.ops.pallas_regroup import (
        make_cluster_intersect_regroup,
    )

    o, d = bounce_rays
    n = len(o)
    inst = np.zeros(len(soup), np.int32)
    assert os.environ.get("JRT_RG_UVFAST") is None
    rg_default = make_cluster_intersect_regroup(soup, inst)
    wl = make_cluster_intersect_worklist(soup, inst)
    tmin, tmax = _full_rays(n)
    ha = wl(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    hb = rg_default(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    assert (np.asarray(ha.hit) == np.asarray(hb.hit)).all()
    assert (np.asarray(ha.prim) == np.asarray(hb.prim)).all()


def test_regroup_overflow_fallback(soup, bounce_rays):
    """Chunks whose packed size exceeds blk_cap must lax.cond to the
    worklist fallback and still return correct hits."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.pallas_cluster import (
        make_cluster_intersect_worklist,
    )
    from julia_raytracer_tpu.ops.pallas_regroup import (
        make_cluster_intersect_regroup,
    )

    o, d = bounce_rays
    n = len(o)
    inst = np.zeros(len(soup), np.int32)
    wl = make_cluster_intersect_worklist(soup, inst)
    rg_tiny = make_cluster_intersect_regroup(soup, inst, blk_cap=512)
    tmin, tmax = _full_rays(n)
    hw = wl(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    hr = rg_tiny(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    _hits_equal(hw, hr, t_tol=0.0)


def test_regroup_livegate_mostly_dead(soup, bounce_rays):
    """A mostly-dead dispatch (alive < JRT_RG_LIVEGATE) routes to the
    fallback; dead lanes (tmax=-1) must report no hit, live lanes must
    match the worklist kernel."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops.pallas_cluster import (
        make_cluster_intersect_worklist,
    )
    from julia_raytracer_tpu.ops.pallas_regroup import (
        make_cluster_intersect_regroup,
    )

    o, d = bounce_rays
    n = len(o)
    n_live = n // 10
    inst = np.zeros(len(soup), np.int32)
    wl = make_cluster_intersect_worklist(soup, inst)
    rg = make_cluster_intersect_regroup(soup, inst)
    tmin = jnp.full(n, 1e-4, jnp.float32)
    tmax_np = np.full(n, -1.0, np.float32)
    tmax_np[:n_live] = 3.0e38
    tmax = jnp.asarray(tmax_np)
    hw = wl(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    hr = rg(jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    assert not np.asarray(hr.hit)[n_live:].any()
    _hits_equal(hw, hr, t_tol=0.0)


def test_golden_cornellbox_low_spp():
    """End-to-end render on hardware vs the reference golden image."""
    import jax.numpy as jnp
    from PIL import Image

    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state,
    )
    from julia_raytracer_tpu.scene.loader import load_scene
    from julia_raytracer_tpu.utils.color import rgb_to_srgb

    scene_path = "/root/reference/scenes/cornellbox/cornellbox.json"
    scene = load_scene(scene_path)
    params = Params(
        scene=scene_path, resolution=128, samples=24, batch=24,
        bounces=8, sampler="path",
    )
    r = Renderer(scene, params)
    state = r.trace_samples(make_trace_state(scene, params))
    ours = np.clip(
        np.asarray(rgb_to_srgb(r.get_image(state)))[..., :3], 0, 1
    )
    gold_img = Image.open(
        "/root/reference/images/cornellbox_path.png"
    ).convert("RGB")
    gold = np.asarray(
        gold_img.resize((ours.shape[1], ours.shape[0]), Image.BOX),
        np.float32,
    ) / 255.0
    mse = float(((ours - gold) ** 2).mean())
    assert mse < 0.010, f"cornellbox MSE {mse}"


def test_determinism_same_seed():
    """Same seed => bit-identical image ON HARDWARE (the CPU twin lives
    in tests/test_render.py; Mosaic nondeterminism would only show here)."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state,
    )
    from julia_raytracer_tpu.scene.loader import load_scene

    scene_path = "/root/reference/scenes/cornellbox/cornellbox.json"
    scene = load_scene(scene_path)
    params = Params(
        scene=scene_path, resolution=96, samples=4, batch=4,
        bounces=6, sampler="path",
    )
    r = Renderer(scene, params)
    img1 = np.asarray(
        r.get_image(r.trace_samples(make_trace_state(scene, params)))
    )
    img2 = np.asarray(
        r.get_image(r.trace_samples(make_trace_state(scene, params)))
    )
    assert (img1 == img2).all()


def test_compactor_bit_exact_adversarial():
    """Pallas lane-compactor (ops/pallas_compact.py) under real Mosaic
    at flagship scale: compact+expand must move raw 32-bit patterns
    (denormals, sNaNs, full-range u32) bit-exactly. Guards the int-
    domain marshal contract — TPU f32 copies flush denormals, which is
    exactly why the module never lets payloads ride as f32."""
    import jax.numpy as jnp

    from julia_raytracer_tpu.ops import pallas_compact as pc

    rng = np.random.default_rng(3)
    n, cap = 262144, 65536
    adv = (
        rng.integers(0, 2**32, size=3 * n, dtype=np.uint64)
        .astype(np.uint32).view(np.float32).reshape(n, 3)
    )
    leaves = [
        adv,
        rng.integers(-(2**31), 2**31, n).astype(np.int32),
        rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32),
        rng.integers(0, 2, n).astype(bool),
    ]
    alive = rng.random(n) < 0.16
    alive = alive & (np.cumsum(alive) <= cap)
    total = int(alive.sum())
    idx = np.nonzero(alive)[0]

    packed = pc.compact_state(
        [jnp.asarray(x) for x in leaves], jnp.asarray(alive), cap
    )

    def bits(a):
        return np.ascontiguousarray(np.asarray(a)).view(np.uint8)

    for g, leaf in zip(packed, leaves):
        np.testing.assert_array_equal(
            bits(np.asarray(g)[:total]), bits(leaf[idx])
        )

    nar = (
        rng.integers(0, 2**32, size=cap, dtype=np.uint64)
        .astype(np.uint32).view(np.float32)
    )
    fb = (
        rng.integers(0, 2**32, size=n, dtype=np.uint64)
        .astype(np.uint32).view(np.float32)
    )
    merged = np.asarray(pc.expand_outputs(
        [jnp.asarray(nar)], jnp.asarray(alive), [jnp.asarray(fb)]
    )[0])
    pos = np.cumsum(alive) - 1
    want = np.where(
        alive,
        nar.view(np.uint32)[np.clip(pos, 0, cap - 1)],
        fb.view(np.uint32),
    )
    np.testing.assert_array_equal(
        np.ascontiguousarray(merged).view(np.uint32), want
    )


def test_compaction_in_context_matches_plain_loop(monkeypatch):
    """Flagship-shape render (512px cornellbox) with the Pallas two-
    phase boundary vs the plain while_loop: same image up to compiler
    fusion reassociation (the CPU twin in tests/test_compact.py is
    exactly bit-identical)."""
    from julia_raytracer_tpu.render.renderer import (
        Params, Renderer, make_trace_state,
    )
    from julia_raytracer_tpu.scene.loader import load_scene

    scene = load_scene("/root/reference/scenes/cornellbox/cornellbox.json")
    imgs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("JRT_COMPACT", mode)
        params = Params(resolution=512, samples=2, batch=2,
                        bounces=8, sampler="path")
        r = Renderer(scene, params)
        state = r.trace_samples(make_trace_state(scene, params))
        imgs[mode] = np.asarray(r.get_image(state))
    np.testing.assert_allclose(imgs["0"], imgs["1"], atol=1e-5)
