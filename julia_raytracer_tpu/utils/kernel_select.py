"""Build-time bounce-kernel selection: worklist vs regroup per scene
(VERDICT r4 item 5 — replaces the static 150k-prim threshold).

Method: sample bounce-like rays (uniform surface points + uniform-sphere
directions — the divergent population bounce dispatches see), reproduce
both kernels' tri-test PASS counts exactly (the culls are pure slab
tests, mirrored here on-device in one jit), convert to predicted
dispatch times with per-unit costs measured on the v5e
(INTERSECT_MFU_r04 + its device-trace split), and pick regroup only on
a DECISIVE predicted win (ratio < 0.35).

Why a decisive margin instead of ratio < 1: the predictor models the
standalone dispatch, not the integrated loop. Round-5 end-to-end A/Bs
(same session, dead-tmax + livegate active):

  scene      predicted ratio   end-to-end regroup vs worklist
  bathroom1  0.328             -9%  (2659 vs 2908 ms/sample)  -> regroup
  features1  0.359             ~0   (26.1s vs 26.1s golden)   -> worklist
  kitchen    0.366             +7%  (4077 vs 3793 ms/sample)  -> worklist

The in-context overhead (cond + count stage inside the while_loop,
buffer pressure) eats ~0.03-0.04 of ratio; 0.35 splits the measured
winners. Decisions are disk-cached per scene content key and logged.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# measured per-unit costs (v5e, INTERSECT_MFU_r04 + trace split)
US_WL_PASS = 1.051
US_RG_PASS = 0.81
US_RG_PAIR = 3.9
US_RG_RAY = 0.12
MS_RG_FIXED = 2.0
RATIO_THRESHOLD = 0.35

LANES = 128
SUP = 128
TILE = 1024
GRP = 8


def bounce_rays(prim_verts: np.ndarray, n_rays: int, seed: int = 11):
    """Surface-sampled divergent rays (tools/kernel_select_probe.py)."""
    rng = np.random.default_rng(seed)
    q = len(prim_verts)
    pi = rng.integers(0, q, n_rays)
    pv = prim_verts[pi]
    u = rng.random((n_rays, 1), dtype=np.float32)
    v = rng.random((n_rays, 1), dtype=np.float32)
    p = ((1 - u) * (1 - v) * pv[:, 0] + u * (1 - v) * pv[:, 1]
         + u * v * pv[:, 2] + (1 - u) * v * pv[:, 3]).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-20
    ext = float(
        prim_verts.reshape(-1, 3).max() - prim_verts.reshape(-1, 3).min()
    )
    tmin = np.full(n_rays, 1e-4 * max(ext, 1.0), np.float32)
    tmax = np.full(n_rays, 3.0e38, np.float32)
    return p, d, tmin, tmax


def _super_bbox(cbbox: np.ndarray, sup: int = SUP):
    c = len(cbbox)
    s_count = -(-c // sup)
    pad = s_count * sup - c
    cb = (np.concatenate([cbbox, np.tile(cbbox[-1:], (pad, 1))])
          if pad else cbbox)
    sb = np.concatenate(
        [cb.reshape(s_count, sup, 6)[:, :, 0:3].min(1),
         cb.reshape(s_count, sup, 6)[:, :, 3:6].max(1)], axis=1)
    return cb, sb, s_count


def _row_passes_device(o, d, tmin, tmax, cb_rows=None, cb_shared=None):
    """Device pass counter: rays in fixed 128-lane rows, each row tested
    against its cluster boxes — per-row boxes (cb_rows [n_rows, C, 6])
    or one shared set (cb_shared [C, 6]). passes = sum over
    (row, cluster) of any-lane slab hit."""
    import jax
    import jax.numpy as jnp

    n_rows = len(o) // LANES
    C = (cb_rows.shape[1] if cb_rows is not None else cb_shared.shape[0])
    o_r = o.reshape(n_rows, LANES, 3)
    d_r = d.reshape(n_rows, LANES, 3)
    tn_r = tmin.reshape(n_rows, LANES)
    tx_r = tmax.reshape(n_rows, LANES)

    def hits_sum(o_c, d_c, tn_c, tx_c, bb):
        # bb: [k, C, 6] or [C, 6] (broadcast over rows)
        if bb.ndim == 2:
            bb = bb[None]
        enter = None
        exit_ = None
        for ax in range(3):
            di = 1.0 / jnp.where(d_c[..., ax] == 0, 1e-30, d_c[..., ax])
            t0 = (bb[:, None, :, ax] - o_c[..., ax][:, :, None]) * di[:, :, None]
            t1 = (bb[:, None, :, 3 + ax] - o_c[..., ax][:, :, None]) * di[:, :, None]
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            enter = lo if enter is None else jnp.maximum(enter, lo)
            exit_ = hi if exit_ is None else jnp.minimum(exit_, hi)
        enter = jnp.maximum(enter, tn_c[:, :, None])
        exit_ = jnp.minimum(exit_, tx_c[:, :, None])
        hit = enter <= exit_ * jnp.float32(1.00000024)  # [k, 128, C]
        return jnp.sum(jnp.any(hit, axis=1).astype(jnp.int32))

    k = max(1, min(n_rows, (1 << 24) // max(C * LANES // 32, 1)))
    n_pad = -(-n_rows // k) * k
    pad = n_pad - n_rows

    def padr(x, fill=0.0):
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x

    rays_args = (
        jnp.asarray(padr(o_r)).reshape(-1, k, LANES, 3),
        jnp.asarray(padr(d_r)).reshape(-1, k, LANES, 3),
        jnp.asarray(padr(tn_r)).reshape(-1, k, LANES),
        jnp.asarray(padr(tx_r, fill=-1.0)).reshape(-1, k, LANES),
    )
    if cb_rows is not None:
        bb_arg = jnp.asarray(padr(cb_rows)).reshape(
            (-1, k) + cb_rows.shape[1:])
        total = jax.jit(
            lambda o_, d_, tn_, tx_, b: jnp.sum(jax.lax.map(
                lambda ab: hits_sum(*ab),
                (o_, d_, tn_, tx_, b)))
        )(*rays_args, bb_arg)
    else:
        cb_d = jnp.asarray(cb_shared)
        total = jax.jit(
            lambda o_, d_, tn_, tx_, b: jnp.sum(jax.lax.map(
                lambda ab: hits_sum(*ab, b),
                (o_, d_, tn_, tx_)))
        )(*rays_args, cb_d)
    return int(total)


def predict_ratio(verts_np, inst_np, cache_key: str,
                  n_rays: int = 65536, seed: int = 11) -> dict:
    """Predicted t_regroup / t_worklist for one synthetic bounce
    dispatch. Exact pass counts (device slab mirror); see module doc."""
    from julia_raytracer_tpu.ops.pallas_cluster import _load_tables

    tfm, nrm, bbox, n_clusters = _load_tables(verts_np, inst_np, cache_key)
    cbbox = bbox[:n_clusters, 0:6]
    o, d, tmin, tmax = bounce_rays(verts_np, n_rays, seed)
    cb, sb, S = _super_bbox(cbbox)

    # super bits on host (small: [rays, S])
    di = 1.0 / np.where(d == 0, 1e-30, d)
    enter = None
    exit_ = None
    for ax in range(3):
        t0 = (sb[None, :, ax] - o[:, None, ax]) * di[:, None, ax]
        t1 = (sb[None, :, 3 + ax] - o[:, None, ax]) * di[:, None, ax]
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        enter = lo if enter is None else np.maximum(enter, lo)
        exit_ = hi if exit_ is None else np.minimum(exit_, hi)
    enter = np.maximum(enter, tmin[:, None])
    exit_ = np.minimum(exit_, tmax[:, None])
    bits = enter <= exit_ * np.float32(1.00000024)      # [rays, S]

    n_tiles = -(-n_rays // TILE)
    bt = bits.reshape(n_tiles, TILE, S)
    cnt_ts = bt.sum(axis=1)
    pairs = int((cnt_ts > 0).sum())

    # --- worklist passes: rays in dispatch-order rows vs ALL clusters
    passes_wl = _row_passes_device(o, d, tmin, tmax, cb_shared=cb)

    # --- regroup passes: rays PACKED per super (stable order), rows of
    # 128, each row vs its super's 128 clusters
    ray_idx, sup_idx = np.nonzero(bits)                  # sorted by ray
    order = np.argsort(sup_idx, kind="stable")
    ray_p, sup_p = ray_idx[order], sup_idx[order]
    # pad each super's segment to full rows
    seg_rows = []
    row_sup = []
    start = 0
    counts = np.bincount(sup_p, minlength=S)
    for s in range(S):
        c = int(counts[s])
        if c == 0:
            continue
        seg = ray_p[start:start + c]
        start += c
        nr = -(-c // LANES)
        seg = np.concatenate(
            [seg, np.full(nr * LANES - c, seg[-1], seg.dtype)])
        # pad lanes repeat the last ray: they duplicate its passes within
        # the row (any() absorbs duplicates — no overcount)
        seg_rows.append(seg.reshape(nr, LANES))
        row_sup.extend([s] * nr)
    if seg_rows:
        rows_idx = np.concatenate(seg_rows, axis=0)      # [R, 128]
        row_sup = np.asarray(row_sup)
        flat = rows_idx.reshape(-1)
        cb_rows = cb.reshape(S, SUP, 6)[row_sup]         # [R, 128, 6]
        passes_rg = _row_passes_device(
            o[flat], d[flat], tmin[flat], tmax[flat], cb_rows=cb_rows)
        rows_rg = len(rows_idx)
    else:
        passes_rg = 0
        rows_rg = 0

    t_wl = passes_wl * US_WL_PASS * 1e-3
    t_rg = (passes_rg * US_RG_PASS * 1e-3
            + pairs * US_RG_PAIR * 1e-3
            + n_rays * US_RG_RAY * 1e-3
            + MS_RG_FIXED)
    return dict(
        n_rays=n_rays, n_super=S, passes_wl=int(passes_wl),
        passes_rg=int(passes_rg), pairs=pairs, rows_rg=int(rows_rg),
        t_wl_ms=round(t_wl, 1), t_rg_ms=round(t_rg, 1),
        ratio=round(t_rg / max(t_wl, 1e-9), 3),
    )


def select_bounce_kernel(verts_np, inst_np, cache_key: str) -> dict:
    """Disk-cached decision: {"kernel": "regroup"|"worklist", ...}."""
    from julia_raytracer_tpu.utils import diskcache

    cached = diskcache.load_arrays(cache_key, "kernel_select")
    if cached is not None and "payload" in cached:
        return json.loads(bytes(cached["payload"]).decode())
    t0 = time.time()
    st = predict_ratio(verts_np, inst_np, cache_key)
    st["probe_s"] = round(time.time() - t0, 1)
    st["kernel"] = "regroup" if st["ratio"] < RATIO_THRESHOLD else "worklist"
    st["threshold"] = RATIO_THRESHOLD
    if cache_key:
        diskcache.save_arrays(
            cache_key, "kernel_select",
            dict(payload=np.frombuffer(
                json.dumps(st).encode(), dtype=np.uint8)),
        )
    return st
