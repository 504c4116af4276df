"""Pallas lane-compactor for the unsorted two-phase wavefront dispatch.

The megakernel's while_loop runs EVERY lane to the last survivor's
bounce while the alive fraction collapses ([0.93, 0.35, 0.16, 0.07,
...] on the cornellbox flagship, tools/alive_profile.py) — and nearly
all of its 8 ms/sample is HBM-bound fusion traffic over the full-width
state (K_FUSIONS_r05.json). Sorted heavy scenes compact with a slice
(render/integrator.py two-phase path); the unsorted tiny tier cannot,
and every XLA formulation of the phase boundary measured ~8.3
ms/sample against ~3.9 ms of narrow-loop savings (DESIGN_compact.md):
XLA gathers/scatters at state scale are launch/serialization-bound on
this chip, and marshalling ~46 planes through one row-gather pays ~6
ms in marshal kernels.

This module is the sub-XLA-floor boundary: two Pallas kernels that
move the state planes at DMA/MXU speed, reusing the machinery proven
in ops/pallas_regroup.py (two-level exclusive rank via strict-lower
matmuls; one-hot-matmul selection; byte-chunk planes exact under
single-pass bf16 dots; windowed VMEM->HBM copies at a running SMEM
cursor).

  compact — grid (n_tiles,), one 1024-lane tile per step. The state
    rides as [P_PAD, 1024] int32 (f32/bool planes bitcast — int
    domain end to end, so no denormal-flush hazard anywhere). In
    kernel: extract 4 byte-chunk rows per plane BYTE-MAJOR (4 vector
    ops total), rank the tile's alive lanes (2 MXU passes), then per
    window block a one-hot dot ([4*P_PAD, 1024] @ [1024, 128], 16
    MXU passes) compacts survivors; recombine is again 4 vector ops
    on the [4, P_PAD, 128] reshape. A residual buffer carries the
    partial last block so packing is slot-tight; windows DMA to the
    packed HBM array at the running cursor (sequential grid =>
    inline start+wait; adjacent windows overlap at the partial
    block, so depth-2 would have to serialize anyway).

  expand — grid (n_tiles,): re-derive each tile's rank from the SAME
    alive bits, DMA the narrow result window at the tile's prefetched
    cursor base (an XLA cumsum of per-tile counts), transpose one-hot
    dots scatter packed slots back to lanes, recombine, write
    [n_tiles, OUT_PAD, 1024]. Only the integrator's output planes
    (radiance, hit flag/albedo/normal, rng) travel this direction.

Cost on the flagship boundary (262k lanes, cap 65k): ~768 window
blocks x 16 (compact) / 8 (expand) MXU passes at ~136 ns, ~256
inline window DMAs per side, plus XLA marshal transposes — measured
end to end by tools/compact_ab.py, adjudicated in PERF_r05.md.

No counterpart exists in the reference: src/trace.jl:215-274 walks
pixels serially and never needs stream compaction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 1024                # lanes compacted per grid step
WIN = TILE // LANES + 1    # window blocks per write (9)
SLACK = WIN - 1            # packed-array overhang blocks


def _chunk_rows(x_i32):
    """[P, L] i32 -> [4*P, L] f32 byte rows, BYTE-MAJOR (row k*P + p is
    byte k of plane p). Byte values 0..255 are exact under the MXU's
    single-pass bf16 dots (ops/pallas_regroup.py pack-kernel trick)."""
    parts = []
    for k in range(4):
        parts.append(
            (jax.lax.shift_right_logical(x_i32, jnp.int32(8 * k))
             & jnp.int32(255)).astype(jnp.float32)
        )
    return jnp.concatenate(parts, axis=0)


def _recombine(ck, p):
    """[4*P, L] f32 byte rows (byte-major) -> [P, L] i32. The top byte
    re-enters via a wrapping int32 multiply — exact reconstruction of
    any 32-bit pattern (same math as the regroup pack/unpack)."""
    c4 = ck.reshape(4, p, ck.shape[-1])
    u = c4[0].astype(jnp.int32)
    u = u + c4[1].astype(jnp.int32) * jnp.int32(1 << 8)
    u = u + c4[2].astype(jnp.int32) * jnp.int32(1 << 16)
    u = u + c4[3].astype(jnp.int32) * jnp.int32(1 << 24)
    return u


def _rank2(m2, lt_ref, l8_ref):
    """Two-level exclusive rank of set bits in [8, 128] 0/1 f32: one
    [8,128]@[128,128] strict-lower pass + one [8,8] row-offset pass."""
    rank_in = jax.lax.dot_general(
        m2, lt_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rt = jnp.sum(m2, axis=1, keepdims=True)
    row_off = jax.lax.dot_general(
        l8_ref[:, :], rt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return rank_in + row_off


def _make_compact_kernel(p_pad: int):
    ch = 4 * p_pad

    def kernel(lt_ref, l8_ref, bits_ref, vals_ref, packed_ref,
               buf, sem, cur_ref, resid_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            cur_ref[0] = 0
            resid_ref[:, :] = jnp.zeros((p_pad, LANES), jnp.int32)

        m2 = bits_ref[0]                             # [8, 128] f32 0/1
        cnt = jnp.sum(m2).astype(jnp.int32)

        @pl.when(cnt > 0)
        def _():
            rank2 = _rank2(m2, lt_ref, l8_ref)
            cur = cur_ref[0]
            base_blk = cur // LANES
            off = cur - base_blk * LANES
            pos3 = (rank2 + off.astype(jnp.float32))[:, :, None]
            m3 = m2[:, :, None] > 0.0
            lane3 = jax.lax.broadcasted_iota(
                jnp.int32, (8, LANES, LANES), 2
            ).astype(jnp.float32)
            lanemask = (
                jax.lax.broadcasted_iota(jnp.int32, (p_pad, LANES), 1)
                < off
            )
            idx_last = (off + cnt - 1) // LANES

            cfull = _chunk_rows(vals_ref[0])          # [4*P, TILE] f32

            for b in range(WIN):
                @pl.when(idx_last >= b)
                def _(b=b):
                    # P[i, l] = ray-lane i lands at window slot b*128+l
                    pb = jnp.where(
                        (pos3 == lane3 + jnp.float32(b * LANES)) & m3,
                        1.0, 0.0,
                    ).reshape(TILE, LANES)
                    ck = jax.lax.dot_general(
                        cfull, pb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                  # [4*P, 128]
                    blk = _recombine(ck, p_pad)        # [P, 128] i32
                    if b == 0:
                        blk = jnp.where(lanemask, resid_ref[:, :], blk)
                    buf[b, :, :] = blk

            cp = pltpu.make_async_copy(
                buf, packed_ref.at[pl.ds(base_blk, WIN), :, :], sem
            )
            cp.start()
            cp.wait()

            # residual: the partial block at the new fill point (select
            # with where — untouched buf blocks hold stale data)
            idx = (cur + cnt) // LANES - base_blk      # 0..WIN-1
            acc = jnp.zeros((p_pad, LANES), jnp.int32)
            for b in range(WIN):
                acc = jnp.where(idx == b, buf[b, :, :], acc)
            resid_ref[:, :] = acc
            cur_ref[0] = cur + cnt

    return kernel


def _make_expand_kernel(out_pad: int):
    def kernel(base_ref, lt_ref, l8_ref, bits_ref, narrow_ref, out_ref,
               wbuf, sem, acc_ref):
        t = pl.program_id(0)
        m2 = bits_ref[0]
        cnt = jnp.sum(m2).astype(jnp.int32)

        @pl.when(cnt > 0)
        def _():
            base = base_ref[t]
            base_blk = base // LANES
            off = base - base_blk * LANES

            cp = pltpu.make_async_copy(
                narrow_ref.at[pl.ds(base_blk, WIN), :, :], wbuf, sem
            )
            cp.start()

            rank2 = _rank2(m2, lt_ref, l8_ref)
            pos3 = (rank2 + off.astype(jnp.float32))[:, :, None]
            m3 = m2[:, :, None] > 0.0
            lane3 = jax.lax.broadcasted_iota(
                jnp.int32, (8, LANES, LANES), 2
            ).astype(jnp.float32)
            idx_last = (off + cnt - 1) // LANES

            cp.wait()

            # pl.when-gated scratch accumulation (the regroup unpack
            # kernel's pattern): dead window blocks skip their dots
            # entirely — a tile's survivors span idx_last+1 (usually
            # 1-2) of the WIN blocks, not all 9
            acc_ref[:, :] = jnp.zeros((4 * out_pad, TILE), jnp.float32)
            for b in range(WIN):
                @pl.when(idx_last >= b)
                def _(b=b):
                    cb = _chunk_rows(wbuf[b])          # [4*OP, 128] f32
                    pb = jnp.where(
                        (pos3 == lane3 + jnp.float32(b * LANES)) & m3,
                        1.0, 0.0,
                    ).reshape(TILE, LANES)
                    part = jax.lax.dot_general(
                        cb, pb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                  # [4*OP, TILE]
                    acc_ref[:, :] = acc_ref[:, :] + part

            out_ref[0] = _recombine(acc_ref[:, :], out_pad)

    return kernel


def _as_i32(x):
    if x.dtype == jnp.int32:
        return x
    if x.dtype == jnp.bool_:
        return x.astype(jnp.int32)
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _from_i32(x, dtype):
    if dtype == jnp.int32:
        return x
    if dtype == jnp.bool_:
        return x != 0
    return jax.lax.bitcast_convert_type(x, dtype)


def _leaves_to_planes(leaves):
    """Flatten [n]/[n,k] leaves into a list of [n] i32 planes + specs
    to invert the mapping. Bitcast to i32 happens BEFORE any slice so
    no f32 value ever rides an XLA copy: TPU f32 copies (stack/concat
    fusions) flush denormals and canonicalize sNaNs (measured — a
    [n,3] f32 stack turned 0x802b962a into 0x80000000), which would
    break this module's bit-exactness contract."""
    planes, specs = [], []
    for leaf in leaves:
        xi = _as_i32(leaf)
        if leaf.ndim == 1:
            planes.append(xi)
            specs.append((1, leaf.dtype))
        else:
            for j in range(leaf.shape[1]):
                planes.append(xi[:, j])
            specs.append((leaf.shape[1], leaf.dtype))
    return planes, specs


def _planes_to_leaves(planes, specs):
    """Inverse of _leaves_to_planes: stack in the INT domain, bitcast
    back to the leaf dtype only as the very last step (see above)."""
    leaves, i = [], 0
    for width, dtype in specs:
        if width == 1:
            leaves.append(_from_i32(planes[i], dtype))
        else:
            leaves.append(_from_i32(
                jnp.stack([planes[i + j] for j in range(width)], axis=-1),
                dtype,
            ))
        i += width
    return leaves


def _consts():
    lt128 = jnp.asarray(
        np.tril(np.ones((LANES, LANES), np.float32), k=-1).T
    )  # lt128[c', c] = c' < c
    l8 = jnp.asarray(np.tril(np.ones((8, 8), np.float32), k=-1))
    return lt128, l8


def _pad8(p):
    return -(-p // 8) * 8


def compact_state(leaves, alive, cap: int, interpret: bool = False):
    """Pack the alive lanes of a full-width state to the prefix of a
    [cap]-lane buffer, in stable lane order, bit-exactly.

    leaves: [n] or [n, k] arrays (any fp/int/bool dtype); alive: [n]
    bool with sum(alive) <= cap (caller-guaranteed by the phase-A
    loop condition); cap % 128 == 0, n % 1024 == 0. Returns leaves of
    the same structure at width cap. Slack lanes (beyond the survivor
    count) are UNSPECIFIED — mask `alive` with arange(cap) < total."""
    n = alive.shape[0]
    assert n % TILE == 0 and cap % LANES == 0
    nt = n // TILE
    cap_blocks = cap // LANES
    planes, specs = _leaves_to_planes(leaves)
    p_pad = _pad8(len(planes))
    while len(planes) < p_pad:
        planes.append(jnp.zeros(n, jnp.int32))
    vals = jnp.stack(planes)                     # [P, n]
    vals = vals.reshape(p_pad, nt, TILE).transpose(1, 0, 2)
    bits = alive.astype(jnp.float32).reshape(nt, 8, LANES)
    lt128, l8 = _consts()

    packed = pl.pallas_call(
        _make_compact_kernel(p_pad),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((LANES, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad, TILE), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (cap_blocks + SLACK, p_pad, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((WIN, p_pad, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((p_pad, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(lt128, l8, bits, vals)

    out = packed[:cap_blocks].transpose(1, 0, 2).reshape(p_pad, cap)
    return _planes_to_leaves(list(out), specs)


def expand_outputs(narrow_leaves, alive, fallback_leaves,
                   interpret: bool = False):
    """Scatter narrow-loop results back to full width: lanes alive at
    the boundary take the narrow value from their packed slot (slots
    re-derived from the SAME alive bits), everyone else keeps the
    fallback (their state was final at the boundary)."""
    n = alive.shape[0]
    nt = n // TILE
    planes, specs = _leaves_to_planes(narrow_leaves)
    out_pad = _pad8(len(planes))
    cap = planes[0].shape[0]
    cap_blocks = cap // LANES
    while len(planes) < out_pad:
        planes.append(jnp.zeros(cap, jnp.int32))
    narrow = jnp.stack(planes)                   # [OP, cap]
    narrow = narrow.reshape(out_pad, cap_blocks, LANES).transpose(1, 0, 2)
    narrow = jnp.pad(narrow, ((0, SLACK), (0, 0), (0, 0)))
    counts = alive.reshape(nt, TILE).sum(axis=1).astype(jnp.int32)
    bases = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    bits = alive.astype(jnp.float32).reshape(nt, 8, LANES)
    lt128, l8 = _consts()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((LANES, LANES), lambda t, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda t, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, out_pad, TILE), lambda t, b: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN, out_pad, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((4 * out_pad, TILE), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _make_expand_kernel(out_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, out_pad, TILE), jnp.int32),
        interpret=interpret,
    )(bases, lt128, l8, bits, narrow)

    planes_full = list(out.transpose(1, 0, 2).reshape(out_pad, n))
    # merge in the INT domain (an f32 select/copy would flush denormal
    # radiance values — see _leaves_to_planes)
    fb_planes, _ = _leaves_to_planes(fallback_leaves)
    merged_planes = [
        jnp.where(alive, exp, fb)
        for exp, fb in zip(planes_full, fb_planes)
    ]
    return _planes_to_leaves(merged_planes, specs)
