"""Interpret-mode spike for DESIGN_regroup.md's pack kernel mechanics.

Validates the two load-bearing mechanisms before any Mosaic work:
  1. sequential-grid stream compaction: per-super cursors live in VMEM
     scratch and persist across grid steps (TPU grids are sequential);
  2. full-window writes at dynamic offsets: each (tile, super) writes a
     fixed 1024-slot window of front-compacted values at out[cursor[s]];
     the garbage tail is overwritten by the NEXT tile's window because
     the cursor advances by popcount only (segments over-allocated by
     one window).

The in-register compaction uses the one-hot matmul trick (rank = prefix
sum via lower-triangular ones; P^T @ values does the cross-lane shuffle
the VPU cannot), exactly as the real kernel will on the MXU.

Run: python tools/pack_kernel_proto.py          (CPU, interpret mode)
     python tools/pack_kernel_proto.py --tpu    (real Mosaic lowering)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ON_TPU = "--tpu" in sys.argv
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024          # rays per grid step
S = 4                # superclusters
N_TILES = 4
PLANES = 3           # ray payload planes packed per slot (o.x, d.x, id)


def make_pack(n_tiles: int, seg_cap: int):
    """seg_cap: per-super segment capacity (multiple of TILE, sized
    >= max visitors + TILE for the garbage-tail window)."""

    def kernel(bits_ref, rays_ref, out_ref, cnt_ref, cur_ref, sem):
        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when((t == 0) & (s == 0))
        def _():
            for s0 in range(S):
                cur_ref[s0] = 0

        # one-hot matmul compaction operands
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        lower = (lanes >= cols).astype(jnp.float32)     # L[i,j] = i>=j

        m = bits_ref[0, pl.ds(s, 1), :][0]               # [TILE]
        mf = m.astype(jnp.float32)
        # rank[i] = exclusive prefix popcount = (L @ m)[i] - m[i].
        # HIGHEST precision: DEFAULT runs bf16 passes on TPU and
        # rounds one-hot payloads >= 257 (observed: id 257 -> 256).
        hp = jax.lax.Precision.HIGHEST
        rank = jnp.dot(lower, mf, precision=hp) - mf     # [TILE]
        cnt = jnp.sum(m.astype(jnp.int32))
        # P[i, j] = lane i is the j-th set lane
        P = (
            (rank[:, None] == cols.astype(jnp.float32))
            & (m[:, None] != 0)
        ).astype(jnp.float32)                            # [TILE, TILE]
        vals = rays_ref[0]                               # [TILE, PLANES]
        packed = jnp.dot(P.T, vals, precision=hp)        # [TILE, PLANES]
        base = cur_ref[s]
        # full-window write at ONE dynamic row offset into the flattened
        # [S*seg_cap, PLANES] output; tail is garbage that the next
        # tile's window overwrites (cursor advances by popcount only)
        out_ref[pl.ds(s * seg_cap + base, TILE), :] = packed
        cur_ref[s] = base + cnt

        @pl.when((t == n_tiles - 1) & (s == S - 1))
        def _():
            for s0 in range(S):
                cnt_ref[s0, 0] = cur_ref[s0]

    def pack(bits, rays):
        """bits: [n_tiles, S, TILE] int32; rays: [n_tiles, TILE, PLANES]."""
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            # tile-major order (t outer, s inner) is what makes the
            # garbage-tail overwrite sound: each super's cursor only
            # advances, and the next tile's window overwrites the tail
            grid=(n_tiles, S),
            in_specs=[
                pl.BlockSpec((1, S, TILE), lambda t, s: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE, PLANES), lambda t, s: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                # whole output resident: every step writes its own
                # dynamic windows (validates RMW-free full-window writes)
                pl.BlockSpec((S * seg_cap, PLANES), lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1), lambda t, s: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.SMEM((S,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out, cnt = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((S * seg_cap, PLANES), jnp.float32),
                jax.ShapeDtypeStruct((S, 1), jnp.int32),
            ],
            interpret=not ON_TPU,
        )(bits, rays)
        return out.reshape(S, seg_cap, PLANES), cnt

    return pack


def main():
    rng = np.random.default_rng(0)
    n = N_TILES * TILE
    # ~12% density like real (ray, super) incidence
    bits = (rng.random((N_TILES, S, TILE)) < 0.12).astype(np.int32)
    rays = rng.normal(size=(N_TILES, TILE, PLANES)).astype(np.float32)
    rays[..., PLANES - 1] = np.arange(n).reshape(N_TILES, TILE)  # ray id

    seg_cap = int(bits.sum(axis=(0, 2)).max()) + TILE
    seg_cap = -(-seg_cap // TILE) * TILE
    pack = make_pack(N_TILES, seg_cap)
    out, cnt = jax.jit(pack)(jnp.asarray(bits), jnp.asarray(rays))
    out, cnt = np.asarray(out), np.asarray(cnt)[:, 0]

    # reference: per super, rays with the bit set, in ray order
    flat_bits = bits.transpose(1, 0, 2).reshape(S, n)
    flat_rays = rays.reshape(n, PLANES)
    ok = True
    for s in range(S):
        want_ids = np.nonzero(flat_bits[s])[0]
        got = out[s, : len(want_ids)]
        if cnt[s] != len(want_ids):
            print(f"super {s}: count {cnt[s]} != {len(want_ids)}")
            ok = False
            continue
        if not np.array_equal(got[:, PLANES - 1].astype(np.int64), want_ids):
            print(f"super {s}: id order mismatch")
            ok = False
            continue
        if not np.allclose(got, flat_rays[want_ids]):
            print(f"super {s}: payload mismatch")
            ok = False
    print("counts per super:", cnt.tolist(), "seg_cap", seg_cap)
    print("PACK PROTO", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
