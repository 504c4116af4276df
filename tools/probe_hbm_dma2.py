"""Probe 2: DMA window writes at UNALIGNED dynamic offsets.

The regroup pack cursor advances by per-(tile,super) popcounts, which are
not multiples of 8 (sublane) or 128 (lane). Three candidate layouts:

  A. out [N_rows, PLANES] (slots on sublanes): window [TILE, PLANES] at
     arbitrary row offset.
  B. out [PLANES, N_lanes] (slots on lanes): window [PLANES, TILE] at
     arbitrary lane offset.

Run: python tools/probe_hbm_dma2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
PLANES = 9
N_TILES = 4


def probe_rows():
    """Layout A: slots on sublanes, arbitrary row offset."""
    # cursor advances by a data-dependent odd amount (deliberately
    # unaligned): count of lanes with value < 0.7 in the first row
    def kernel(x_ref, out_ref, cnt_ref, buf, sem, cur_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            cur_ref[0] = 0

        buf[:, :] = x_ref[0] + 1000.0 * t
        base = cur_ref[0]
        cp = pltpu.make_async_copy(
            buf, out_ref.at[pl.ds(base, TILE), :], sem
        )
        cp.start()
        cp.wait()
        adv = jnp.sum((x_ref[0, :, 0] < 0.7).astype(jnp.int32))
        cur_ref[0] = base + adv

        @pl.when(t == N_TILES - 1)
        def _():
            cnt_ref[0] = cur_ref[0] + adv - adv  # final cursor

    x = np.random.default_rng(0).random((N_TILES, TILE, PLANES)).astype(np.float32)
    out, cnt = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((1, TILE, PLANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((N_TILES * TILE + TILE, PLANES), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, PLANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(jnp.asarray(x))
    got = np.asarray(out)
    # reference: windows at cumulative unaligned offsets
    offs = [0]
    for t in range(N_TILES):
        offs.append(offs[-1] + int((x[t, :, 0] < 0.7).sum()))
    ok = True
    for t in range(N_TILES):
        lo = offs[t]
        w = x[t] + 1000.0 * t
        # only the FIRST adv rows of each window survive (next window
        # overwrites the tail) except the last window (fully intact)
        keep = offs[t + 1] - offs[t] if t < N_TILES - 1 else TILE
        if not np.array_equal(got[lo:lo + keep], w[:keep]):
            print(f"  window {t}: mismatch (offset {lo}, keep {keep})")
            ok = False
    print(f"probe A (rows, unaligned): {'PASS' if ok else 'FAIL'} "
          f"(offsets {offs})")
    return ok


def probe_lanes():
    """Layout B: slots on lanes, arbitrary lane offset."""
    def kernel(x_ref, out_ref, buf, sem, cur_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            cur_ref[0] = 0

        buf[:, :] = x_ref[0] + 1000.0 * t
        base = cur_ref[0]
        cp = pltpu.make_async_copy(
            buf, out_ref.at[:, pl.ds(base, TILE)], sem
        )
        cp.start()
        cp.wait()
        adv = jnp.sum((x_ref[0, 0, :] < 0.7).astype(jnp.int32))
        cur_ref[0] = base + adv

    x = np.random.default_rng(1).random((N_TILES, PLANES, TILE)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((1, PLANES, TILE), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((PLANES, N_TILES * TILE + TILE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((PLANES, TILE), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(jnp.asarray(x))
    got = np.asarray(out)
    offs = [0]
    for t in range(N_TILES):
        offs.append(offs[-1] + int((x[t, 0, :] < 0.7).sum()))
    ok = True
    for t in range(N_TILES):
        lo = offs[t]
        w = x[t] + 1000.0 * t
        keep = offs[t + 1] - offs[t] if t < N_TILES - 1 else TILE
        if not np.array_equal(got[:, lo:lo + keep], w[:, :keep]):
            print(f"  window {t}: mismatch (offset {lo}, keep {keep})")
            ok = False
    print(f"probe B (lanes, unaligned): {'PASS' if ok else 'FAIL'} "
          f"(offsets {offs})")
    return ok


def main():
    print("backend:", jax.default_backend())
    oks = []
    for name, fn in (("A", probe_rows), ("B", probe_lanes)):
        try:
            t0 = time.time()
            oks.append(fn())
            print(f"  ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 - probe reports and moves on
            print(f"probe {name}: EXCEPTION {type(e).__name__}: {e}")
            oks.append(False)
    sys.exit(0 if all(oks) else 1)


if __name__ == "__main__":
    main()
