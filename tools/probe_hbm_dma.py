"""Probe: can a Pallas TPU kernel DMA a VMEM scratch window into an
HBM-resident output at a DYNAMIC row offset on the axon platform?

Round 3 found manual make_async_copy FROM HBM (reads) faults through the
axon tunnel; the regroup pack kernel needs the write direction. This
probe validates:
  probe 1: static-offset VMEM->HBM copy per grid step
  probe 2: dynamic-offset (SMEM cursor) VMEM->HBM copy per grid step

Run: python tools/probe_hbm_dma.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 8, 128
N_TILES = 4


def probe(dynamic: bool):
    def kernel(x_ref, out_ref, buf, sem, cur_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            cur_ref[0] = 0

        buf[:, :] = x_ref[:, :] * 2.0
        if dynamic:
            base = cur_ref[0]
        else:
            base = t * ROWS
        cp = pltpu.make_async_copy(
            buf, out_ref.at[pl.ds(base, ROWS), :], sem
        )
        cp.start()
        cp.wait()
        # dynamic cursor advances by a data-dependent amount (here the
        # popcount of a trivial predicate = ROWS, but via a traced value)
        cur_ref[0] = base + jnp.sum(
            (x_ref[0, :] == x_ref[0, :]).astype(jnp.int32)
        ) // (LANES // ROWS)

    x = jnp.arange(N_TILES * ROWS * LANES, dtype=jnp.float32).reshape(-1, LANES)
    out = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N_TILES * ROWS, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(x)
    got = np.asarray(out)
    want = np.asarray(x) * 2.0
    ok = np.array_equal(got, want)
    print(f"probe dynamic={dynamic}: {'PASS' if ok else 'FAIL'}")
    return ok


def main():
    print("backend:", jax.default_backend())
    ok1 = probe(False)
    ok2 = probe(True)
    sys.exit(0 if (ok1 and ok2) else 1)


if __name__ == "__main__":
    main()
