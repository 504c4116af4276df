"""Probe 3: remaining Mosaic primitives the regroup pack kernel needs.

  1. SMEM scratch store at a DYNAMIC index (per-super cursors, s = grid id)
  2. VMEM scratch read/write at dynamic leading index (per-super residual)
  3. jnp.cumsum on a [1024] vector (cheap rank; fallback = L@m matmul)
  4. 3-D ANY-space output DMA window out.at[pl.ds(base, K), :, :]

Run: python tools/probe_regroup_prims.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 6


def probe_smem_dynamic():
    def kernel(x_ref, out_ref, cur_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            for i in range(S):
                cur_ref[i] = 0

        cur_ref[s] = cur_ref[s] + jnp.sum(x_ref[0].astype(jnp.int32)) + s

        @pl.when(s == S - 1)
        def _():
            for i in range(S):
                out_ref[i] = cur_ref[i]

    x = jnp.ones((S, 8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((S,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((S,), jnp.int32)],
    )(x)
    want = np.array([1024 + i for i in range(S)])
    ok = np.array_equal(np.asarray(out), want)
    print(f"probe 1 (SMEM dynamic store): {'PASS' if ok else 'FAIL'} {out}")
    return ok


def probe_resid():
    def kernel(x_ref, out_ref, resid_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            resid_ref[:, :, :] = jnp.zeros((S, 8, 128), jnp.float32)

        prev = resid_ref[pl.ds(s, 1)][0]          # [8,128] dynamic read
        resid_ref[pl.ds(s, 1)] = (prev + x_ref[0] * (s + 1))[None]

        @pl.when(s == S - 1)
        def _():
            out_ref[:, :, :] = resid_ref[:, :, :]

    x = jnp.ones((S, 8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, 8, 128), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, 8, 128), jnp.float32)],
    )(x)
    got = np.asarray(out)
    want = np.tile(np.arange(1, S + 1)[:, None, None], (1, 8, 128)).astype(np.float32)
    ok = np.array_equal(got, want)
    print(f"probe 2 (VMEM dynamic resid): {'PASS' if ok else 'FAIL'}")
    return ok


def probe_cumsum():
    def kernel(x_ref, out_ref):
        out_ref[0, :] = jnp.cumsum(x_ref[0, :])

    x = jnp.ones((1, 1024), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
        )(x)
        ok = np.array_equal(np.asarray(out)[0], np.arange(1, 1025))
        print(f"probe 3 (cumsum [1024]): {'PASS' if ok else 'FAIL'}")
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"probe 3 (cumsum [1024]): UNSUPPORTED ({type(e).__name__})")
        return None  # informational


def probe_dma3d():
    K = 3

    def kernel(x_ref, out_ref, buf, sem, cur_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            cur_ref[0] = 0

        buf[:, :, :] = x_ref[0] + 100.0 * t
        base = cur_ref[0]
        cp = pltpu.make_async_copy(buf, out_ref.at[pl.ds(base, K), :, :], sem)
        cp.start()
        cp.wait()
        # advance by a data-dependent, deliberately un-round amount
        cur_ref[0] = base + 1 + jnp.sum(
            (x_ref[0, 0, :] > 1e30).astype(jnp.int32))

    N = 4
    x = np.random.default_rng(2).random((N, K, 8, 128)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, K, 8, 128), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N + K, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(jnp.asarray(x).reshape(N, K, 8, 128))
    got = np.asarray(out)
    ok = True
    # windows at offsets 0,1,2,3: later windows overwrite earlier tails
    for t in range(N):
        keep = 1 if t < N - 1 else K
        if not np.array_equal(got[t:t + keep], (x[t] + 100.0 * t)[:keep]):
            ok = False
            print(f"  window {t} mismatch")
    print(f"probe 4 (3-D ANY DMA window): {'PASS' if ok else 'FAIL'}")
    return ok


def main():
    print("backend:", jax.default_backend())
    res = []
    for name, fn in (("1", probe_smem_dynamic), ("2", probe_resid),
                     ("3", probe_cumsum), ("4", probe_dma3d)):
        try:
            res.append(fn())
        except Exception as e:  # noqa: BLE001
            print(f"probe {name}: EXCEPTION {type(e).__name__}: {str(e)[:200]}")
            res.append(False)
    hard = [r for r in res if r is not None]
    sys.exit(0 if all(hard) else 1)


if __name__ == "__main__":
    main()
