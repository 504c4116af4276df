"""ctypes bridge to the native (C++/OpenMP) host-preprocessing kernels.

The cluster-table build is the hottest host-side step (kitchen 1.44M
prims: ~7 s in chunked numpy on 4 cores; the 8M-prim hybrid canopy soup
~40 s). native/cluster_tables.cpp computes the identical math (double
per prim, f32 stores) with OpenMP across clusters.

The shared object is compiled on demand with g++ and cached next to the
source; anything failing (no compiler, unexpected platform) falls back
to the numpy path transparently. Env JRT_NO_NATIVE=1 forces the
fallback (used by the parity test).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("JRT_NO_NATIVE") == "1":
            return None
        src = os.path.join(_SRC_DIR, "cluster_tables.cpp")
        so = os.path.join(_SRC_DIR, "libcluster_tables.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                # per-process tmp name: concurrent builders (multihost,
                # parallel pytest) must not interleave g++ output into a
                # shared file before the atomic promote
                tmp = f"{so}.{os.getpid()}.tmp"
                try:
                    subprocess.run(
                        ["g++", "-O3", "-march=native", "-fopenmp",
                         "-shared", "-fPIC", "-o", tmp, src],
                        check=True, capture_output=True, timeout=120,
                    )
                    os.replace(tmp, so)
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
            lib = ctypes.CDLL(so)
            lib.build_cluster_tables.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.build_cluster_tables.restype = None
            lib.world_expand_permute.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ]
            lib.world_expand_permute.restype = None
            _lib = lib
        except Exception as e:  # pragma: no cover - environment-dependent
            import sys

            print(f"note: native cluster tables unavailable ({e}); "
                  "using numpy path", file=sys.stderr)
            _lib = None
        return _lib


def build_cluster_tables_native(pv32: np.ndarray, q: int, c: int,
                                tfm: np.ndarray, nrm4: np.ndarray,
                                bbox: np.ndarray) -> bool:
    """Fill tfm [c,12,TRIS] / nrm4 rows 0..2 / bbox [c,8] in place from
    pv32 [q,4,3] f32 (C-contiguous). Returns False if the native library
    is unavailable (caller runs the numpy path)."""
    lib = _load()
    if lib is None:
        return False
    assert pv32.dtype == np.float32 and pv32.flags.c_contiguous
    assert tfm.flags.c_contiguous and nrm4.flags.c_contiguous
    assert bbox.flags.c_contiguous
    fp = ctypes.POINTER(ctypes.c_float)
    lib.build_cluster_tables(
        pv32.ctypes.data_as(fp), ctypes.c_int64(q), ctypes.c_int64(c),
        tfm.ctypes.data_as(fp), nrm4.ctypes.data_as(fp),
        bbox.ctypes.data_as(fp),
    )
    return True


def world_expand_permute_native(shape_verts: np.ndarray, frames: np.ndarray,
                                src_prim: np.ndarray, src_inst: np.ndarray,
                                out: np.ndarray) -> bool:
    """out[k] = shape_verts[src_prim[k]] @ R[src_inst[k]] + t[...] in one
    streaming OpenMP pass (row-vector convention, frames [I,4,3] with
    rows 0..2 = R and row 3 = t). Returns False when the native library
    is unavailable."""
    lib = _load()
    if lib is None:
        return False
    assert shape_verts.dtype == np.float32 and shape_verts.flags.c_contiguous
    assert frames.dtype == np.float32 and frames.flags.c_contiguous
    assert src_prim.dtype == np.int32 and src_prim.flags.c_contiguous
    assert src_inst.dtype == np.int32 and src_inst.flags.c_contiguous
    assert out.dtype == np.float32 and out.flags.c_contiguous
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.world_expand_permute(
        shape_verts.ctypes.data_as(fp), frames.ctypes.data_as(fp),
        src_prim.ctypes.data_as(ip), src_inst.ctypes.data_as(ip),
        ctypes.c_int64(len(out)), out.ctypes.data_as(fp),
    )
    return True
