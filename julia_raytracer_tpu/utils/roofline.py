"""Roofline / MFU accounting for the bench surface.

The reference publishes no utilization numbers (BASELINE.md); this module
makes "fast" falsifiable by relating measured wall-clock to hardware
peaks via XLA's compiled cost analysis.

Honest-labeling notes baked into the emitted dicts:
- `flops` comes from XLA's cost analysis of the compiled per-sample
  kernel. On TPU the BVH/cluster intersectors are Pallas custom calls
  whose flops XLA does NOT model, so `mfu` is a LOWER bound on true
  utilization there (the JSON says so via `mfu_note`).
- A path tracer is gather/branch-heavy VPU work, not MXU matmuls; the
  interesting roofline axis is usually HBM bandwidth (`hbm_util`), also
  reported from cost analysis `bytes accessed`.

Peaks default to TPU v5e (v5 lite: 197 TFLOP/s bf16 MXU, 819 GB/s HBM)
and are overridable via JRT_PEAK_TFLOPS / JRT_PEAK_HBM_GBS for other
hardware. On the CPU backend the peaks are meaningless; callers should
only attach roofline numbers on TPU.
"""

from __future__ import annotations

import os

V5E_PEAK_FLOPS = float(os.environ.get("JRT_PEAK_TFLOPS", "197")) * 1e12
V5E_PEAK_HBM = float(os.environ.get("JRT_PEAK_HBM_GBS", "819")) * 1e9

_MFU_NOTE = (
    "flops/bytes from XLA cost analysis of the compiled per-sample kernel; "
    "Pallas custom-call (intersector) flops are NOT modeled by XLA, so mfu "
    "is a lower bound; peaks are TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM)"
)


def compiled_cost(compiled) -> dict:
    """flops + bytes accessed from a jax compiled object; {} if opaque."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        return {"flops": flops, "bytes_accessed": byts}
    except Exception:
        return {}


def roofline(flops_total: float, bytes_total: float, wall_s: float) -> dict:
    """Utilization dict for `flops_total`/`bytes_total` of work done in
    `wall_s` seconds on one chip."""
    out = {}
    if wall_s <= 0:
        return out
    if flops_total:
        achieved = flops_total / wall_s
        out["achieved_gflops"] = round(achieved / 1e9, 2)
        out["mfu"] = round(achieved / V5E_PEAK_FLOPS, 6)
    if bytes_total:
        bw = bytes_total / wall_s
        out["hbm_gbs"] = round(bw / 1e9, 2)
        out["hbm_util"] = round(bw / V5E_PEAK_HBM, 4)
    if out:
        out["mfu_note"] = _MFU_NOTE
    return out
