"""Wall-clock formatting for the progress/ETC UX (reference: src/utils.jl:10-32),
plus the device fence every timing site must use on the axon TPU platform."""

from __future__ import annotations


def fence(x):
    """Force `x`'s producing computation to COMPLETE, not just enqueue.

    On the experimental axon TPU platform, `jax.block_until_ready` can
    return before the computation has run at all (measured: 2.7 ms
    "blocked" vs 14.5 s real work forced by a 4-byte readback — the
    dispatch is lazy and the ready-event is local). A one-element
    device->host transfer is the only reliable fence: the platform must
    materialize the buffer to serve any part of it. Costs one tunnel
    round-trip (~27 ms measured), so timing loops should fence once per
    measured region, not per op. Returns x unchanged."""
    import jax
    import numpy as np

    jax.block_until_ready(x)
    for leaf in jax.tree.leaves(x):
        # one element from EVERY leaf: different leaves may come from
        # different dispatches, and a local ready-event proves nothing
        # about the others. Indexed directly (no ravel: a full-buffer
        # ravel dispatches an extra whole-array copy inside the
        # measured region). Zero-size leaves have no element to read;
        # non-array leaves (Python scalars) need no fence.
        if getattr(leaf, "size", 1) == 0:
            continue
        try:
            np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])
        except TypeError:
            np.asarray(leaf)
    return x


def format_seconds(seconds: float) -> str:
    """h:mm:ss.mmm, matching the reference CLI output format."""
    if seconds != seconds or seconds < 0:  # NaN / negative guard
        seconds = 0.0
    total_ms = int(round(seconds * 1000))
    ms = total_ms % 1000
    total_s = total_ms // 1000
    s = total_s % 60
    m = (total_s // 60) % 60
    h = total_s // 3600
    return f"{h}:{m:02d}:{s:02d}.{ms:03d}"
