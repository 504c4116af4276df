"""Simulate supercluster-centric ray regrouping on real bounce rays.

The measured 12.9x row amplification (tools/row_union_stats.py: rays
visit 19.7 clusters, 128-lane rows pay 254) is geometric — diffuse
bounce directions diverge, so no sort key packs ray cluster-footprints
into rows (all 6 candidate keys tie or lose to the current one). The
architectural fix is to invert the loop: instead of rows paying the
UNION of their lanes' clusters, gather rays into rows BY supercluster
so every lane in a row wants the same supercluster.

This tool replays that design on the /tmp/rowstats dump and reports
the projected (cluster, row) MXU-pass count vs the current kernel's,
under two best-t models:
  final-t  : per-ray t from the converged hit (optimistic: assumes
             perfect front-to-back tightening, same model that gave
             lane-visits 19.7)
  inf-t    : no best-t culling at all (pessimistic upper bound: the
             regrouped kernel's first pass has no t yet)
A practical kernel lands between the two (process supers front-to-back
per ray in waves, re-culling between waves).

Usage: python tools/regroup_sim.py [npz] [sup]
"""

from __future__ import annotations

import sys

import numpy as np

PRIMS_PER_CLUSTER = 64
SUPER = 128
LANES = 128
BLOCK = 1024
ROWS = 8


def ray_cluster_vis(o, d, tcap, cbb, chunk=2048):
    C = len(cbb)
    packed = np.zeros((len(o), (C + 7) // 8), np.uint8)
    for s in range(0, len(o), chunk):
        ob, db, tb = o[s:s+chunk], d[s:s+chunk], tcap[s:s+chunk]
        inv = 1.0 / np.where(db == 0.0, 1e-30, db)
        t0 = (cbb[None, :, 0:3] - ob[:, None, :]) * inv[:, None, :]
        t1 = (cbb[None, :, 3:6] - ob[:, None, :]) * inv[:, None, :]
        enter = np.minimum(t0, t1).max(axis=2)
        exit_ = np.maximum(t0, t1).min(axis=2)
        packed[s:s+chunk] = np.packbits(
            enter <= np.minimum(exit_, tb[:, None]) * 1.00000024, axis=1)
    return packed


def simulate(packed, C, sup, label):
    N = len(packed)
    S = -(-C // sup)
    popcnt = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                           axis=1).sum(1).astype(np.int64)
    lane_visits = popcnt[packed].sum() / N

    # per-(ray, super) incidence: ray visits super s if any cluster bit
    # in s's range is set
    bits = np.unpackbits(packed, axis=1)[:, :C].astype(bool)
    pad = S * sup - C
    bsup = np.pad(bits, ((0, 0), (0, pad))).reshape(N, S, sup)
    ray_sup = bsup.any(axis=2)                      # [N, S]
    pairs = ray_sup.sum()

    # supercluster-centric rows: for super s, its visiting rays are
    # chunked into ceil(n_s / LANES) rows; each row's MXU passes = the
    # union of its lanes' visited clusters WITHIN s. Rays stay in dump
    # (morton-sorted) order inside each super's list.
    total_passes = 0
    total_rows = 0
    for s in range(S):
        rays = np.nonzero(ray_sup[:, s])[0]
        if len(rays) == 0:
            continue
        sub = bsup[rays, s]                          # [n_s, sup]
        n_rows = -(-len(rays) // LANES)
        padn = n_rows * LANES - len(rays)
        sub = np.pad(sub, ((0, padn), (0, 0)))
        row_union = sub.reshape(n_rows, LANES, sup).any(axis=1)
        total_passes += row_union.sum()
        total_rows += n_rows

    # current kernel cost on the same vis matrix: rows of the sorted
    # wavefront (dump order IS the kernel's sorted order) pay the union
    # over 128 lanes of all clusters
    n = N // BLOCK * BLOCK
    rows = bits[:n].reshape(n // LANES, LANES, C).any(axis=1)
    current_passes = rows.sum()

    # cluster-granular regrouping: rows of 128 rays per CLUSTER; every
    # pass is a pure MXU tri-test (no in-kernel cull, no serial scan).
    # passes = sum_c ceil(rays_visiting_c / LANES)
    per_cluster = bits.sum(axis=0)                  # [C]
    cl_pairs = int(per_cluster.sum())
    cl_rows = int(np.ceil(per_cluster / LANES).sum())

    print(f"[{label:8s}] lane-visits {lane_visits:6.1f}  "
          f"ray-super pairs {pairs/N:5.2f}/ray  "
          f"regroup passes {total_passes:8d} (rows {total_rows})  "
          f"current passes {current_passes:8d}  "
          f"speedup x{current_passes/max(total_passes,1):.2f}  ||  "
          f"cluster-rows {cl_rows} ({cl_pairs/N:.1f} pairs/ray, "
          f"x{current_passes/max(cl_rows,1):.2f})", flush=True)
    return total_passes, current_passes


if __name__ == "__main__":
    npz = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rowstats_kitchen_512.npz"
    sup = int(sys.argv[2]) if len(sys.argv) > 2 else SUPER
    z = np.load(npz)
    o, d, t, hit = z["o"], z["d"], z["t"], z["hit"]
    cbb = z["cbb"]
    C = len(cbb)
    print(f"rays {len(o)}  clusters {C}  supers {-(-C // sup)} (sup={sup})",
          flush=True)
    tfin = np.where(hit, t * 1.001, 3.4e38).astype(np.float32)
    tinf = np.full(len(o), 3.4e38, np.float32)
    for label, tc in (("final-t", tfin), ("inf-t", tinf)):
        packed = ray_cluster_vis(o, d, tc, cbb)
        simulate(packed, C, sup, label)
