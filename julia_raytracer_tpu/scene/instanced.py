"""Two-level instanced scene build (host side).

The reference keeps a scene BVH over instances and per-shape BVHs,
transforming each ray into shape space at instance leaves
(src/bvh.jl:306-371, :493-520). Flattening (scene/flatten.py) erases
that sharing: ecosys (12,755 instances over 141 shapes) explodes from
620k shape primitives to 16.8M world primitives and ~2 GB of device
tables.

The TPU-native two-level design keeps each shape's cluster tables ONCE,
in shape space, and models instancing as WORK ITEMS: one (instance,
shape-supercluster) pair per item, with a world-space bbox for culling.
The instanced Pallas kernel streams per-item tables + the instance's
inverse transform via scalar-prefetch index maps, transforms each ray
block into shape space in-register (t is preserved because directions
are not renormalized: M(o + t d) = Mo + t Md), and merges hits against
the running best-t. Eval-side prim arrays hold the shape-space
primitives in the same (morton-ordered, cluster-padded) layout the
kernel's emitted prim ids index.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from julia_raytracer_tpu.ops.bvh import _morton3
from julia_raytracer_tpu.scene.flatten import FlatScene
from julia_raytracer_tpu.scene.types import INVALID_ID


@dataclass
class InstancedTables:
    """Host-side products of the instanced build (numpy; device upload
    happens in the intersector factory)."""

    sup: int  # clusters per supercluster (work-item granularity)
    # concatenated per-shape cluster tables (shape space)
    tab: np.ndarray  # f32 [total_sup, sup, 16, TRIS] transforms+normals
    bbox: np.ndarray  # f32 [total_sup, sup, 8] cluster bboxes
    # work items (one per live (instance, supercluster) pair)
    wi_sup: np.ndarray  # i32 [Nis] global supercluster id
    wi_inst: np.ndarray  # i32 [Nis] instance id
    wi_bbox: np.ndarray  # f32 [Nis, 6] world bbox
    # per-instance transform rows:
    # [0:9] inverse rotation Ri (row-major; obj = world @ Ri + oi)
    # [9:12] oi, [12:21] forward rotation R (normals: n_w = n_s @ R)
    inst_rows: np.ndarray  # f32 [I, 24]
    # eval-side layout
    n_prims: int  # padded concat prim count (kernel prim-id space)
    shape_sup_offset: np.ndarray  # i64 [S+1]


def _shape_morton_order(verts: np.ndarray) -> np.ndarray:
    """Within-shape Morton order of prim centroids (cluster coherence)."""
    if len(verts) <= 1:
        return np.arange(len(verts), dtype=np.int64)
    cen = verts.mean(axis=1)
    lo = cen.min(axis=0)
    ext = np.maximum(cen.max(axis=0) - lo, 1e-30)
    qv = np.clip(((cen - lo) / ext) * ((1 << 21) - 1), 0, (1 << 21) - 1)
    return np.argsort(_morton3(qv.astype(np.uint64)), kind="stable")


def build_instanced_tables(
    scene, flat: FlatScene, sup: int = 32, instance_mask=None
) -> tuple[InstancedTables, dict]:
    """Build instanced cluster tables + work items from a non-expanded
    flatten (flatten_scene(expand_prims=False)).

    Returns (tables, eval_arrays) where eval_arrays holds the
    morton-ordered cluster-padded shape-space prim arrays
    (prim_verts/prim_vidx/prim_flags) the kernel's prim ids index.

    instance_mask (bool [n_instances], optional) restricts WORK ITEMS to
    the masked instances (the hybrid build flattens the rest to world
    space, scene/instanced.py select_flatten_shapes); tables and eval
    arrays still cover every shape so any prim id remains resolvable.
    """
    from julia_raytracer_tpu.ops.pallas_cluster import (
        PRIMS_PER_CLUSTER, TRIS, build_cluster_tables,
    )

    g = flat.geometry
    off = g.shape_prim_offset
    assert off is not None, "need flatten_scene(expand_prims=False)"
    S = flat.n_shapes
    I = flat.n_instances

    tab_parts, bbox_parts = [], []
    pv_parts, pvi_parts, pfl_parts = [], [], []
    shape_sup_offset = np.zeros(S + 1, np.int64)
    # per-shape supercluster bboxes in shape space (for work items)
    shape_sup_bbox: list[np.ndarray] = []
    prim_base = 0
    NOHIT = np.float32(3e38)

    for sid in range(S):
        lo, hi = int(off[sid]), int(off[sid + 1])
        p = hi - lo
        if p == 0:
            shape_sup_offset[sid + 1] = shape_sup_offset[sid]
            shape_sup_bbox.append(np.zeros((0, 6), np.float32))
            continue
        order = _shape_morton_order(g.prim_verts[lo:hi])
        verts = g.prim_verts[lo:hi][order]
        tfm, nrm, cbbox, c = build_cluster_tables(verts)
        c_pad = -(-c // sup) * sup
        if c_pad > c:
            pt = np.zeros((c_pad - c, 12, TRIS), np.float32)
            pt[:, 11, :] = 1.0  # never-hit transforms
            tfm = np.concatenate([tfm, pt], axis=0)
            nrm = np.concatenate(
                [nrm, np.zeros((c_pad - c, 4, TRIS), np.float32)], axis=0
            )
            pb = np.zeros((c_pad - c, 8), np.float32)
            pb[:, 0:6] = NOHIT
            cbbox = np.concatenate([cbbox, pb], axis=0)
        ns = c_pad // sup
        tab_parts.append(
            np.concatenate([tfm, nrm], axis=1).reshape(ns, sup, 16, TRIS)
        )
        bbox_parts.append(cbbox.reshape(ns, sup, 8))
        # supercluster shape-space bbox (never-hit padding excluded)
        cb = cbbox.reshape(ns, sup, 8)
        real = cb[:, :, 0] < NOHIT  # [ns, sup]
        blo = np.where(real[..., None], cb[:, :, 0:3], np.inf).min(axis=1)
        bhi = np.where(real[..., None], cb[:, :, 3:6], -np.inf).max(axis=1)
        shape_sup_bbox.append(
            np.concatenate([blo, bhi], axis=1).astype(np.float32)
        )
        shape_sup_offset[sid + 1] = shape_sup_offset[sid] + ns

        # eval arrays in kernel prim-id order (padded to c_pad*64)
        p_pad = c_pad * PRIMS_PER_CLUSTER
        pv = np.zeros((p_pad, 4, 3), np.float32)
        pv[:p] = verts
        pvi = np.zeros((p_pad, 4), np.int32)
        pvi[:p] = g.prim_vidx[lo:hi][order]
        pfl = np.zeros(p_pad, np.int32)
        pfl[:p] = g.prim_flags[lo:hi][order]
        pv_parts.append(pv)
        pvi_parts.append(pvi)
        pfl_parts.append(pfl)
        prim_base += p_pad

    tab = (
        np.concatenate(tab_parts, axis=0)
        if tab_parts
        else np.zeros((0, sup, 16, TRIS), np.float32)
    )
    bbox = (
        np.concatenate(bbox_parts, axis=0)
        if bbox_parts
        else np.zeros((0, sup, 8), np.float32)
    )

    # per-instance transform rows (rigid-or-affine inverse for rays,
    # forward rotation for normals, matching transform_normal's rigid
    # semantics src/math.jl:124-125)
    inst_rows = np.zeros((max(I, 1), 24), np.float32)
    for i in range(I):
        rot = g.inst_frame[i, :3].astype(np.float64)  # world = obj @ rot + org
        org = g.inst_frame[i, 3].astype(np.float64)
        ri = np.linalg.inv(rot)
        inst_rows[i, 0:9] = ri.reshape(-1)
        inst_rows[i, 9:12] = -(org @ ri)
        inst_rows[i, 12:21] = rot.reshape(-1)

    # work items: vectorized per shape over its instances
    inst_shape = g.inst_shape[:I] if I else np.zeros(0, np.int32)
    valid = (inst_shape != INVALID_ID) & (inst_shape >= 0) & (inst_shape < S)
    if instance_mask is not None:
        valid = valid & np.asarray(instance_mask, bool)[:I]
    wi_sup_l, wi_inst_l, wi_bbox_l = [], [], []
    for sid in range(S):
        ns = int(shape_sup_offset[sid + 1] - shape_sup_offset[sid])
        if ns == 0:
            continue
        members = np.nonzero(valid & (inst_shape == sid))[0]
        if len(members) == 0:
            continue
        sb = shape_sup_bbox[sid]  # [ns, 6]
        # 8 corners of each supercluster bbox
        corners = np.stack(
            [
                sb[:, [0, 1, 2]], sb[:, [3, 1, 2]], sb[:, [0, 4, 2]],
                sb[:, [0, 1, 5]], sb[:, [3, 4, 2]], sb[:, [3, 1, 5]],
                sb[:, [0, 4, 5]], sb[:, [3, 4, 5]],
            ],
            axis=1,
        )  # [ns, 8, 3]
        rots = g.inst_frame[members, :3]  # [m, 3, 3]
        orgs = g.inst_frame[members, 3]  # [m, 3]
        wc = np.einsum("nkj,mji->mnki", corners, rots) + orgs[:, None, None, :]
        blo = wc.min(axis=2)  # [m, ns, 3]
        bhi = wc.max(axis=2)
        m = len(members)
        wi_sup_l.append(
            np.tile(
                np.arange(ns, dtype=np.int32) + np.int32(shape_sup_offset[sid]),
                m,
            )
        )
        wi_inst_l.append(np.repeat(members.astype(np.int32), ns))
        wi_bbox_l.append(
            np.concatenate([blo, bhi], axis=-1).reshape(m * ns, 6).astype(np.float32)
        )

    wi_sup = np.concatenate(wi_sup_l) if wi_sup_l else np.zeros(0, np.int32)
    wi_inst = np.concatenate(wi_inst_l) if wi_inst_l else np.zeros(0, np.int32)
    wi_bbox = (
        np.concatenate(wi_bbox_l, axis=0) if wi_bbox_l else np.zeros((0, 6), np.float32)
    )

    tables = InstancedTables(
        sup=sup,
        tab=tab,
        bbox=bbox,
        wi_sup=wi_sup,
        wi_inst=wi_inst,
        wi_bbox=wi_bbox,
        inst_rows=inst_rows,
        n_prims=prim_base,
        shape_sup_offset=shape_sup_offset,
    )
    eval_arrays = dict(
        prim_verts=(
            np.concatenate(pv_parts, axis=0)
            if pv_parts
            else np.zeros((0, 4, 3), np.float32)
        ),
        prim_vidx=(
            np.concatenate(pvi_parts, axis=0)
            if pvi_parts
            else np.zeros((0, 4), np.int32)
        ),
        prim_flags=(
            np.concatenate(pfl_parts) if pfl_parts else np.zeros(0, np.int32)
        ),
    )
    return tables, eval_arrays


def expand_emissive_world_prims(scene, flat: FlatScene):
    """World-space expansion of ONLY the emissive instances' primitives —
    the light-table input for instanced scenes (the full expansion is
    exactly what instancing avoids; lights are always few)."""
    g = flat.geometry
    m = flat.materials
    off = g.shape_prim_offset
    emissive_mat = (
        (np.abs(m.emission).sum(axis=1) > 0) if len(m.emission) else np.zeros(0, bool)
    )
    pv, pin, pfl = [], [], []
    for i in range(flat.n_instances):
        mat = g.inst_material[i]
        sid = g.inst_shape[i]
        if mat < 0 or mat >= len(emissive_mat) or not emissive_mat[mat]:
            continue
        if sid == INVALID_ID or sid < 0 or sid >= flat.n_shapes:
            continue
        lo, hi = int(off[sid]), int(off[sid + 1])
        if hi == lo:
            continue
        rot, org = g.inst_frame[i, :3], g.inst_frame[i, 3]
        world = g.prim_verts[lo:hi] @ rot + org
        pv.append(world.astype(np.float32))
        pin.append(np.full(hi - lo, i, np.int32))
        pfl.append(g.prim_flags[lo:hi])
    if pv:
        return (
            np.concatenate(pv, axis=0),
            np.concatenate(pin),
            np.concatenate(pfl),
        )
    return (
        np.zeros((0, 4, 3), np.float32),
        np.zeros(0, np.int32),
        np.zeros(0, np.int32),
    )


def select_flatten_shapes(flat: FlatScene, budget: int) -> np.ndarray:
    """Pick shapes whose instances the hybrid build should flatten to
    world space: smallest shapes first (the many-instance canopy that
    floods the work-item model with (instance, supercluster) pairs)
    until the flattened world-prim budget is spent. Returns bool [S].

    Rationale: the work-item kernel's per-block cost scales with the
    number of overlapping instance items (ecosys grass: hundreds of
    candidates per 1024-ray block), while the flattened worklist kernel
    culls at world-space supercluster granularity. Big shapes stay
    instanced — flattening them is what two-level instancing avoids
    (the reference's scene-BVH-over-instances, src/bvh.jl:306-371)."""
    g = flat.geometry
    off = g.shape_prim_offset
    S = flat.n_shapes
    I = flat.n_instances
    pp = np.diff(off).astype(np.int64)
    inst_shape = g.inst_shape[:I] if I else np.zeros(0, np.int32)
    valid = (inst_shape != INVALID_ID) & (inst_shape >= 0) & (inst_shape < S)
    cnt = np.bincount(inst_shape[valid], minlength=S)
    world = pp * cnt
    mask = np.zeros(S, bool)
    spent = 0
    for sid in np.argsort(pp, kind="stable"):
        if cnt[sid] == 0 or pp[sid] == 0:
            continue
        if spent + world[sid] > budget:
            continue  # later shapes are bigger per prim but may have
            # few instances — keep scanning for ones that still fit
        mask[sid] = True
        spent += int(world[sid])
    return mask


def build_world_flat(flat: FlatScene, shape_mask: np.ndarray, sup: int = 32):
    """World-expand every instance of the masked shapes into a single
    morton-ordered prim soup for the flattened worklist kernel.

    Returns (world_pv f32 [Pf,4,3], world_inst i32 [Pf],
    remap i32 [Pf]) where remap[k] is the INSTANCED-EVAL-LAYOUT prim id
    (base + within-shape morton position, matching
    build_instanced_tables' eval arrays) — the hybrid intersector maps
    flattened hits back into the shared shape-space eval tables with one
    gather, so shading is identical for both branches."""
    from julia_raytracer_tpu.ops.bvh import _morton3
    from julia_raytracer_tpu.ops.pallas_cluster import PRIMS_PER_CLUSTER

    g = flat.geometry
    off = g.shape_prim_offset
    S = flat.n_shapes
    I = flat.n_instances
    inst_shape = g.inst_shape[:I] if I else np.zeros(0, np.int32)

    # eval prim-id bases: EXACTLY build_instanced_tables' padding walk
    eval_base = np.zeros(S + 1, np.int64)
    for sid in range(S):
        p = int(off[sid + 1] - off[sid])
        if p == 0:
            eval_base[sid + 1] = eval_base[sid]
            continue
        c = max(1, -(-p // PRIMS_PER_CLUSTER))
        c_pad = -(-c // sup) * sup
        eval_base[sid + 1] = eval_base[sid] + c_pad * PRIMS_PER_CLUSTER

    # Pass 1 (cheap): per world prim, the (shape-prim row, instance,
    # eval-remap) triple plus a world CENTROID — computed by transforming
    # per-shape centroids, never materializing the [Pf, 4, 3] verts.
    pr_l, in_l, rm_l, cen_l = [], [], [], []
    for sid in np.nonzero(shape_mask)[0]:
        lo, hi = int(off[sid]), int(off[sid + 1])
        p = hi - lo
        if p == 0:
            continue
        members = np.nonzero(
            (inst_shape == sid)
            & (inst_shape != INVALID_ID)
        )[0]
        if len(members) == 0:
            continue
        order = _shape_morton_order(g.prim_verts[lo:hi])
        inv_order = np.empty(p, np.int64)
        inv_order[order] = np.arange(p)
        eval_ids = (eval_base[sid] + inv_order).astype(np.int32)
        m = len(members)
        cen_s = g.prim_verts[lo:hi].mean(axis=1).astype(np.float32)  # [p,3]
        rots = g.inst_frame[members, :3]  # [m, 3, 3]
        orgs = g.inst_frame[members, 3]  # [m, 3]
        cen_w = (cen_s[None] @ rots) + orgs[:, None, :]  # [m, p, 3]
        pr_l.append(np.tile(np.arange(lo, hi, dtype=np.int32), m))
        in_l.append(np.repeat(members.astype(np.int32), p))
        rm_l.append(np.tile(eval_ids, m))
        cen_l.append(cen_w.reshape(-1, 3))

    if not pr_l:
        return (
            np.zeros((0, 4, 3), np.float32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
        )
    src_prim = np.concatenate(pr_l)
    src_inst = np.concatenate(in_l)
    remap = np.concatenate(rm_l)
    cen = np.concatenate(cen_l, axis=0)

    # global morton order over world centroids (cluster coherence for
    # the worklist kernel — same contract as scene_device's flat build).
    # 10 bits/axis in uint32: clusters hold 64 prims, so 1024^3 cells is
    # ample granularity, and the u32 spread + introsort is ~8x cheaper
    # than the 21-bit u64 path at canopy scale
    lo3 = cen.min(axis=0)
    ext = np.maximum(cen.max(axis=0) - lo3, 1e-30)
    qv = np.clip(((cen - lo3) / ext) * 1023.0, 0, 1023).astype(np.uint32)

    def spread10(x):
        x = (x | (x << 16)) & np.uint32(0x30000FF)
        x = (x | (x << 8)) & np.uint32(0x300F00F)
        x = (x | (x << 4)) & np.uint32(0x30C30C3)
        return (x | (x << 2)) & np.uint32(0x9249249)

    key = (
        spread10(qv[:, 0])
        | (spread10(qv[:, 1]) << np.uint32(1))
        | (spread10(qv[:, 2]) << np.uint32(2))
    )
    gorder = np.argsort(key)
    src_prim = np.ascontiguousarray(src_prim[gorder])
    src_inst = np.ascontiguousarray(src_inst[gorder])
    remap = remap[gorder]

    # Pass 2: fused expand-into-permuted-order. The native one-pass
    # OpenMP fill skips ~3 GB of numpy intermediates (matmul + concat +
    # fancy-index gather); numpy fallback below is the same arithmetic.
    from julia_raytracer_tpu.ops.native import world_expand_permute_native

    n_out = len(src_prim)
    sv = np.ascontiguousarray(g.prim_verts, np.float32)
    fr = np.ascontiguousarray(g.inst_frame, np.float32)
    world_pv = np.empty((n_out, 4, 3), np.float32)
    if not world_expand_permute_native(sv, fr, src_prim, src_inst, world_pv):
        rots = fr[src_inst, :3]  # [n, 3, 3]
        np.einsum(
            "nkj,nji->nki", sv[src_prim], rots, out=world_pv,
            casting="unsafe",
        )
        world_pv += fr[src_inst, 3][:, None, :]
    return world_pv, src_inst, remap
