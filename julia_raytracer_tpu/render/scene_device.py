"""Device-resident scene: every array the integrator touches, as one pytree.

Built from the host FlatScene (scene/flatten.py) + the BVH permutation:
primitive arrays are reordered to BVH leaf order once, on host, so
traversal and shading share the same indices with zero indirection.
Being a NamedTuple-of-arrays, the whole scene threads through jit
boundaries, shards (replicated) over a device mesh, and participates in
autodiff — material/texture/emission arrays are differentiable leaves.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from julia_raytracer_tpu.ops.bvh import FlatBVH, build_bvh, quad_bounds
from julia_raytracer_tpu.render.lights import (
    DeviceLights, LightCounts, build_lights_np,
)
from julia_raytracer_tpu.scene.flatten import FlatScene, flatten_scene


class DeviceMaterials(NamedTuple):
    type: jnp.ndarray  # i32 [M]
    emission: jnp.ndarray  # f32 [M, 3]
    color: jnp.ndarray  # f32 [M, 3]
    roughness: jnp.ndarray
    metallic: jnp.ndarray
    ior: jnp.ndarray
    scattering: jnp.ndarray  # [M, 3]
    scanisotropy: jnp.ndarray
    trdepth: jnp.ndarray
    opacity: jnp.ndarray
    emission_tex: jnp.ndarray  # i32
    color_tex: jnp.ndarray
    roughness_tex: jnp.ndarray
    scattering_tex: jnp.ndarray
    normal_tex: jnp.ndarray


class DeviceTextures(NamedTuple):
    data: jnp.ndarray  # f32 [P, 4]
    offset: jnp.ndarray  # i32 [T]
    width: jnp.ndarray  # i32 [T]
    height: jnp.ndarray  # i32 [T]
    linear: jnp.ndarray  # bool [T]


class DeviceScene(NamedTuple):
    """All scene arrays, primitive arrays in BVH leaf order."""

    # geometry (sorted by BVH order)
    prim_verts: jnp.ndarray  # f32 [Q, 4, 3]
    prim_vidx: jnp.ndarray  # i32 [Q, 4]
    prim_instance: jnp.ndarray  # i32 [Q]
    prim_flags: jnp.ndarray  # i32 [Q]
    nodes: jnp.ndarray  # f32 [Nn, 16] packed BVH
    # vertex attributes (concatenated across shapes)
    vert_normals: jnp.ndarray
    vert_texcoords: jnp.ndarray
    vert_colors: jnp.ndarray
    # instances
    inst_frame: jnp.ndarray  # f32 [I, 4, 3]
    inst_material: jnp.ndarray  # i32 [I]
    # tables
    materials: DeviceMaterials
    textures: DeviceTextures
    # environments
    env_frame: jnp.ndarray  # f32 [E, 4, 3]
    env_frame_inv: jnp.ndarray
    env_emission: jnp.ndarray  # f32 [E, 3]
    env_emission_tex: jnp.ndarray  # i32 [E]
    # lights
    lights: DeviceLights
    # per-instance material constants folded to one row (gather-free
    # material eval for small scenes): [I, 21] =
    # [type, emission*3, color*3, roughness, metallic, ior,
    #  scattering*3, scanisotropy, trdepth, opacity,
    #  emission_tex, color_tex, roughness_tex, scattering_tex, normal_tex]
    inst_mat_dense: jnp.ndarray
    # curve/point primitives, world space (src/geometry.jl:113-172;
    # attr rows = [normal-or-tangent 3, texcoord 2, color 4])
    line_verts: jnp.ndarray  # f32 [L, 2, 3]
    line_radius: jnp.ndarray  # f32 [L, 2]
    line_instance: jnp.ndarray  # i32 [L]
    line_attr: jnp.ndarray  # f32 [L, 2, 9]
    point_pos: jnp.ndarray  # f32 [P, 3]
    point_radius: jnp.ndarray  # f32 [P]
    point_instance: jnp.ndarray  # i32 [P]
    point_attr: jnp.ndarray  # f32 [P, 9]
    # Pallas intersector device tables (pytree; shape depends on the
    # active kernel). Set by Renderer AFTER build_intersector so the
    # tables enter jitted programs as traced arguments instead of
    # closure-captured inline literals (kitchen: a 185 MB constant per
    # kernel variant otherwise). () when the intersector needs none.
    isec_tables: tuple = ()


class SceneConfig(NamedTuple):
    """Static (compile-time) facts about the scene.

    The feature flags drive scene-specialized compilation: the integrator
    statically drops material lobes, texture paths, normal mapping,
    opacity, and volume machinery the scene cannot exercise — the
    TPU-first replacement for the reference's per-ray dynamic dispatch
    (a cornellbox kernel compiles to matte-only straight-line VPU code)."""

    n_prims: int
    root_is_leaf: bool
    n_envs: int
    light_counts: LightCounts
    has_normal_maps: bool
    has_opacity: bool
    present_types: tuple = tuple(range(8))  # sorted MaterialType ints present
    n_instances: int = 0
    has_textures: bool = True
    has_vertex_normals: bool = True
    has_texcoords: bool = True
    has_colors: bool = True
    has_volumes: bool = True
    # host-side (numpy) copies of the sorted primitive arrays, kept so
    # build_intersector can build Pallas tables without reading the device
    # arrays back (np.asarray on an axon-TPU array costs ~45 s for
    # kitchen's 69 MB — the dominant term of the round-1 367 s host prep)
    host_prim_verts: object = None
    host_prim_instance: object = None
    # filesystem key for cached preprocessing products (cluster tables)
    cache_key: str = ""
    # two-level instancing (scene/instanced.py InstancedTables). When set,
    # prim arrays are SHAPE-space (cluster-padded concat in kernel prim-id
    # order) and hits carry the instance from the two-level intersector.
    inst_tables: object = None
    # world-space scene bounds (instanced mode: prim_verts are shape-space
    # so the integrator cannot derive them)
    world_bounds: object = None  # (lo[3], hi[3]) numpy or None
    # curve/point primitive counts (0 = paths statically absent)
    n_lines: int = 0
    n_points: int = 0
    # hybrid instancing (scene/instanced.py build_world_flat): instances
    # of many-instance small shapes are flattened to a world-space soup
    # intersected by the worklist kernel, the rest stay work items; a
    # remap table maps flattened hit prim ids back into the shared
    # shape-space eval layout. All host-side numpy; None = pure instanced.
    hyb_world_verts: object = None  # f32 [Pf, 4, 3]
    hyb_world_inst: object = None  # i32 [Pf]
    hyb_remap: object = None  # i32 [Pf] -> eval prim id


def _opt(a, shape, dtype=np.float32) -> np.ndarray:
    """None-safe array default (older FlatGeometry pickles lack curves)."""
    return a if a is not None else np.zeros(shape, dtype)


def _inst_mat_dense(g, m) -> np.ndarray:
    """Fold the instance -> material indirection into one packed f32 row
    per instance (texture-free constants only)."""
    i_count = max(len(g.inst_material), 1)
    out = np.zeros((i_count, 21), np.float32)
    out[:, 16:21] = -1.0  # texture ids default to "none"
    if len(m.type) == 0:
        return out
    mid = np.clip(g.inst_material, 0, len(m.type) - 1)
    out[: len(mid), 0] = m.type[mid]
    out[: len(mid), 1:4] = m.emission[mid]
    out[: len(mid), 4:7] = m.color[mid]
    out[: len(mid), 7] = m.roughness[mid]
    out[: len(mid), 8] = m.metallic[mid]
    out[: len(mid), 9] = m.ior[mid]
    out[: len(mid), 10:13] = m.scattering[mid]
    out[: len(mid), 13] = m.scanisotropy[mid]
    out[: len(mid), 14] = m.trdepth[mid]
    out[: len(mid), 15] = m.opacity[mid]
    out[: len(mid), 16] = m.emission_tex[mid]
    out[: len(mid), 17] = m.color_tex[mid]
    out[: len(mid), 18] = m.roughness_tex[mid]
    out[: len(mid), 19] = m.scattering_tex[mid]
    out[: len(mid), 20] = m.normal_tex[mid]
    return out


# expansion thresholds for automatic two-level instancing: only worth it
# when flattening would both be huge AND mostly duplication (ecosys:
# 16.8M expanded vs 620k shape prims = 27x; kitchen at 1.44M is 1x and
# keeps the tuned single-level path)
INSTANCING_MIN_FLAT = 4_000_000
INSTANCING_MIN_RATIO = 4.0


def _should_instance(scene_data) -> bool:
    shape_prims = [
        max(len(sh.quads), len(sh.triangles)) for sh in scene_data.shapes
    ]
    total = sum(shape_prims)
    flat_total = 0
    for inst in scene_data.instances:
        if 0 <= inst.shape < len(shape_prims):
            flat_total += shape_prims[inst.shape]
    return (
        flat_total >= INSTANCING_MIN_FLAT
        and total > 0
        and flat_total >= INSTANCING_MIN_RATIO * total
    )


HYBRID_MIN_INSTANCES = 1024  # below this the work-item model is cheap
HYBRID_FLAT_BUDGET = 8_000_000  # world prims the hybrid may flatten
# full flatten (NO work-item branch) when the whole expanded scene fits
# comfortably in HBM: ~128 B/prim of intersector tables -> 24M prims ~
# 3.1 GB of the v5e's 16. Ecosys (16.8M world prims, 2.15 GB) measured
# 3,801 vs 4,455 ms/sample against the 8M hybrid — the flat soup is
# regroup-decisive (ratio 0.2) while the work-item kernel pays the
# per-block union of overlapping instance items (KNOBS_r05).
HYBRID_FULL_FLAT_MAX = 24_000_000


def build_device_scene_instanced(
    scene_data, sup: int = 32, cache_key: str = "",
    hybrid_budget: int | None = None,
) -> tuple[DeviceScene, SceneConfig]:
    """Two-level instanced build: per-shape cluster tables in shape space
    + (instance, supercluster) work items (scene/instanced.py); the
    flattened world expansion never happens. Reference semantics:
    src/bvh.jl:306-371 (scene BVH over instances, ray transformed into
    shape space at leaves).

    For many-instance scenes (ecosys: 12,755 instances), a HYBRID build
    flattens the instances of small shapes (the grass canopy that floods
    every ray block with hundreds of overlapping work items) into a
    world-space soup for the worklist kernel, keeping only big shapes as
    work items. hybrid_budget: max flattened world prims; None = auto
    (HYBRID_FLAT_BUDGET when n_instances >= HYBRID_MIN_INSTANCES, else
    off); 0 = force off."""
    from types import SimpleNamespace

    from julia_raytracer_tpu.scene.instanced import (
        build_instanced_tables, build_world_flat,
        expand_emissive_world_prims, select_flatten_shapes,
    )

    flat = flatten_scene(scene_data, expand_prims=False)
    g = flat.geometry

    if hybrid_budget is None:
        env_budget = os.environ.get("JRT_HYBRID_BUDGET")
        if env_budget is not None:
            hybrid_budget = int(env_budget)
        elif flat.n_instances >= HYBRID_MIN_INSTANCES:
            pp = np.diff(g.shape_prim_offset).astype(np.int64)
            inst_shape = g.inst_shape[: flat.n_instances]
            valid = (inst_shape >= 0) & (inst_shape < flat.n_shapes)
            cnt = np.bincount(inst_shape[valid], minlength=flat.n_shapes)
            total_world = int((pp * cnt).sum())
            hybrid_budget = (
                total_world + 1
                if total_world <= HYBRID_FULL_FLAT_MAX
                else HYBRID_FLAT_BUDGET
            )
        else:
            hybrid_budget = 0
    hyb_pv = hyb_inst = hyb_remap = None
    instance_mask = None
    if hybrid_budget > 0:
        shape_mask = select_flatten_shapes(flat, hybrid_budget)
        if shape_mask.any():
            from julia_raytracer_tpu.utils import diskcache

            hyb_name = f"hybrid{hybrid_budget}"
            cached = (
                diskcache.load_arrays(cache_key, hyb_name)
                if cache_key
                else None
            )
            if cached is not None:
                hyb_pv = cached["pv"]
                hyb_inst = cached["inst"]
                hyb_remap = cached["remap"]
            else:
                hyb_pv, hyb_inst, hyb_remap = build_world_flat(
                    flat, shape_mask, sup=sup
                )
                if cache_key and len(hyb_pv) > 200_000:
                    diskcache.save_arrays(
                        cache_key, hyb_name,
                        dict(pv=hyb_pv, inst=hyb_inst, remap=hyb_remap),
                    )
            if len(hyb_pv):
                inst_shape = g.inst_shape[: flat.n_instances]
                flattened = shape_mask[
                    np.clip(inst_shape, 0, flat.n_shapes - 1)
                ] & (inst_shape >= 0) & (inst_shape < flat.n_shapes)
                instance_mask = ~flattened
            else:
                hyb_pv = hyb_inst = hyb_remap = None

    tables, eval_arrays = build_instanced_tables(
        scene_data, flat, sup=sup, instance_mask=instance_mask
    )

    # light table from ONLY the emissive instances, expanded to world
    epv, epin, epfl = expand_emissive_world_prims(scene_data, flat)
    shim = SimpleNamespace(
        geometry=SimpleNamespace(
            prim_verts=epv, prim_instance=epin, prim_flags=epfl,
            inst_material=g.inst_material,
        ),
        materials=flat.materials,
        environments=flat.environments,
        textures=flat.textures,
        n_instances=flat.n_instances,
        n_shapes=flat.n_shapes,
    )
    lights_np, light_counts = build_lights_np(shim, np.arange(len(epv)))
    lights = DeviceLights(**{k: jnp.asarray(v) for k, v in lights_np.items()})
    if light_counts.total_inst_elems > 0:
        from julia_raytracer_tpu.render.lights import EXACT_ELEMS

        assert light_counts.total_inst_elems <= EXACT_ELEMS, (
            "instanced scenes require the exact light-pdf sweep "
            f"({light_counts.total_inst_elems} emissive elements > {EXACT_ELEMS})"
        )

    wib = tables.wi_bbox
    lo_parts, hi_parts = [], []
    if len(wib):
        lo_parts.append(wib[:, 0:3].min(axis=0))
        hi_parts.append(wib[:, 3:6].max(axis=0))
    if hyb_pv is not None and len(hyb_pv):
        lo_parts.append(hyb_pv.reshape(-1, 3).min(axis=0))
        hi_parts.append(hyb_pv.reshape(-1, 3).max(axis=0))
    world_bounds = (
        (np.min(lo_parts, axis=0), np.max(hi_parts, axis=0))
        if lo_parts
        else (np.zeros(3, np.float32), np.ones(3, np.float32))
    )
    return _assemble(
        flat,
        host_prim_verts=eval_arrays["prim_verts"],
        host_prim_instance=np.zeros(1, np.int32),
        sorted_vidx=eval_arrays["prim_vidx"],
        sorted_flags=eval_arrays["prim_flags"],
        nodes_np=np.zeros((1, 16), np.float32),
        n_prims=tables.n_prims,
        root_is_leaf=False,
        lights=lights,
        light_counts=light_counts,
        cache_key=cache_key,
        inst_tables=tables,
        world_bounds=world_bounds,
        hyb_world_verts=hyb_pv,
        hyb_world_inst=hyb_inst,
        hyb_remap=hyb_remap,
    )


def build_device_scene(
    scene_data, highquality_bvh: bool = False, cache_key: str = "",
    instancing: bool = None,
) -> tuple[DeviceScene, SceneConfig]:
    """Host SceneData -> (DeviceScene, SceneConfig). Flattens, builds the
    BVH, reorders primitives, and assembles the light table. Scenes whose
    flattening would mostly duplicate shared shapes (ecosys) switch to the
    two-level instanced build automatically (`instancing` overrides)."""
    from julia_raytracer_tpu.utils import diskcache

    if instancing is None:
        instancing = _should_instance(scene_data)
    if instancing:
        return build_device_scene_instanced(scene_data, cache_key=cache_key)

    flat = flatten_scene(scene_data)
    g = flat.geometry

    cached = diskcache.load_arrays(cache_key, "geom")
    if cached is not None and int(cached["n_prims"]) == len(g.prim_verts):
        # BVH + light tables + sorted primitive arrays straight from disk
        host_prim_verts = cached["prim_verts"]
        host_prim_instance = cached["prim_instance"]
        sorted_vidx = cached["prim_vidx"]
        sorted_flags = cached["prim_flags"]
        nodes_np = cached["nodes"]
        n_prims = int(cached["n_prims"])
        root_is_leaf = bool(cached["root_is_leaf"])
        lights = DeviceLights(
            **{k: jnp.asarray(cached["L_" + k]) for k in DeviceLights._fields}
        )
        light_counts = LightCounts(
            n_instance=int(cached["c_n_instance"]),
            n_env=int(cached["c_n_env"]),
            max_inst_elems=int(cached["c_max_inst_elems"]),
            max_env_texels=int(cached["c_max_env_texels"]),
            total_inst_elems=int(cached["c_total_inst_elems"]),
        )
    else:
        bb_min, bb_max = quad_bounds(g.prim_verts)
        tree: FlatBVH = build_bvh(bb_min, bb_max, sah=highquality_bvh)
        order = tree.order

        def sort(a):
            return a[order] if len(order) else a

        lights_np, light_counts = build_lights_np(flat, order)
        lights = DeviceLights(**{k: jnp.asarray(v) for k, v in lights_np.items()})
        host_prim_verts = sort(g.prim_verts)
        host_prim_instance = sort(g.prim_instance)
        sorted_vidx = sort(g.prim_vidx)
        sorted_flags = sort(g.prim_flags)
        nodes_np = tree.nodes
        n_prims = tree.n_prims
        root_is_leaf = tree.root_is_leaf
        if cache_key and n_prims > 200_000:  # heavy scenes only
            save = dict(
                prim_verts=host_prim_verts,
                prim_instance=host_prim_instance,
                prim_vidx=sorted_vidx,
                prim_flags=sorted_flags,
                nodes=nodes_np,
                n_prims=n_prims,
                root_is_leaf=root_is_leaf,
                c_n_instance=light_counts.n_instance,
                c_n_env=light_counts.n_env,
                c_max_inst_elems=light_counts.max_inst_elems,
                c_max_env_texels=light_counts.max_env_texels,
                c_total_inst_elems=light_counts.total_inst_elems,
            )
            for k, v in lights_np.items():
                save["L_" + k] = v
            diskcache.save_arrays(cache_key, "geom", save)

    return _assemble(
        flat,
        host_prim_verts=host_prim_verts,
        host_prim_instance=host_prim_instance,
        sorted_vidx=sorted_vidx,
        sorted_flags=sorted_flags,
        nodes_np=nodes_np,
        n_prims=n_prims,
        root_is_leaf=root_is_leaf,
        lights=lights,
        light_counts=light_counts,
        cache_key=cache_key,
    )


def _assemble(
    flat, *, host_prim_verts, host_prim_instance, sorted_vidx, sorted_flags,
    nodes_np, n_prims, root_is_leaf, lights, light_counts, cache_key,
    inst_tables=None, world_bounds=None,
    hyb_world_verts=None, hyb_world_inst=None, hyb_remap=None,
) -> tuple[DeviceScene, SceneConfig]:
    """Shared tail of the device-scene build: upload arrays and derive the
    static SceneConfig (both flat and instanced modes)."""
    g = flat.geometry
    m = flat.materials
    t = flat.textures
    e = flat.environments

    dscene = DeviceScene(
        prim_verts=jnp.asarray(host_prim_verts),
        prim_vidx=jnp.asarray(sorted_vidx),
        prim_instance=jnp.asarray(host_prim_instance),
        prim_flags=jnp.asarray(sorted_flags),
        nodes=jnp.asarray(nodes_np),
        vert_normals=jnp.asarray(g.vert_normals),
        vert_texcoords=jnp.asarray(g.vert_texcoords),
        vert_colors=jnp.asarray(g.vert_colors),
        inst_frame=jnp.asarray(g.inst_frame),
        inst_material=jnp.asarray(np.maximum(g.inst_material, 0)),
        materials=DeviceMaterials(
            type=jnp.asarray(m.type),
            emission=jnp.asarray(m.emission),
            color=jnp.asarray(m.color),
            roughness=jnp.asarray(m.roughness),
            metallic=jnp.asarray(m.metallic),
            ior=jnp.asarray(m.ior),
            scattering=jnp.asarray(m.scattering),
            scanisotropy=jnp.asarray(m.scanisotropy),
            trdepth=jnp.asarray(m.trdepth),
            opacity=jnp.asarray(m.opacity),
            emission_tex=jnp.asarray(m.emission_tex),
            color_tex=jnp.asarray(m.color_tex),
            roughness_tex=jnp.asarray(m.roughness_tex),
            scattering_tex=jnp.asarray(m.scattering_tex),
            normal_tex=jnp.asarray(m.normal_tex),
        ),
        textures=DeviceTextures(
            data=jnp.asarray(t.data),
            offset=jnp.asarray(t.offset),
            width=jnp.asarray(t.width),
            height=jnp.asarray(t.height),
            linear=jnp.asarray(t.linear),
        ),
        env_frame=jnp.asarray(e.frame),
        env_frame_inv=jnp.asarray(e.frame_inv),
        env_emission=jnp.asarray(e.emission),
        env_emission_tex=jnp.asarray(e.emission_tex),
        lights=lights,
        inst_mat_dense=jnp.asarray(_inst_mat_dense(g, m)),
        line_verts=jnp.asarray(_opt(g.line_verts, (0, 2, 3))),
        line_radius=jnp.asarray(_opt(g.line_radius, (0, 2))),
        line_instance=jnp.asarray(_opt(g.line_instance, (0,), np.int32)),
        line_attr=jnp.asarray(_opt(g.line_attr, (0, 2, 9))),
        point_pos=jnp.asarray(_opt(g.point_pos, (0, 3))),
        point_radius=jnp.asarray(_opt(g.point_radius, (0,))),
        point_instance=jnp.asarray(_opt(g.point_instance, (0,), np.int32)),
        point_attr=jnp.asarray(_opt(g.point_attr, (0, 9))),
    )
    from julia_raytracer_tpu.scene.flatten import (
        FLAG_HAS_COLORS,
        FLAG_HAS_NORMALS,
        FLAG_HAS_TEXCOORDS,
    )

    flags_union = int(np.bitwise_or.reduce(g.prim_flags)) if len(g.prim_flags) else 0
    # opacity can also come from a color texture's alpha channel
    any_tex_alpha = bool((t.data[:, 3] < 1.0).any()) if len(t.data) else False
    present = tuple(sorted(set(int(x) for x in m.type))) if len(m.type) else ()
    config = SceneConfig(
        n_prims=n_prims,
        root_is_leaf=root_is_leaf,
        n_envs=len(e.emission),
        light_counts=light_counts,
        has_normal_maps=bool((m.normal_tex >= 0).any()) if len(m.normal_tex) else False,
        has_opacity=(
            bool((m.opacity < 1.0).any()) if len(m.opacity) else False
        ) or any_tex_alpha,
        present_types=present,
        n_instances=flat.n_instances,
        has_textures=len(t.data) > 0,
        has_vertex_normals=bool(flags_union & FLAG_HAS_NORMALS),
        has_texcoords=bool(flags_union & FLAG_HAS_TEXCOORDS),
        has_colors=bool(flags_union & FLAG_HAS_COLORS),
        has_volumes=bool(set(present) & {4, 5, 6}),  # refractive/subsurface/volumetric
        host_prim_verts=host_prim_verts,
        host_prim_instance=host_prim_instance,
        cache_key=cache_key,
        inst_tables=inst_tables,
        world_bounds=world_bounds,
        n_lines=len(_opt(g.line_instance, (0,), np.int32)),
        n_points=len(_opt(g.point_instance, (0,), np.int32)),
        hyb_world_verts=hyb_world_verts,
        hyb_world_inst=hyb_world_inst,
        hyb_remap=hyb_remap,
    )
    return dscene, config
