"""Wavefront path integrators (naive + MIS path tracing with volumes).

TPU-first inversion of the reference's per-ray recursion
(src/trace.jl:276-573): the whole ray batch advances in lock-step inside
one `lax.while_loop`; every lane carries its own bounce counter, weight,
RNG stream, and a one-slot volume stack (the reference's volume stack
never exceeds depth 1: it pushes only when empty, src/trace.jl:405-421).

The loop carries the *current intersection* across iterations: each body
computes the NEXT ray's intersection at its end. That single traversal
serves double duty — it is both the next bounce's hit and march step 1
of the MIS light pdf (see render/lights.py), so the reference's
pdf re-tracing loop (src/trace.jl:1029-1043) costs zero extra traversals
in the default configuration.

Control-flow parity with src/trace.jl:
  - miss -> env radiance unless (bounce == 0 and envhidden)   :299-304
  - volume transmittance sampling before surface work          :306-326
  - stochastic opacity skip, cap 128, bounce not consumed      :356-364
  - first-hit AOVs (albedo/normal) at bounce 0                 :366-370
  - one-sample MIS, 50/50 bsdf/light, balance-heuristic weight :375-397
  - delta materials bypass MIS                                 :398-403
  - volume push/pop on transmission through volumetric         :405-421
  - in-volume scattering with the same 50/50 MIS               :424-453
  - weight zero/non-finite break                               :455-457
  - Russian roulette after bounce 3, p = min(.99, max(w))      :459-465
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from julia_raytracer_tpu.ops import bsdf as bsdf_ops
from julia_raytracer_tpu.ops import eval as eval_ops
from julia_raytracer_tpu.ops import pallas_compact
from julia_raytracer_tpu.ops.geometry import F32_MAX, RAY_EPS
from julia_raytracer_tpu.ops.traversal import (
    Hit, intersect_bruteforce, intersect_bvh,
)
from julia_raytracer_tpu.render import dispatch, lights as lights_mod
from julia_raytracer_tpu.render.scene_device import DeviceScene, SceneConfig
from julia_raytracer_tpu.utils import rng as rng_mod
from julia_raytracer_tpu.utils.vecmath import dot

import os

# dense-kernel cutoff. Was 256; the on-TPU smoke tier found Mosaic
# scoped-vmem compile OOMs for 192-256-prim unrolls at multi-block
# dispatches (tests_tpu first run), while the 36-prim cornellbox class
# is solid at 1M-lane grids (scoped stack ~ 16.4M at 128 prims, just
# over the 16M limit). 113+ prims route to the worklist kernel.
BRUTEFORCE_THRESHOLD = 112
# ray regrouping pays off once block footprint unions dwarf per-ray
# footprints — a heavy-scene effect (kitchen/bathroom1/coffee class)
REGROUP_MIN_PRIMS = int(os.environ.get("JRT_REGROUP_MIN") or 150_000)


class TraceOptions(NamedTuple):
    """Static integrator options (mirrors the Params subset that affects
    tracing, src/cli.jl:13-86)."""

    sampler: str = "path"  # "path" | "naive"
    bounces: int = 8
    envhidden: bool = False
    nocaustics: bool = False
    light_pdf_extra_steps: int = 2  # extra whole-scene marches for the light pdf
    # 0 = data-dependent lax.while_loop (fastest). A positive value runs a
    # fixed-trip lax.scan instead — required for reverse-mode autodiff
    # (while_loop has no transpose rule); set to bounces + 1 + an opacity
    # retry budget. The loop body is fully masked, so both modes produce
    # identical results.
    fixed_iterations: int = 0
    # sort the wavefront between bounces by (liveness, morton(hit pos)):
    # dead lanes compact to the tail (their blocks cull to nothing in the
    # work-list intersector) and live lanes become spatially coherent, so
    # per-block live supercluster sets shrink. The TPU-native replacement
    # for stream compaction (SURVEY §7 step 6) — a permutation is one
    # cheap XLA sort+gather (~0.1 ms @ 262k lanes), no dynamic shapes.
    sort_rays: bool = False


def make_intersect_instanced_ref(dscene: DeviceScene, config: SceneConfig):
    """jnp reference intersector for INSTANCED scenes: python loop over
    instances, ray transformed into shape space per instance, brute-force
    quads per shape (src/bvh.jl:345 semantics). O(instances) unrolled —
    for tests and tiny scenes only; real instanced scenes use the Pallas
    two-level kernel."""
    import numpy as np

    from julia_raytracer_tpu.ops.geometry import F32_MAX, intersect_quad
    from julia_raytracer_tpu.ops.traversal import Hit

    tb = config.inst_tables
    verts = dscene.prim_verts  # shape-space, cluster-padded concat
    # per-shape padded prim bounds from the supercluster layout
    from julia_raytracer_tpu.ops.pallas_cluster import PRIMS_PER_CLUSTER

    pp_per_sup = tb.sup * PRIMS_PER_CLUSTER
    rows = np.asarray(tb.inst_rows)
    n_inst = rows.shape[0]
    sup_off = np.asarray(tb.shape_sup_offset)

    def intersect(ro, rd, tmin, tmax):
        n = ro.shape[0]
        best = Hit(
            jnp.zeros(n, bool), jnp.full(n, -1, jnp.int32),
            jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
            tmax, ro + rd * tmax[..., None], jnp.zeros((n, 3), jnp.float32),
            jnp.zeros(n, jnp.int32),
        )
        # group work items by instance (each instance appears once per
        # supercluster; dedupe)
        seen = set()
        for item in range(len(tb.wi_inst)):
            i = int(tb.wi_inst[item])
            if i in seen:
                continue
            seen.add(i)
            sid = None
            # find shape via supercluster id
            sc = int(tb.wi_sup[item])
            sid = int(np.searchsorted(sup_off, sc, side="right") - 1)
            plo = int(sup_off[sid]) * pp_per_sup
            phi = int(sup_off[sid + 1]) * pp_per_sup
            if phi == plo:
                continue
            ri = jnp.asarray(rows[i, 0:9].reshape(3, 3))
            oi = jnp.asarray(rows[i, 9:12])
            fw = jnp.asarray(rows[i, 12:21].reshape(3, 3))
            so = ro @ ri + oi
            sd = rd @ ri
            sv = verts[plo:phi]
            h, u, v, t = intersect_quad(
                so[:, None, :], sd[:, None, :], tmin[:, None],
                jnp.minimum(tmax, best.t)[:, None],
                sv[None, :, 0], sv[None, :, 1], sv[None, :, 2], sv[None, :, 3],
            )
            tt = jnp.where(h, t, F32_MAX)
            jbest = jnp.argmin(tt, axis=1)
            tbest = jnp.take_along_axis(tt, jbest[:, None], axis=1)[:, 0]
            upd = tbest < best.t
            take = lambda a: jnp.take_along_axis(a, jbest[:, None], axis=1)[:, 0]
            pb = plo + jbest.astype(jnp.int32)
            vb = verts[pb]
            from julia_raytracer_tpu.ops.geometry import quad_normal

            gn_s = quad_normal(vb[:, 0], vb[:, 1], vb[:, 2], vb[:, 3])
            gn_w = gn_s @ fw
            gl = jnp.sqrt(jnp.sum(gn_w * gn_w, axis=-1, keepdims=True))
            gn_w = gn_w / jnp.where(gl > 0, gl, 1.0)
            best = Hit(
                hit=jnp.where(upd, True, best.hit),
                prim=jnp.where(upd, pb, best.prim),
                u=jnp.where(upd, take(u), best.u),
                v=jnp.where(upd, take(v), best.v),
                t=jnp.where(upd, tbest, best.t),
                position=jnp.where(
                    upd[:, None], ro + rd * tbest[:, None], best.position
                ),
                gnormal=jnp.where(upd[:, None], gn_w, best.gnormal),
                instance=jnp.where(upd, i, best.instance),
            )
        return best

    return intersect


def make_intersect_hybrid(dscene: DeviceScene, config: SceneConfig,
                          on_tpu: bool):
    """Hybrid instanced intersector: the flattened world-space soup
    (instances of small many-instance shapes, config.hyb_world_verts)
    goes through the worklist cluster kernel; the remaining big-shape
    instances go through the two-level work-item kernel with the flat
    branch's best-t fed as tmax (front-to-back: the world soup carries
    most visible geometry in canopy scenes, so the instanced precull
    sees tight rays). Flattened hit prim ids are remapped into the
    shared shape-space eval layout (config.hyb_remap), so shading is
    identical for both branches. See scene/instanced.py."""
    import numpy as np

    wpv = np.asarray(config.hyb_world_verts)
    winst = np.asarray(config.hyb_world_inst)
    remap_d = jnp.asarray(config.hyb_remap)
    tables = config.inst_tables
    has_items = len(tables.wi_inst) > 0

    if on_tpu:
        from julia_raytracer_tpu.ops.pallas_cluster import (
            make_cluster_intersect_instanced,
            make_cluster_intersect_worklist,
        )
        from julia_raytracer_tpu.ops.pallas_intersect import (
            make_bruteforce_pallas,
        )

        if len(wpv) <= BRUTEFORCE_THRESHOLD:
            flat_part = make_bruteforce_pallas(wpv, winst)
        else:
            # key the derived cluster tables by the soup CONTENT (sampled
            # fingerprint), not just the scene key: different hybrid
            # budgets (or cache_key == "" signalling cache-off) must
            # never share tables — _load_tables validates only q
            import hashlib

            if config.cache_key:
                samp = wpv[:: max(1, len(wpv) // 1024)]
                fp = hashlib.sha1(np.ascontiguousarray(samp)).hexdigest()[:10]
                hyb_key = f"{config.cache_key}:hybf{len(wpv)}-{fp}"
            else:
                hyb_key = ""
            # the flat soup takes the same per-scene kernel selection as
            # the non-instanced path (ecosys soup: 8M world prims,
            # S~490 — exactly the divergence regime regroup targets)
            rg_mode = os.environ.get("JRT_REGROUP", "auto")
            want_rg = False
            if len(wpv) >= REGROUP_MIN_PRIMS and rg_mode != "0":
                if rg_mode == "auto":
                    from julia_raytracer_tpu.utils.kernel_select import (
                        select_bounce_kernel,
                    )

                    sel = select_bounce_kernel(wpv, winst, hyb_key)
                    print(
                        f"hybrid flat kernel: {sel['kernel']} (predicted "
                        f"ratio {sel['ratio']})", flush=True,
                    )
                    want_rg = sel["kernel"] == "regroup"
                else:
                    want_rg = True
            if want_rg:
                from julia_raytracer_tpu.ops.pallas_regroup import (
                    make_cluster_intersect_regroup,
                )

                flat_part = make_cluster_intersect_regroup(
                    wpv, winst, cache_key=hyb_key,
                    livegate=(
                        0.2 if rg_mode == "auto" and sel["ratio"] < 0.25
                        else None
                    ),
                )
            else:
                flat_part = make_cluster_intersect_worklist(
                    wpv, winst, cache_key=hyb_key
                )
        inst_part = (
            make_cluster_intersect_instanced(tables) if has_items else None
        )
    else:
        wpv_d, winst_d = jnp.asarray(wpv), jnp.asarray(winst)

        def flat_part(ro, rd, tmin, tmax):
            return intersect_bruteforce(
                wpv_d, ro, rd, tmin, tmax, prim_instance=winst_d
            )

        inst_part = (
            make_intersect_instanced_ref(dscene, config) if has_items else None
        )

    # compose the two branches' device tables so they thread through the
    # jit boundary as arguments (see pallas_cluster: closure-captured
    # tables lower as inline program literals)
    flat_tables = getattr(flat_part, "tables", None)
    inst_tables_d = getattr(inst_part, "tables", None)
    default_tables = (flat_tables, inst_tables_d, remap_d)

    def _compose(flatfn):
        def intersect(ro, rd, tmin, tmax, tables=None):
            flat_t, inst_t, remap_t = (
                tables if tables is not None else default_tables
            )
            if flat_tables is not None:
                h1 = flatfn(ro, rd, tmin, tmax, tables=flat_t)
            else:
                h1 = flatfn(ro, rd, tmin, tmax)
            prim1 = jnp.where(
                h1.hit, jnp.take(remap_t, jnp.maximum(h1.prim, 0)), -1
            )
            if inst_part is None:
                return h1._replace(prim=prim1)
            # strict-improvement tmax: the instanced branch only reports
            # hits closer than the flat branch's best
            t_cut = jnp.where(h1.hit, h1.t * jnp.float32(1.0000002), tmax)
            if inst_tables_d is not None:
                h2 = inst_part(ro, rd, tmin, jnp.minimum(tmax, t_cut),
                               tables=inst_t)
            else:
                h2 = inst_part(ro, rd, tmin, jnp.minimum(tmax, t_cut))
            take2 = h2.hit
            sel = lambda a, b: jnp.where(take2, a, b)
            selv = lambda a, b: jnp.where(take2[:, None], a, b)
            hit = h1.hit | take2
            return Hit(
                hit=hit,
                prim=sel(h2.prim, prim1),
                u=sel(h2.u, h1.u),
                v=sel(h2.v, h1.v),
                t=jnp.where(hit, sel(h2.t, h1.t), tmax),
                position=selv(h2.position, h1.position),
                gnormal=selv(h2.gnormal, h1.gnormal),
                instance=sel(h2.instance, h1.instance),
            )

        return intersect

    intersect = _compose(flat_part)
    intersect.tables = default_tables
    intersect.wants_tables = True
    # coherent primary dispatches route the flat soup through its
    # worklist fallback when the regroup kernel was selected (same
    # rationale as build_intersector's .primary routing)
    if hasattr(flat_part, "primary"):
        primary = _compose(flat_part.primary)
        primary.tables = default_tables
        primary.wants_tables = True
        intersect.primary = primary
    # branch handles for diagnostics (tools/profile_ecosys.py splits the
    # hybrid's time between the flat soup and the work-item kernel)
    intersect.flat_part = flat_part
    intersect.inst_part = inst_part
    return intersect


def curve_wrap(intersect, dscene: DeviceScene, config: SceneConfig):
    """Merge line/point (capsule) primitives into a quad intersector's
    closest hit (src/geometry.jl:113-172, src/bvh.jl:408-443). Curve hits
    are encoded as prim ids >= Q (Q..Q+L-1 lines, then points); their
    `position` is the element point — interpolate_line(p1,p2,u) / the
    point center — matching eval_position (src/scene.jl:465-475), and
    `gnormal` carries the interpolated tangent (lines) / outgoing
    (points) for the shading-normal rules (src/scene.jl:511-518)."""
    from julia_raytracer_tpu.ops.geometry import intersect_line, intersect_point
    from julia_raytracer_tpu.utils.vecmath import normalize

    L, P = config.n_lines, config.n_points
    if L == 0 and P == 0:
        return intersect
    Q = dscene.prim_verts.shape[0]
    inner_wants = getattr(intersect, "wants_tables", False)

    def wrapped(ro, rd, tmin, tmax, tables=None):
        if Q > 0:
            if inner_wants:
                h = intersect(ro, rd, tmin, tmax, tables=tables)
            else:
                h = intersect(ro, rd, tmin, tmax)
        else:
            n = ro.shape[0]
            z = jnp.zeros(n, jnp.float32)
            h = Hit(jnp.zeros(n, bool), jnp.full(n, -1, jnp.int32), z, z,
                    tmax, jnp.zeros((n, 3), jnp.float32),
                    jnp.zeros((n, 3), jnp.float32), jnp.zeros(n, jnp.int32))
        best = h
        bt = jnp.where(best.hit, best.t, tmax)
        if L > 0:
            p1 = dscene.line_verts[None, :, 0]  # [1, L, 3]
            p2 = dscene.line_verts[None, :, 1]
            r1 = dscene.line_radius[None, :, 0]
            r2 = dscene.line_radius[None, :, 1]
            lh, ls, lv, lt = intersect_line(
                ro[:, None], rd[:, None], tmin[:, None], bt[:, None],
                p1, p2, r1, r2,
            )  # each [n, L]
            lt = jnp.where(lh, lt, F32_MAX)
            li = jnp.argmin(lt, axis=1)
            ltb = jnp.take_along_axis(lt, li[:, None], axis=1)[:, 0]
            upd = ltb < bt
            take = lambda a: jnp.take_along_axis(a, li[:, None], axis=1)[:, 0]
            s_ = take(ls)
            v_ = take(lv)
            lp1 = dscene.line_verts[li, 0]
            lp2 = dscene.line_verts[li, 1]
            axis_pt = lp1 + (lp2 - lp1) * s_[:, None]
            tan = normalize(
                dscene.line_attr[li, 0, 0:3] * (1.0 - s_[:, None])
                + dscene.line_attr[li, 1, 0:3] * s_[:, None]
            )
            best = Hit(
                hit=best.hit | upd,
                prim=jnp.where(upd, Q + li.astype(jnp.int32), best.prim),
                u=jnp.where(upd, s_, best.u),
                v=jnp.where(upd, v_, best.v),
                t=jnp.where(upd, ltb, best.t),
                position=jnp.where(upd[:, None], axis_pt, best.position),
                gnormal=jnp.where(upd[:, None], tan, best.gnormal),
                instance=jnp.where(upd, dscene.line_instance[li], best.instance),
            )
            bt = jnp.where(best.hit, best.t, tmax)
        if P > 0:
            ph, pt = intersect_point(
                ro[:, None], rd[:, None], tmin[:, None], bt[:, None],
                dscene.point_pos[None], dscene.point_radius[None],
            )
            pt = jnp.where(ph, pt, F32_MAX)
            pi = jnp.argmin(pt, axis=1)
            ptb = jnp.take_along_axis(pt, pi[:, None], axis=1)[:, 0]
            upd = ptb < bt
            best = Hit(
                hit=best.hit | upd,
                prim=jnp.where(upd, Q + L + pi.astype(jnp.int32), best.prim),
                u=jnp.where(upd, 0.0, best.u),
                v=jnp.where(upd, 0.0, best.v),
                t=jnp.where(upd, ptb, best.t),
                position=jnp.where(upd[:, None], dscene.point_pos[pi], best.position),
                gnormal=jnp.where(upd[:, None], -normalize(rd), best.gnormal),
                instance=jnp.where(upd, dscene.point_instance[pi], best.instance),
            )
        return best

    if inner_wants:
        wrapped.tables = intersect.tables
        wrapped.wants_tables = True
    return wrapped


def make_intersect(dscene: DeviceScene, config: SceneConfig):
    """Closest-hit query against the device scene (traceable; reads the
    possibly-traced dscene arrays). Tiny scenes use the dense brute-force
    path (pure VPU, zero gathers)."""
    if config.inst_tables is not None:
        if config.hyb_world_verts is not None and len(config.hyb_world_verts):
            return make_intersect_hybrid(dscene, config, on_tpu=False)
        return make_intersect_instanced_ref(dscene, config)
    if config.root_is_leaf or config.n_prims <= BRUTEFORCE_THRESHOLD:
        def intersect(ro, rd, tmin, tmax):
            return intersect_bruteforce(
                dscene.prim_verts, ro, rd, tmin, tmax,
                prim_instance=dscene.prim_instance,
            )
    else:
        def intersect(ro, rd, tmin, tmax):
            return intersect_bvh(
                dscene.nodes, dscene.prim_verts, ro, rd, tmin, tmax,
                prim_instance=dscene.prim_instance,
            )
    return curve_wrap(intersect, dscene, config)


def build_intersector(dscene: DeviceScene, config: SceneConfig):
    """Concrete (host-built) intersector for a fixed scene. On TPU:
    tiny scenes get the Pallas dense kernel (ops/pallas_intersect.py),
    mid-size scenes the cluster-culled Pallas kernel
    (ops/pallas_cluster.py, ~30x the gather BVH); everything else falls
    back to make_intersect. Call OUTSIDE jit; safe to close over."""
    import numpy as np

    on_tpu = jax.devices()[0].platform == "tpu"
    if config.inst_tables is not None:
        if config.hyb_world_verts is not None and len(config.hyb_world_verts):
            return make_intersect_hybrid(dscene, config, on_tpu)
        if on_tpu:
            from julia_raytracer_tpu.ops.pallas_cluster import (
                make_cluster_intersect_instanced,
            )

            return make_cluster_intersect_instanced(config.inst_tables)
        return make_intersect_instanced_ref(dscene, config)
    if on_tpu and config.n_prims > 0:
        # host copies carried in the config avoid a device->host readback
        # (~45 s over the axon tunnel for kitchen-size vert arrays)
        verts_np = config.host_prim_verts
        inst_np = config.host_prim_instance
        if verts_np is None:
            verts_np = np.asarray(dscene.prim_verts)
        if inst_np is None:
            inst_np = np.asarray(dscene.prim_instance)
        if config.root_is_leaf or config.n_prims <= BRUTEFORCE_THRESHOLD:
            from julia_raytracer_tpu.ops.pallas_intersect import make_bruteforce_pallas

            return curve_wrap(
                make_bruteforce_pallas(np.asarray(verts_np), inst_np),
                dscene, config,
            )
        rg_mode = os.environ.get("JRT_REGROUP", "auto")
        want_regroup = False
        if config.n_prims >= REGROUP_MIN_PRIMS and rg_mode != "0":
            if rg_mode == "auto":
                # per-scene data-driven choice (utils/kernel_select.py,
                # VERDICT r4 item 5): predicted regroup/worklist dispatch
                # ratio from exact pass-count mirrors on surface-sampled
                # bounce rays; regroup only on a decisive (<0.35) win.
                # Disk-cached per scene content key; decision logged.
                from julia_raytracer_tpu.utils.kernel_select import (
                    select_bounce_kernel,
                )

                sel = select_bounce_kernel(
                    np.asarray(verts_np), inst_np, config.cache_key
                )
                print(
                    f"bounce kernel: {sel['kernel']} (predicted "
                    f"regroup/worklist ratio {sel['ratio']}, threshold "
                    f"{sel['threshold']})", flush=True,
                )
                want_regroup = sel["kernel"] == "regroup"
            else:
                want_regroup = True
        if want_regroup:
            # supercluster ray regrouping (ops/pallas_regroup.py): packs
            # divergent bounce rays into single-super rows so the sweep
            # never pays a block's footprint union (kitchen bounce
            # dispatch: 404 -> 295 ms). Coherent primary dispatches
            # route to its embedded worklist fallback via `.primary`.
            from julia_raytracer_tpu.ops.pallas_regroup import (
                make_cluster_intersect_regroup,
            )

            rg = make_cluster_intersect_regroup(
                np.asarray(verts_np), inst_np, cache_key=config.cache_key,
                livegate=(
                    0.2 if rg_mode == "auto" and sel["ratio"] < 0.25
                    else None
                ),
            )
            outer = curve_wrap(rg, dscene, config)
            if outer is not rg:
                prim_wrapped = curve_wrap(rg.primary, dscene, config)
                outer.tables = rg.tables
                outer.wants_tables = True
                outer.primary = prim_wrapped
            return outer
        from julia_raytracer_tpu.ops.pallas_cluster import (
            make_cluster_intersect_worklist,
        )

        # per-block supercluster work lists + front-to-back early
        # termination: occupancy scales with each block's visible set,
        # not scene size — one kernel covers everything non-tiny
        return curve_wrap(
            make_cluster_intersect_worklist(
                np.asarray(verts_np), inst_np, cache_key=config.cache_key
            ),
            dscene, config,
        )
    return make_intersect(dscene, config)


def _vec(mask):
    return mask[..., None]


def _spread3(x):
    """Spread 10 bits to every 3rd bit (morton interleave helper)."""
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def _morton3(pos, vmin, vmax):
    """[N,3] world position -> 30-bit morton key (10 bits/axis)."""
    scale = 1023.0 / jnp.maximum(vmax - vmin, 1e-30)
    q = jnp.clip(((pos - vmin) * scale), 0.0, 1023.0).astype(jnp.int32)
    return (
        _spread3(q[..., 0])
        | (_spread3(q[..., 1]) << 1)
        | (_spread3(q[..., 2]) << 2)
    )


def _sort_key(ro, rd, vmin, vmax):
    """Wavefront coherence key: octant(3) | origin-morton(18) |
    direction-morton(9), 30 bits total.

    The octant groups rays whose slab tests share sign structure; the
    origin bits (6/axis — block-granularity locality only needs the top
    few) keep each 1024-ray block's footprint compact so per-block
    culls have tight beams; the DIRECTION bits refine within an
    (octant, origin-cell): without them pinhole-camera primaries (all
    origins equal) sort to scanline strips spanning the whole image
    width, whose block frusta fan across the entire scene (measured on
    ecosys: 84% of all work items pass the block cull). With them,
    equal-origin rays tile by direction == image tiles."""
    octant = (
        ((rd[:, 0] < 0).astype(jnp.int32) << 2)
        | ((rd[:, 1] < 0).astype(jnp.int32) << 1)
        | (rd[:, 2] < 0).astype(jnp.int32)
    )
    om = _morton3(ro, vmin, vmax) >> 12  # top 18 bits
    ad = jnp.abs(rd)
    qd = jnp.clip(ad * 7.999, 0.0, 7.0).astype(jnp.int32)
    dm = (
        _spread3(qd[:, 0])
        | (_spread3(qd[:, 1]) << 1)
        | (_spread3(qd[:, 2]) << 2)
    )  # 9 bits (3/axis)
    return (octant << 27) | (om << 9) | dm


def trace_wavefront(
    dscene: DeviceScene,
    config: SceneConfig,
    options: TraceOptions,
    ro,
    rd,
    rng_state,
    intersect=None,
    intersect_primary=None,
    alive_trace: bool = False,
):
    """Trace a batch of rays to completion.

    Returns (radiance [N,3], hit [N] bool, albedo [N,3], normal [N,3],
    rng_state) matching trace_path/trace_naive's return contract
    (src/trace.jl:468, :571). `intersect` may be a prebuilt intersector
    (build_intersector) — e.g. the Pallas dense kernel on TPU."""
    n = ro.shape[0]
    if intersect is None:
        intersect = make_intersect(dscene, config)

    def _thread_tables(isec):
        # thread the Pallas kernel tables through the jit boundary as
        # ARGUMENTS (dscene is a traced arg): closure-captured device
        # arrays would otherwise lower as inline literals, bloating the
        # program by the table size per compiled kernel variant
        if not (getattr(isec, "wants_tables", False) and dscene.isec_tables):
            return isec
        _tabs = dscene.isec_tables

        def wrapped(ro_, rd_, tn_, tx_):
            return isec(ro_, rd_, tn_, tx_, tables=_tabs)

        return wrapped

    # coherent primary dispatches may route to a different kernel than
    # the divergent bounce/light-march ones (regroup intersector)
    intersect_primary = _thread_tables(intersect_primary or intersect)
    intersect = _thread_tables(intersect)

    is_path = options.sampler == "path"
    counts = config.light_counts
    has_lights = counts.total > 0

    zeros3 = jnp.zeros((n, 3), jnp.float32)

    class S(NamedTuple):
        ro: jnp.ndarray
        rd: jnp.ndarray
        isec_hit: jnp.ndarray
        isec_prim: jnp.ndarray
        isec_u: jnp.ndarray
        isec_v: jnp.ndarray
        isec_t: jnp.ndarray
        isec_pos: jnp.ndarray
        isec_gn: jnp.ndarray
        isec_inst: jnp.ndarray
        radiance: jnp.ndarray
        weight: jnp.ndarray
        rng: jnp.ndarray
        bounce: jnp.ndarray
        opbounce: jnp.ndarray
        alive: jnp.ndarray
        hit_flag: jnp.ndarray
        hit_albedo: jnp.ndarray
        hit_normal: jnp.ndarray
        max_roughness: jnp.ndarray
        vol_density: jnp.ndarray
        vol_scattering: jnp.ndarray
        vol_aniso: jnp.ndarray
        has_vol: jnp.ndarray
        idx: jnp.ndarray  # original lane id (identity unless sort_rays)

    do_sort = options.sort_rays and options.fixed_iterations == 0
    if do_sort:
        if config.world_bounds is not None:
            # instanced scenes: prim_verts are shape-space; world bounds
            # come from the work-item bboxes via the config
            scene_vmin = jnp.asarray(config.world_bounds[0])
            scene_vmax = jnp.asarray(config.world_bounds[1])
        else:
            pv_flat = dscene.prim_verts.reshape(-1, 3)
            scene_vmin = jnp.min(pv_flat, axis=0)
            scene_vmax = jnp.max(pv_flat, axis=0)

    idx0 = jnp.arange(n, dtype=jnp.int32)
    if do_sort:
        # sort PRIMARY rays too: camera rays arrive in scanline order,
        # so 1024-lane blocks span whole scanlines (full-scene frusta);
        # the direction bits in the key turn equal-origin pinhole blocks
        # into image tiles (see _sort_key)
        perm0 = jnp.argsort(_sort_key(ro, rd, scene_vmin, scene_vmax))
        ro, rd, rng_state, idx0 = jax.tree_util.tree_map(
            lambda a: a[perm0], (ro, rd, rng_state, idx0)
        )

    h0 = intersect_primary(ro, rd, jnp.full(n, RAY_EPS), jnp.full(n, F32_MAX))
    state = S(
        ro=ro,
        rd=rd,
        isec_hit=h0.hit,
        isec_prim=h0.prim,
        isec_u=h0.u,
        isec_v=h0.v,
        isec_t=h0.t,
        isec_pos=h0.position,
        isec_gn=h0.gnormal,
        isec_inst=h0.instance,
        radiance=zeros3,
        weight=jnp.ones((n, 3), jnp.float32),
        rng=rng_state,
        bounce=jnp.full(n, -1, jnp.int32),
        opbounce=jnp.zeros(n, jnp.int32),
        alive=jnp.ones(n, bool),
        hit_flag=jnp.zeros(n, bool),
        hit_albedo=zeros3,
        hit_normal=zeros3,
        max_roughness=jnp.zeros(n, jnp.float32),
        vol_density=zeros3,
        vol_scattering=zeros3,
        vol_aniso=jnp.zeros(n, jnp.float32),
        has_vol=jnp.zeros(n, bool),
        idx=idx0,
    )

    def body(s: S) -> S:
        # width-polymorphic: the two-phase compaction (below) re-enters
        # this body with a narrowed survivor buffer, so every lane-shaped
        # constant derives from the state, not the closure n
        n = s.alive.shape[0]
        alive = s.alive
        bounce = jnp.where(alive, s.bounce + 1, s.bounce)
        rng = s.rng
        radiance, weight = s.radiance, s.weight
        outgoing = -s.rd

        # ---- miss: environment lookup (src/trace.jl:299-304)
        miss = alive & ~s.isec_hit
        if config.n_envs > 0:
            env_ok = (bounce > 0) if options.envhidden else jnp.ones(n, bool)
            env = eval_ops.eval_environment(dscene, s.rd)
            radiance = radiance + jnp.where(_vec(miss & env_ok), weight * env, 0.0)
        alive = alive & s.isec_hit

        # ---- volume transmittance (src/trace.jl:306-326)
        if is_path and config.has_volumes:
            in_med = alive & s.has_vol
            rl, rng = rng_mod.rand1f(rng)
            rdist, rng = rng_mod.rand1f(rng)
            dist = bsdf_ops.sample_transmittance(s.vol_density, s.isec_t, rl, rdist)
            trans = bsdf_ops.eval_transmittance(s.vol_density, dist)
            tpdf = jax.lax.stop_gradient(
                bsdf_ops.sample_transmittance_pdf(s.vol_density, dist, s.isec_t)
            )
            weight = jnp.where(
                _vec(in_med), weight * trans / jnp.maximum(tpdf, 1e-30)[..., None], weight
            )
            in_volume = in_med & (dist < s.isec_t)
        else:
            in_volume = jnp.zeros(n, bool)
            dist = s.isec_t

        surf = alive & ~in_volume

        # ---- surface evaluation (src/scene.jl:416-673). Position and the
        # element normal come from the intersector; vertex/flag gathers only
        # happen when the scene actually carries those attributes.
        prim = jnp.clip(s.isec_prim, 0, dscene.prim_verts.shape[0] - 1)
        u, v = s.isec_u, s.isec_v
        position = s.isec_pos
        inst = s.isec_inst
        need_attrs = (
            config.has_texcoords or config.has_colors
            or config.has_vertex_normals or config.has_normal_maps
        )
        if need_attrs:
            vidx = dscene.prim_vidx[prim]
            flags = dscene.prim_flags[prim]
        else:
            vidx = flags = None
        verts = dscene.prim_verts[prim] if config.has_normal_maps else None
        if config.has_texcoords:
            texcoord = eval_ops.eval_texcoord(dscene, vidx, flags, u, v)
        else:
            texcoord = jnp.stack([u, v], axis=-1)
        if config.has_colors:
            shp_color = eval_ops.eval_color_attr(dscene, vidx, flags, u, v)
        else:
            shp_color = jnp.ones(u.shape + (4,), jnp.float32)
        # ---- curve/point attribute overrides (prim ids >= Q encode
        # lines then points; see curve_wrap)
        has_curves = config.n_lines > 0 or config.n_points > 0
        if has_curves:
            Q = dscene.prim_verts.shape[0]
            is_line = s.isec_hit & (s.isec_prim >= Q) & (
                s.isec_prim < Q + config.n_lines
            )
            is_point = s.isec_hit & (s.isec_prim >= Q + config.n_lines)
            if config.n_lines > 0:
                li = jnp.clip(s.isec_prim - Q, 0, config.n_lines - 1)
                lat = dscene.line_attr[li]  # [n, 2, 9]
                wu = u[:, None]
                l_tc = lat[:, 0, 3:5] * (1.0 - wu) + lat[:, 1, 3:5] * wu
                l_col = lat[:, 0, 5:9] * (1.0 - wu) + lat[:, 1, 5:9] * wu
                texcoord = jnp.where(_vec(is_line), l_tc, texcoord)
                shp_color = jnp.where(_vec(is_line), l_col, shp_color)
            if config.n_points > 0:
                pi = jnp.clip(
                    s.isec_prim - Q - config.n_lines, 0, config.n_points - 1
                )
                pat = dscene.point_attr[pi]  # [n, 9]
                texcoord = jnp.where(_vec(is_point), pat[:, 3:5], texcoord)
                shp_color = jnp.where(_vec(is_point), pat[:, 5:9], shp_color)
        # gather-free material eval for small scenes (select-chain over the
        # folded per-instance table); disabled in differentiable
        # (fixed-trip) mode where grads flow through dscene.materials,
        # which the dense table shadows
        dense_mats = 0 < config.n_instances <= 64 and options.fixed_iterations == 0
        if dense_mats and not config.has_textures:
            material = eval_ops.eval_material_dense(
                dscene, inst, shp_color, config.n_instances
            )
            normal_tex = jnp.full(n, -1, jnp.int32)  # no textures by construction
        elif dense_mats:
            from julia_raytracer_tpu.utils.vecmath import select_rows

            rows = select_rows(dscene.inst_mat_dense, inst, config.n_instances)
            material = eval_ops.eval_material_rows(dscene, rows, texcoord, shp_color)
            normal_tex = rows[..., 20].astype(jnp.int32)
        else:
            material = eval_ops.eval_material(dscene, inst, texcoord, shp_color)
            mid = dscene.inst_material[inst]
            normal_tex = dscene.materials.normal_tex[mid]
        normal = eval_ops.eval_shading_normal(
            dscene, s.isec_gn, verts, vidx, inst, flags, u, v, outgoing,
            material.type, normal_tex, texcoord,
            with_normalmap=config.has_normal_maps,
            with_vertex_normals=config.has_vertex_normals,
            refractive_present=int(4) in config.present_types,
            instanced=config.inst_tables is not None,
        )
        if has_curves:
            # lines: frame the tangent against the view
            # (orthonormalize(outgoing, tangent), src/scene.jl:511-515);
            # points: normal IS the outgoing direction (:516-518)
            from julia_raytracer_tpu.utils.vecmath import orthonormalize

            if config.n_lines > 0:
                normal = jnp.where(
                    _vec(is_line), orthonormalize(outgoing, s.isec_gn), normal
                )
            if config.n_points > 0:
                normal = jnp.where(_vec(is_point), outgoing, normal)

        max_roughness = s.max_roughness
        if is_path and options.nocaustics:
            # clamp roughness to the running max (src/trace.jl:349-354)
            max_roughness = jnp.where(
                surf, jnp.maximum(material.roughness, max_roughness), max_roughness
            )
            material = material._replace(
                roughness=jnp.where(surf, max_roughness, material.roughness)
            )

        # ---- stochastic opacity (src/trace.jl:356-364)
        if config.has_opacity:
            r_op, rng = rng_mod.rand1f(rng)
            op_skip = surf & (material.opacity < 1.0) & (r_op >= material.opacity)
            op_dead = op_skip & (s.opbounce > 128)
            alive = alive & ~op_dead
            op_skip = op_skip & ~op_dead
            opbounce = jnp.where(op_skip, s.opbounce + 1, s.opbounce)
            bounce = jnp.where(op_skip, bounce - 1, bounce)
            surf = surf & ~op_skip
        else:
            op_skip = jnp.zeros(n, bool)
            opbounce = s.opbounce

        # ---- first-hit AOVs (src/trace.jl:366-370)
        first = surf & (bounce == 0)
        hit_flag = s.hit_flag | first
        hit_albedo = jnp.where(_vec(first), material.color, s.hit_albedo)
        hit_normal = jnp.where(_vec(first), normal, s.hit_normal)

        # ---- emission (src/trace.jl:372)
        radiance = radiance + jnp.where(
            _vec(surf), weight * eval_ops.eval_emission(material, normal, outgoing), 0.0
        )

        # ---- direction sampling
        r_half, rng = rng_mod.rand1f(rng)
        rnl, rng = rng_mod.rand1f(rng)
        rn, rng = rng_mod.rand2f(rng)
        if is_path and has_lights:
            rl_pick, rng = rng_mod.rand1f(rng)
            rl_el, rng = rng_mod.rand1f(rng)
            rl_uv, rng = rng_mod.rand2f(rng)

        present = config.present_types
        delta = eval_ops.is_delta(material)
        if is_path:
            bsdf_dir = dispatch.sample_bsdfcos(
                material, normal, outgoing, rnl, rn, present=present
            )
            if has_lights:
                light_dir = lights_mod.sample_lights(
                    dscene, dscene.lights, counts, position, rl_pick, rl_el, rl_uv
                )
                nd_incoming = jnp.where(_vec(r_half < 0.5), bsdf_dir, light_dir)
            else:
                nd_incoming = jnp.where(_vec(r_half < 0.5), bsdf_dir, 0.0)
            d_incoming = dispatch.sample_delta(
                material, normal, outgoing, rnl, present=present
            )
            incoming = jnp.where(_vec(delta), d_incoming, nd_incoming)
        else:
            # naive: bsdf-importance only; rough-vs-delta on roughness != 0
            # (src/trace.jl:539-556)
            rough = material.roughness != 0.0
            bsdf_dir = dispatch.sample_bsdfcos(
                material, normal, outgoing, rnl, rn, present=present
            )
            d_incoming = dispatch.sample_delta(
                material, normal, outgoing, rnl, present=present
            )
            incoming = jnp.where(_vec(rough), bsdf_dir, d_incoming)
            delta = ~rough

        # detached sampling: sampled directions are not differentiated —
        # gradients flow through eval_bsdfcos/emission/textures only (the
        # standard detached path-replay estimator)
        incoming = jax.lax.stop_gradient(incoming)
        zero_inc = surf & (jnp.sum(jnp.abs(incoming), axis=-1) == 0.0)
        alive = alive & ~zero_inc
        surf = surf & ~zero_inc

        # ---- volume scatter direction (src/trace.jl:424-440)
        vol = alive & in_volume
        if is_path and config.has_volumes:
            vol_position = s.ro + s.rd * dist[..., None]
            phase_dir = dispatch.sample_scattering(s.vol_density, s.vol_aniso, outgoing, rn)
            if has_lights:
                vol_light_dir = lights_mod.sample_lights(
                    dscene, dscene.lights, counts, vol_position, rl_pick, rl_el, rl_uv
                )
                vol_incoming = jnp.where(_vec(r_half < 0.5), phase_dir, vol_light_dir)
            else:
                vol_incoming = phase_dir
            vol_incoming = jax.lax.stop_gradient(vol_incoming)
            vol_zero = vol & (jnp.sum(jnp.abs(vol_incoming), axis=-1) == 0.0)
            alive = alive & ~vol_zero
            vol = vol & ~vol_zero
        else:
            vol_position = position
            vol_incoming = incoming

        # ---- next ray (opacity skips continue straight, src/trace.jl:361-363)
        new_ro = jnp.where(
            _vec(op_skip),
            position + s.rd * 0.01,
            jnp.where(_vec(vol), vol_position, position),
        )
        new_rd = jnp.where(
            _vec(op_skip), s.rd, jnp.where(_vec(vol), vol_incoming, incoming)
        )

        # ---- wavefront sort BEFORE the traversal (TPU-native stream
        # compaction, SURVEY §7 step 6): lanes ordered by (liveness,
        # direction octant, morton(origin)) so each 1024-ray block shares
        # a direction octant AND an origin neighborhood. Position-only
        # keys leave bounce-ray block beams covering the whole scene
        # (kitchen: 131/177 superclusters per block); the octant bits cut
        # the per-block work list and per-row cluster unions. Dead lanes
        # compact to the tail where their blocks cull to nothing.
        if do_sort:
            key = _sort_key(new_ro, new_rd, scene_vmin, scene_vmax)
            key = jnp.where(alive, key, 0x7FFFFFFF)
            perm = jnp.argsort(key)
            (new_ro, new_rd, material, normal, outgoing, incoming,
             vol_incoming, delta, surf, vol, op_skip, weight, radiance,
             rng, bounce, opbounce, alive, hit_flag, hit_albedo,
             hit_normal, max_roughness, vd_c, vs_c, va_c, hv_c, idx_c) = (
                jax.tree_util.tree_map(
                    lambda a: a[perm],
                    (new_ro, new_rd, material, normal, outgoing, incoming,
                     vol_incoming, delta, surf, vol, op_skip, weight,
                     radiance, rng, bounce, opbounce, alive, hit_flag,
                     hit_albedo, hit_normal, max_roughness,
                     s.vol_density, s.vol_scattering, s.vol_aniso,
                     s.has_vol, s.idx),
                )
            )
        else:
            vd_c, vs_c, va_c, hv_c, idx_c = (
                s.vol_density, s.vol_scattering, s.vol_aniso, s.has_vol,
                s.idx,
            )

        # ---- ONE traversal: next bounce's hit + light-pdf march step 1.
        # Dead lanes carry tmax = -1, NOT RAY_EPS: a dead ray whose
        # origin sits inside a bbox still passes the slab test at tiny
        # positive tmax (enter clamps to tmin < exit), so dead tails
        # kept generating precull pairs / pack rows every bounce.
        # tmax < 0 makes the slab test unconditionally false — measured
        # (tools/liveness_ab.py, kitchen 512px): worklist 130->72 ms and
        # regroup 157->114 ms at 10% alive. No consumer reads dead
        # lanes' t (every accumulation is gated on `alive`), and
        # exp(-density * t) stays finite for t < 0.
        # JRT_DEAD_EPS=1 restores the r4 behavior (A/B harness only).
        dead_tmax = RAY_EPS if os.environ.get("JRT_DEAD_EPS") == "1" else -1.0
        tmax = jnp.where(alive, F32_MAX, dead_tmax)
        nxt = intersect(new_ro, new_rd, jnp.full(n, RAY_EPS), tmax)

        # ---- weight updates
        if is_path:
            # the pdf's extra marches re-trace TOWARD the sampled lights:
            # directionally convergent rays whose block footprints are
            # near their per-ray footprints, so they take the coherent
            # (primary) kernel — routing them through the regroup path
            # erased its bounce-dispatch win on kitchen (end-to-end A/B)
            lights_pdf = (
                lights_mod.sample_lights_pdf(
                    dscene, dscene.lights, counts, intersect_primary,
                    new_ro, new_rd, nxt,
                    extra_steps=options.light_pdf_extra_steps,
                )
                if has_lights
                else jnp.zeros(n, jnp.float32)
            )
            # non-delta surface MIS (src/trace.jl:375-397)
            f_nd = dispatch.eval_bsdfcos(
                material, normal, outgoing, incoming, present=present
            )
            pdf_b = dispatch.sample_bsdfcos_pdf(
                material, normal, outgoing, incoming, present=present
            )
            # pdfs are detached: the sampling measure is not differentiated
            denom_nd = jax.lax.stop_gradient(0.5 * pdf_b + 0.5 * lights_pdf)
            w_nd = f_nd / jnp.maximum(denom_nd, 1e-30)[..., None]
            # delta (src/trace.jl:398-403)
            f_d = dispatch.eval_delta(
                material, normal, outgoing, incoming, present=present
            )
            pdf_d = jax.lax.stop_gradient(
                dispatch.sample_delta_pdf(
                    material, normal, outgoing, incoming, present=present
                )
            )
            w_d = f_d / jnp.maximum(pdf_d, 1e-30)[..., None]
            w_surf = jnp.where(_vec(delta), w_d, w_nd)
            if config.has_volumes:
                # in-volume MIS (src/trace.jl:441-450)
                f_v = dispatch.eval_scattering(
                    vs_c, vd_c, va_c, outgoing, vol_incoming
                )
                pdf_v = dispatch.sample_scattering_pdf(
                    vd_c, va_c, outgoing, vol_incoming
                )
                denom_v = jax.lax.stop_gradient(0.5 * pdf_v + 0.5 * lights_pdf)
                w_vol = f_v / jnp.maximum(denom_v, 1e-30)[..., None]
                weight = jnp.where(
                    _vec(surf),
                    weight * w_surf,
                    jnp.where(_vec(vol), weight * w_vol, weight),
                )
            else:
                weight = jnp.where(_vec(surf), weight * w_surf, weight)
        else:
            f_r = dispatch.eval_bsdfcos(
                material, normal, outgoing, incoming, present=present
            )
            pdf_r = dispatch.sample_bsdfcos_pdf(
                material, normal, outgoing, incoming, present=present
            )
            f_d = dispatch.eval_delta(material, normal, outgoing, incoming, present=present)
            pdf_d = dispatch.sample_delta_pdf(
                material, normal, outgoing, incoming, present=present
            )
            pdf_r = jax.lax.stop_gradient(pdf_r)
            pdf_d = jax.lax.stop_gradient(pdf_d)
            w_r = f_r / jnp.maximum(pdf_r, 1e-30)[..., None]
            w_d = f_d / jnp.maximum(pdf_d, 1e-30)[..., None]
            weight = jnp.where(
                _vec(surf), weight * jnp.where(_vec(delta), w_d, w_r), weight
            )

        # ---- volume stack push/pop (src/trace.jl:405-421)
        vol_density, vol_scattering, vol_aniso, has_vol = (
            vd_c, vs_c, va_c, hv_c,
        )
        if is_path and config.has_volumes:
            transmitted = (
                eval_ops.is_volumetric_type(material.type)
                & (dot(normal, outgoing) * dot(normal, incoming) < 0)
                & surf
            )
            push = transmitted & ~hv_c
            pop = transmitted & hv_c
            vol_density = jnp.where(_vec(push), material.density, vol_density)
            vol_scattering = jnp.where(_vec(push), material.scattering, vol_scattering)
            vol_aniso = jnp.where(push, material.scanisotropy, vol_aniso)
            has_vol = jnp.where(push, True, jnp.where(pop, False, has_vol))

        # ---- weight zero / non-finite break (src/trace.jl:455-457)
        stepped = (surf | vol) & alive
        w_zero = jnp.sum(jnp.abs(weight), axis=-1) == 0.0
        w_bad = ~jnp.all(jnp.isfinite(weight), axis=-1)
        alive = alive & ~(stepped & (w_zero | w_bad))

        # ---- Russian roulette (src/trace.jl:459-465)
        r_rr, rng = rng_mod.rand1f(rng)
        rr_lane = stepped & alive & (bounce > 3)
        rr_prob = jax.lax.stop_gradient(jnp.minimum(0.99, jnp.max(weight, axis=-1)))
        rr_die = rr_lane & (r_rr >= rr_prob)
        alive = alive & ~rr_die
        weight = jnp.where(
            _vec(rr_lane & ~rr_die), weight / jnp.maximum(rr_prob, 1e-30)[..., None], weight
        )

        # ---- loop condition (while bounce < bounces, src/trace.jl:295)
        alive = alive & (bounce < options.bounces)

        new_s = S(
            ro=new_ro,
            rd=new_rd,
            isec_hit=nxt.hit,
            isec_prim=nxt.prim,
            isec_u=nxt.u,
            isec_v=nxt.v,
            isec_t=nxt.t,
            isec_pos=nxt.position,
            isec_gn=nxt.gnormal,
            isec_inst=nxt.instance,
            radiance=radiance,
            weight=weight,
            rng=rng,
            bounce=bounce,
            opbounce=opbounce,
            alive=alive,
            hit_flag=hit_flag,
            hit_albedo=hit_albedo,
            hit_normal=hit_normal,
            max_roughness=max_roughness,
            vol_density=vol_density,
            vol_scattering=vol_scattering,
            vol_aniso=vol_aniso,
            has_vol=has_vol,
            idx=idx_c,
        )
        return new_s

    def cond(s: S):
        return jnp.any(s.alive)

    if alive_trace:
        # diagnostics (tools/alive_profile.py): fixed-trip scan emitting
        # the per-iteration alive count — sizes the dead-lane work the
        # while_loop pays running every lane to the LAST survivor
        def step_dbg(s, _):
            ns = body(s)
            return ns, jnp.sum(ns.alive.astype(jnp.int32))

        final, alive_counts = jax.lax.scan(
            step_dbg, state, None, length=options.bounces + 10
        )
    elif options.fixed_iterations > 0:
        # fixed-trip scan: reverse-mode differentiable; remat each bounce so
        # backward memory stays O(state) per iteration instead of O(residuals)
        step = jax.checkpoint(lambda s, _: (body(s), None))
        final, _ = jax.lax.scan(step, state, None, length=options.fixed_iterations)
    elif (os.environ.get("JRT_COMPACT", "1")
          not in ("0",)
          and n >= int(os.environ.get("JRT_COMPACT_MIN") or 16384)
          and (do_sort or os.environ.get("JRT_COMPACT") == "xla"
               or n % pallas_compact.TILE == 0)
          # unsorted compaction is default-on only where it was
          # measured to win (TPU; the Pallas kernels otherwise run in
          # interpret mode) — sorted slices are cheap everywhere.
          # Setting JRT_COMPACT explicitly overrides (tests do).
          and (do_sort or "JRT_COMPACT" in os.environ
               or jax.default_backend() == "tpu")):
        # two-phase dispatch (VERDICT r4 item 4): the while_loop runs
        # EVERY lane to the LAST survivor's bounce, but the alive
        # fraction collapses fast (cornellbox 512px, tools/
        # alive_profile.py: [0.93, 0.35, 0.16, 0.07, 0.01, ...] — ideal
        # compaction speedup 3.6x). Phase A runs full width until the
        # survivors fit an n/4 buffer; the tail loop runs narrow and the
        # results merge back. Dead lanes' outputs are final by
        # construction (the single-loop design already relied on that
        # invariant), so the image is bit-identical.
        #
        # The merge mechanics are liveness-sort aware, because XLA
        # gather/scatter at state scale is latency-bound (~2-9 ms per
        # field at 262k lanes, measured — a gather/scatter phase
        # boundary COST more than the narrow loop saved):
        # - do_sort scenes: body already sorts lanes (liveness, morton)
        #   every iteration, and alive only decays within an iteration,
        #   so after one extra body() call every alive lane lives in the
        #   first <= cap slots — compaction is a SLICE and the merge a
        #   contiguous dynamic_update_slice; the existing idx-unsort
        #   restores order. Zero gathers.
        # - non-sort scenes: the Pallas lane-compactor boundary
        #   (ops/pallas_compact.py) — default ON since round 5
        #   (flagship 26.5 -> ~35 Mpaths/s measured); requires
        #   n % 1024 == 0 (other widths run the plain loop).
        #   JRT_COMPACT=xla keeps the old argsort/gather boundary
        #   (measured net-negative on cornellbox) for A/B.
        # boundary positions: each level's phase loop drains until
        # survivors fit width/DIV, then the state narrows and the next
        # level repeats. Per-path optima differ (KNOBS_r05): sorted
        # slices are nearly free, so frequent shallow narrowing wins
        # (kitchen DIV 2/4/8 -> 2,663/2,805/2,792 ms/sample; LEVELS
        # 3/4/5 at DIV=2 -> 2,663/2,657/2,645); Pallas boundaries cost
        # ~0.5-1.3 ms each, so fewer deeper ones win (flagship DIV
        # 2/4/8 -> 31.8/35.3/34.3 Mpaths/s windowed, steady-state
        # 45.1/46.9/47.4 for LEVELS 1/2/3 at DIV=4).
        # instanced scenes cap at 3 levels: each extra level re-
        # instantiates the (huge) hybrid body — ecosys at DIV=2/L5
        # cold-compiled 31 min for a further -2.4% ms/sample
        div = max(2, int(os.environ.get("JRT_COMPACT_DIV")
                         or (2 if do_sort else 4)))
        deep_ok = config.inst_tables is None
        levels = max(1, int(os.environ.get("JRT_COMPACT_LEVELS")
                            or (5 if do_sort and deep_ok else 3)))

        def _phase_cap(width):
            c = max(4096, width // div)
            return -(-c // 128) * 128

        def _drain(cur, c):
            return jax.lax.while_loop(
                lambda s: jnp.sum(s.alive.astype(jnp.int32)) > c,
                body, cur)

        if do_sort:
            # sorted wavefronts: the in-body (liveness, morton) sort
            # packs survivors into the prefix every iteration, so each
            # boundary is ONE extra body() + a slice, and the merge a
            # contiguous dynamic_update_slice. Zero gathers; the
            # recursion just repeats the trick at width/div^L.
            snaps, cur, width = [], state, n
            for _ in range(levels):
                c = _phase_cap(width)
                if c >= width:
                    break
                sA = _drain(cur, c)
                sA = body(sA)  # packs <= c survivors into the prefix
                snaps.append(sA)
                cur = jax.tree_util.tree_map(lambda a: a[:c], sA)
                width = c
            final = jax.lax.while_loop(cond, body, cur)
            for sA in reversed(snaps):
                final = jax.tree_util.tree_map(
                    lambda full, nar: jax.lax.dynamic_update_slice(
                        full, nar, (0,) * full.ndim),
                    sA, final)
        elif (os.environ.get("JRT_COMPACT") != "xla"
              and n % pallas_compact.TILE == 0):
            # unsorted tiny tier: the Pallas lane-compactor boundary
            # (ops/pallas_compact.py). Every XLA formulation measured
            # ~8.3 ms/sample against 3.9 ms of narrow-loop savings
            # (DESIGN_compact.md); the Pallas kernels move the ~45
            # state planes below that floor. Bit-exact incl. uint32
            # rng and NaN payloads (tests/test_compact.py; payloads
            # ride int32 end to end). JRT_COMPACT=xla keeps the old
            # argsort/gather boundary for A/B.
            interp = jax.default_backend() != "tpu"
            snaps, cur, width = [], state, n
            for _ in range(levels):
                c = _phase_cap(width)
                if c >= width or width % pallas_compact.TILE:
                    break
                sA = _drain(cur, c)
                total = jnp.sum(sA.alive.astype(jnp.int32))
                leavesA, treedef = jax.tree_util.tree_flatten(sA)
                packed = pallas_compact.compact_state(
                    leavesA, sA.alive, c, interpret=interp)
                sN = jax.tree_util.tree_unflatten(treedef, packed)
                # slack lanes beyond the survivor count hold
                # unspecified bits; dead lanes are harmless
                # (alive-gated accumulation, tmax<0 dispatch) but the
                # mask itself must be real
                sN = sN._replace(
                    alive=sN.alive
                    & (jnp.arange(c, dtype=jnp.int32) < total))
                snaps.append(sA)
                cur, width = sN, c
            fN = jax.lax.while_loop(cond, body, cur)
            outs5 = [fN.radiance, fN.hit_flag, fN.hit_albedo,
                     fN.hit_normal, fN.rng]
            for sA in reversed(snaps):
                outs5 = pallas_compact.expand_outputs(
                    outs5, sA.alive,
                    [sA.radiance, sA.hit_flag, sA.hit_albedo,
                     sA.hit_normal, sA.rng],
                    interpret=interp)
            base = snaps[0] if snaps else fN
            final = base._replace(
                radiance=outs5[0], hit_flag=outs5[1],
                hit_albedo=outs5[2], hit_normal=outs5[3], rng=outs5[4])
        else:
            cap = _phase_cap(n)
            stateA = _drain(state, cap)
            perm = jnp.argsort(~stateA.alive)  # stable: alive-first
            sel = perm[:cap]
            sN = jax.tree_util.tree_map(lambda a: a[sel], stateA)
            fN = jax.lax.while_loop(cond, body, sN)
            final = jax.tree_util.tree_map(
                lambda full, nar: full.at[sel].set(nar), stateA, fN)
    else:
        final = jax.lax.while_loop(cond, body, state)
    outs = (final.radiance, final.hit_flag, final.hit_albedo, final.hit_normal, final.rng)
    if do_sort:
        inv = jnp.argsort(final.idx)
        outs = jax.tree_util.tree_map(lambda a: a[inv], outs)
    if alive_trace:
        return outs + (alive_counts,)
    return outs
