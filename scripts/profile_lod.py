#!/usr/bin/env python
"""Large-scene LOD profiling: does frame cost track ACTIVE triangles?

Builds a 4K instanced crowd (~300k authored triangles, most instances
distant) twice — with and without mesh LODs (ops/lod.py) — and measures
the full frame plus a stage split (binning sort / kernel / shading) on
the real chip.  The reference scales geometry only by whole-mesh frustum
culling (/root/reference/FrustumCuller.cs:201); this script is the
evidence ledger for BENCHMARKS.md's mesh-LOD row.

JSON lines to stdout.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def build_instances(with_lod: bool):
    """24×24 sphere grid receding from the camera (same placement both
    fields — LOD on/off must see identical geometry)."""
    from softwarerenderer_tpu.models import primitives, scene as scene_mod
    from softwarerenderer_tpu.ops import lod
    from softwarerenderer_tpu.utils import mathlib as ml

    mesh = primitives.uv_sphere(0.45, rings=14, sectors=20)  # 532 tris
    if with_lod:
        mesh = lod.add_lods(mesh, cells=(8, 4), px=(60.0, 24.0))
    rng = np.random.default_rng(7)
    insts = []
    for gz in range(24):
        for gx in range(24):
            x = (gx - 11.5) * 2.2 + rng.uniform(-0.4, 0.4)
            z = -4.0 - gz * 2.6 + rng.uniform(-0.4, 0.4)
            y = rng.uniform(-0.5, 0.5)
            insts.append(scene_mod.MeshInstance(
                mesh, ml.translation([x, y, z])))
    return insts


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--only", nargs="*", default=None,
                    help="measure only these config tags (compiles are "
                         "minutes each on this host — skip the rest)")
    ap.add_argument("--span-cap", type=int, default=None,
                    help="override RenderParams.span_cap: with pair_cap "
                         "compaction the pair table tracks LIVE pairs, so "
                         "a bigger span keeps wide triangles binned "
                         "instead of global (globals fold on EVERY tile)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import (Engine, camera_matrices,
                                             scene_fragment_shader,
                                             scene_vertex_shader)
    from softwarerenderer_tpu.models import scene as scene_mod
    from softwarerenderer_tpu.ops import binning, culling, geometry, lod, \
        pallas_tile, raster
    from softwarerenderer_tpu.utils import mathlib as ml
    from softwarerenderer_tpu.utils.profiling import timed_frames

    W, H = args.width, args.height
    base_params = RenderParams(width=W, height=H)
    if args.span_cap is not None:
        base_params = base_params.replace(span_cap=args.span_cap)

    def measure(tag, sc_host, cap_mode=None):
        if args.only is not None and tag not in args.only:
            return
        sc_np = scene_mod.build_scene_buffers(sc_host)
        sc = jax.device_put(sc_np)
        u0 = dict(Engine(sc, base_params).uniforms)
        u0["camera_position"] = np.asarray([0.0, 0.3, 2.0], np.float32)
        u0["far_clip"] = np.float32(200.0)
        u0["fog_start"] = np.float32(150.0)
        u0["fog_end"] = np.float32(220.0)

        n_tri = int(sc["indices"].shape[0])
        host_sc = {k: np.asarray(v) for k, v in sc.items()}
        if "tri_lod_level" in host_sc:
            active = int(np.sum(lod.lod_tri_mask(host_sc, u0, H, xp=np)))
        else:
            active = n_tri

        if cap_mode == "suggested":
            # the always-exact static bound (ignores culling/selection)
            cap = lod.suggested_active_cap(sc_np)
        elif cap_mode in ("tight", "tight_pair", "tight_pair_lazy",
                          "tight_defer"):
            # workload-chosen cap: this camera's active slots + 25%
            # headroom, 128-aligned — exactness guarded by the traced
            # n_valid overflow counter (compact_triangles docstring)
            cap = -(-int(2 * active * 1.25) // 128) * 128
        elif cap_mode in ("valid_defer", "geom"):
            # cap from the frame's MEASURED valid-slot count (the
            # active_cap_overflow counter's quantity): the LOD-mask bound
            # above overshoots ~5× because backface culling halves the
            # selected triangles and fan slots rarely fire — and every
            # cap-proportional stage (materialize gathers, setup/payload
            # builds) pays for the overshoot.  Placeholder; measured
            # below once prep is defined.
            cap = 0          # measured below once prep is defined
        else:
            cap = 0
        params = base_params.replace(active_cap=cap)

        def report(sub, fn, n=args.frames):
            jf = jax.jit(fn)
            t0 = time.time()

            def step(i):
                u = dict(u0)
                u["fov_degrees"] = np.float32(90.0 + 0.01 * i)
                return jf(sc, u)

            spf = timed_frames(step, n)
            print(json.dumps({
                "tag": f"{tag}_{sub}", "ms": round(spf * 1e3, 2),
                "fps": round(1 / spf, 2), "tris_packed": n_tri,
                "tris_active": active, "active_cap": cap,
                "pair_cap": params.pair_cap,
                "compile_s": round(time.time() - t0 - spf * n, 1)}),
                flush=True)

        def prep(scene, u):
            view, proj = camera_matrices(u, W, H)
            vp = ml.transform(view, proj, xp=jnp)
            visible = culling.spheres_in_frustum(
                scene["bounds_center"], scene["bounds_radius"],
                scene["mesh_matrices"], vp, xp=jnp)
            tri_mask = jnp.take(visible, scene["tri_mesh_id"])
            if "tri_lod_level" in scene:
                tri_mask = tri_mask & lod.lod_tri_mask(scene, u, H, xp=jnp)
            model_pv = jnp.take(scene["mesh_matrices"],
                                scene["vert_mesh_id"], axis=0)
            uu = dict(u)
            uu.update(model=model_pv, view=view, projection=proj,
                      atlas_data=scene["atlas_data"],
                      atlas_offsets=scene["atlas_offsets"],
                      atlas_sizes=scene["atlas_sizes"],
                      base_color=scene["base_color"])
            vin = {k: scene[k]
                   for k in ("position", "uv", "normal", "color")}
            tris = geometry.build_triangles(
                scene_vertex_shader, vin, scene["indices"], uu, width=W,
                height=H, cull_mode=params.cull_mode,
                near_clip=uu["near_clip"], tri_mask=tri_mask,
                keep_varyings=scene_fragment_shader.varyings,
                defer_attrs=cap_mode in ("tight_defer", "valid_defer",
                                         "geom"))
            tid2 = jnp.repeat(scene["tri_texture_id"], 2)
            aoff = jnp.asarray(scene["atlas_offsets"], jnp.int32)
            asiz = jnp.asarray(scene["atlas_sizes"], jnp.int32)
            per_tri = {"tex_oy": jnp.take(aoff[:, 0], tid2),
                       "tex_ox": jnp.take(aoff[:, 1], tid2),
                       "tex_h": jnp.take(asiz[:, 0], tid2),
                       "tex_w": jnp.take(asiz[:, 1], tid2)}
            if params.active_cap:
                tris, per_tri, _ = geometry.compact_triangles(
                    tris, params.active_cap, per_tri,
                    lazy_attrs=(cap_mode == "tight_pair_lazy"))
            if cap_mode in ("tight_defer", "valid_defer", "geom") \
                    and params.active_cap:
                tris = geometry.materialize_attrs(tris)
            fb_d = jnp.full((H, W), raster.DEPTH_CLEAR, jnp.float32)
            return tris, uu, per_tri, fb_d

        if cap_mode in ("valid_defer", "geom"):
            def count_valid(scene, u):
                tris = prep(scene, u)[0]
                return jnp.sum(tris["valid"].astype(jnp.int32))
            nv = int(jax.jit(count_valid)(sc, u0))
            cap = -(-int(nv * 1.25) // 128) * 128
            params = params.replace(active_cap=cap)
        if cap_mode in ("tight_pair", "tight_pair_lazy", "tight_defer",
                        "valid_defer", "geom"):
            # workload-chosen pair-table cap: this camera's live
            # (tile, triangle) pairs + 25% headroom, 128-aligned —
            # exactness guarded by the traced pair_cap_overflow counter.
            def live_counts(scene, u):
                tris = prep(scene, u)[0]
                bins = binning.bin_triangles(
                    tris, params, 32, params.tile_w, params.span_cap, 0)
                return jnp.sum(bins["counts"]), bins["n_global"]
            live, nglob = map(int, jax.jit(live_counts)(sc, u0))
            params = params.replace(
                pair_cap=-(-int(live * 1.25) // 128) * 128)
            if cap_mode in ("tight_pair_lazy", "tight_defer",
                            "valid_defer", "geom"):
                # + global-stream truncation (params.global_cap) and lazy
                # attr compaction — guarded by global_cap_overflow.
                params = params.replace(
                    global_cap=max(256, -(-int(nglob * 2) // 128) * 128))
        if cap_mode == "geom":
            # + pre-geometry compaction (params.geom_cap): assemble/clip/
            # setup run on the masked-in INPUT triangles — sized from the
            # measured LOD-mask count ×1.25, guarded by the traced
            # geom_cap_overflow counter.
            params = params.replace(
                geom_cap=-(-int(active * 1.25) // 128) * 128)
        eng = Engine(sc, params)

        def full(scene, u):
            c, d = eng._frame(scene, u)
            return jnp.sum(c[..., 0]) + jnp.sum(d)

        def bin_only(scene, u):
            tris, uu, per_tri, fb_d = prep(scene, u)
            bins = binning.bin_triangles(tris, params, 32, params.tile_w,
                                         params.span_cap, 0)
            return (jnp.sum(bins["counts"]) + jnp.sum(bins["starts"])
                    + bins["n_global"])

        def kernel_only(scene, u):
            tris, uu, per_tri, fb_d = prep(scene, u)
            ctx = pallas_tile._prepare_ctx(
                tris, params, fb_d, per_tri, 0,
                gb_keep=pallas_tile._gb_keep(scene_fragment_shader))
            frag, bd, bi = pallas_tile._run_pass(ctx, False)
            return jnp.sum(bd) + jnp.sum(bi)

        def prep_only(scene, u):
            tris, uu, per_tri, fb_d = prep(scene, u)
            leaves = jax.tree_util.tree_leaves(tris)
            return sum(jnp.sum(l) for l in leaves if l.dtype == jnp.float32)

        report("full", full)
        if cap_mode == "geom":
            return   # prep/bin/kernel splits don't model geom_cap
        report("prep_only", prep_only)
        report("bin_only", bin_only)
        report("kernel_only", kernel_only)

    measure("nolod", build_instances(False))
    measure("lod", build_instances(True))
    # active-slot compaction (geometry.compact_triangles): stream cost
    # should now track ACTIVE triangles, making LOD a win, not a loss
    measure("lod_cap", build_instances(True), cap_mode="suggested")
    measure("lod_cap_tight", build_instances(True), cap_mode="tight")
    # + pair-table truncation (params.pair_cap): the pair sort and the
    # Pallas stream gathers track live tile overlap, not cap*span_cap
    measure("lod_cap_pair", build_instances(True), cap_mode="tight_pair")
    # + lazy attr compaction (payload gathers ride the composed
    # permutation — cost ∝ stream lengths) + global-stream truncation
    measure("lod_cap_pair_lazy", build_instances(True),
            cap_mode="tight_pair_lazy")
    # + deferred varying materialization (geometry.materialize_attrs
    # runs AFTER compaction — the engine default with active_cap): the
    # per-slot vertex gathers scale with cap, not packed slots
    measure("lod_cap_defer", build_instances(True),
            cap_mode="tight_defer")
    # + cap sized from the frame's MEASURED valid-slot count (×1.25,
    # overflow-guarded): the LOD-mask bound overshoots ~5× (backface
    # culling), and materialize/setup/payload all scale with cap
    measure("lod_cap_valid", build_instances(True),
            cap_mode="valid_defer")
    # + pre-geometry compaction (params.geom_cap): the BUILD stage
    # (assemble/clip/setup — the remaining ~34 ms at 1.17M packed slots,
    # scripts/profile_build_stages.py) also scales with active triangles
    measure("lod_cap_geom", build_instances(True), cap_mode="geom")


if __name__ == "__main__":
    main()
