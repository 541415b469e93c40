#!/usr/bin/env python
"""Phase-level profiling of the 1080p dust2 frame on the real chip.

Times each stage with the Mosaic-safe pipelined methodology
(utils.profiling.timed_frames) so Pallas custom-calls can't under-report.
Prints one JSON object per stage.  Use to steer kernel work; not part of
the driver bench.

Usage: python scripts/profile_kernels.py [--frames N] [--stages a,b,c]
"""

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--stages", type=str, default="")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import bench
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import (Engine, camera_matrices,
                                             default_frame_uniforms,
                                             render_frame,
                                             scene_fragment_shader,
                                             scene_vertex_shader)
    from softwarerenderer_tpu.models import scene as scene_mod
    from softwarerenderer_tpu.ops import binning, culling, geometry
    from softwarerenderer_tpu.utils import mathlib as ml
    from softwarerenderer_tpu.utils.profiling import timed_frames

    W, H = args.width, args.height
    scene = jax.device_put(bench.build_scene())
    params = RenderParams(width=W, height=H)
    u0 = bench.camera_uniforms(default_frame_uniforms(W, H))
    want = set(args.stages.split(",")) if args.stages else None

    def report(name, fn):
        if want is not None and name not in want:
            return
        t0 = time.time()
        spf = timed_frames(fn, args.frames)
        print(json.dumps({
            "stage": name, "ms": round(spf * 1e3, 3),
            "mpix_s": round(W * H / spf / 1e6, 2),
            "compile_s": round(time.time() - t0 - spf * args.frames, 1),
        }), flush=True)

    def vary(i):
        return bench.camera_uniforms(u0, i)

    # ---- full frames --------------------------------------------------
    eng = Engine(scene, params)
    report("frame_xla_fused", lambda i: eng.render(vary(i)))

    engp = Engine(scene, params.replace(use_pallas=True))
    report("frame_pallas_tile", lambda i: engp.render(vary(i)))

    # ---- dispatch floor: empty scene (everything culled) ---------------
    empty_u = dict(u0)
    empty_u["camera_position"] = np.float32([0.0, -5000.0, 0.0])
    report("frame_xla_empty",
           lambda i: eng.render(bench.camera_uniforms(empty_u, i)
                                | {"camera_position":
                                   np.float32([0, -5000 - i, 0])}))
    report("frame_pallas_empty",
           lambda i: engp.render(bench.camera_uniforms(empty_u, i)
                                 | {"camera_position":
                                    np.float32([0, -5000 - i, 0])}))

    # ---- geometry + binning only ---------------------------------------
    @functools.partial(jax.jit, static_argnames=())
    def geo_only(scene, u):
        view, proj = camera_matrices(u, W, H)
        view_proj = ml.transform(view, proj, xp=jnp)
        visible = culling.spheres_in_frustum(
            scene["bounds_center"], scene["bounds_radius"],
            scene["mesh_matrices"], view_proj, xp=jnp)
        tri_mask = jnp.take(visible, scene["tri_mesh_id"])
        model_pv = jnp.take(scene["mesh_matrices"], scene["vert_mesh_id"],
                            axis=0)
        uu = dict(u)
        uu.update(model=model_pv, view=view, projection=proj)
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        tris = geometry.build_triangles(
            scene_vertex_shader, vin, scene["indices"], uu,
            width=W, height=H, cull_mode=params.cull_mode,
            near_clip=uu["near_clip"], tri_mask=tri_mask,
            keep_varyings=scene_fragment_shader.varyings)
        bins = binning.bin_triangles(tris, params, params.tile_h,
                                     params.tile_w, params.span_cap)
        return tris["screen"], bins["sorted_tri"], bins["n_global"]

    report("geometry_binning", lambda i: geo_only(scene, vary(i)))

    # ---- pre-stage breakdown: geometry alone / + binning / + streams ----
    def build_tris(scene, u):
        view, proj = camera_matrices(u, W, H)
        view_proj = ml.transform(view, proj, xp=jnp)
        visible = culling.spheres_in_frustum(
            scene["bounds_center"], scene["bounds_radius"],
            scene["mesh_matrices"], view_proj, xp=jnp)
        tri_mask = jnp.take(visible, scene["tri_mesh_id"])
        model_pv = jnp.take(scene["mesh_matrices"], scene["vert_mesh_id"],
                            axis=0)
        uu = dict(u)
        uu.update(model=model_pv, view=view, projection=proj)
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        return geometry.build_triangles(
            scene_vertex_shader, vin, scene["indices"], uu,
            width=W, height=H, cull_mode=params.cull_mode,
            near_clip=uu["near_clip"], tri_mask=tri_mask,
            keep_varyings=scene_fragment_shader.varyings)

    @jax.jit
    def geom_alone(scene, u):
        tris = build_tris(scene, u)
        return tris["screen"], tris["depth"]

    report("geometry_only", lambda i: geom_alone(scene, vary(i)))

    @jax.jit
    def through_streams(scene, u):
        from softwarerenderer_tpu.ops import pallas_tile
        tris = build_tris(scene, u)
        fbd = jnp.full((H, W), -jnp.inf, jnp.float32)
        ctx = pallas_tile._prepare_ctx(tris, params, fbd, None, 0)
        return ctx["seg_p"], ctx["glob_s"], ctx["seg_s"]

    report("geometry_binning_streams",
           lambda i: through_streams(scene, vary(i)))

    # ---- visibility fold only (XLA binned) ------------------------------
    from softwarerenderer_tpu.ops.binning import visibility_binned

    @functools.partial(jax.jit, static_argnames=())
    def vis_only(scene, u):
        view, proj = camera_matrices(u, W, H)
        view_proj = ml.transform(view, proj, xp=jnp)
        visible = culling.spheres_in_frustum(
            scene["bounds_center"], scene["bounds_radius"],
            scene["mesh_matrices"], view_proj, xp=jnp)
        tri_mask = jnp.take(visible, scene["tri_mesh_id"])
        model_pv = jnp.take(scene["mesh_matrices"], scene["vert_mesh_id"],
                            axis=0)
        uu = dict(u)
        uu.update(model=model_pv, view=view, projection=proj)
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        tris = geometry.build_triangles(
            scene_vertex_shader, vin, scene["indices"], uu,
            width=W, height=H, cull_mode=params.cull_mode,
            near_clip=uu["near_clip"], tri_mask=tri_mask,
            keep_varyings=scene_fragment_shader.varyings)
        return visibility_binned(tris, params, params.chunk,
                                 tile_h=params.tile_h, tile_w=params.tile_w,
                                 span_cap=params.span_cap,
                                 tile_group=params.tile_group)

    report("geometry_plus_fold_xla", lambda i: vis_only(scene, vary(i)))


if __name__ == "__main__":
    main()
