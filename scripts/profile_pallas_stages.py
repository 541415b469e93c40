#!/usr/bin/env python
"""Sub-stage timing of the Pallas tile frame: prep / kernel / shade / blend.

JSON lines; Mosaic-safe methodology (utils.profiling.timed_frames).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import bench
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import (Engine, camera_matrices,
                                             default_frame_uniforms,
                                             scene_fragment_shader,
                                             scene_vertex_shader)
    from softwarerenderer_tpu.ops import culling, geometry, pallas_tile
    from softwarerenderer_tpu.utils import mathlib as ml
    from softwarerenderer_tpu.utils.profiling import timed_frames

    W, H = args.width, args.height
    scene = jax.device_put(bench.build_scene())
    params = RenderParams(width=W, height=H, use_pallas=True)
    u0 = bench.camera_uniforms(default_frame_uniforms(W, H))

    def report(name, fn):
        t0 = time.time()
        spf = timed_frames(fn, args.frames)
        print(json.dumps({
            "stage": name, "ms": round(spf * 1e3, 3),
            "compile_s": round(time.time() - t0 - spf * args.frames, 1),
        }), flush=True)

    def vary(i):
        return bench.camera_uniforms(u0, i)

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
        uu.update(model=model_pv, view=view, projection=proj,
                  atlas_data=scene["atlas_data"],
                  atlas_offsets=scene["atlas_offsets"],
                  atlas_sizes=scene["atlas_sizes"],
                  base_color=scene["base_color"])
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        tris = geometry.build_triangles(
            scene_vertex_shader, vin, scene["indices"], uu,
            width=W, height=H, cull_mode=params.cull_mode,
            near_clip=uu["near_clip"], tri_mask=tri_mask,
            keep_varyings=scene_fragment_shader.varyings)
        tid2 = jnp.repeat(scene["tri_texture_id"], 2)
        aoff = jnp.asarray(scene["atlas_offsets"], jnp.int32)
        asiz = jnp.asarray(scene["atlas_sizes"], jnp.int32)
        per_tri = {"tex_oy": jnp.take(aoff[:, 0], tid2),
                   "tex_ox": jnp.take(aoff[:, 1], tid2),
                   "tex_h": jnp.take(asiz[:, 0], tid2),
                   "tex_w": jnp.take(asiz[:, 1], tid2)}
        return tris, uu, per_tri

    @jax.jit
    def to_kernel(scene, u):
        tris, uu, per_tri = build_tris(scene, u)
        fbd = jnp.full((H, W), -jnp.inf, jnp.float32)
        ctx = pallas_tile._prepare_ctx(tris, params, fbd, per_tri, 0)
        frag, best_d, best_i = pallas_tile._run_pass(ctx, False)
        return best_d, best_i

    report("prep_plus_kernel", lambda i: to_kernel(scene, vary(i)))

    eng = Engine(scene, params)
    u0full = bench.camera_uniforms(eng.uniforms)

    def vary_full(i):
        return bench.camera_uniforms(u0full, i)

    @jax.jit
    def full_shade(scene, u):
        tris, uu, per_tri = build_tris(scene, u)
        fbd = jnp.full((H, W), -jnp.inf, jnp.float32)
        ctx = pallas_tile._prepare_ctx(tris, params, fbd, per_tri, 0)
        frag, best_d, best_i = pallas_tile._run_pass(ctx, False)
        color = scene_fragment_shader(frag, uu, jnp)
        return color, best_d

    report("prep_kernel_shade", lambda i: full_shade(scene, vary_full(i)))
    report("full_frame", lambda i: eng.render(vary_full(i)))


if __name__ == "__main__":
    main()
