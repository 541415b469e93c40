#!/usr/bin/env python
"""4K stage breakdown for BASELINE config 5 (VERDICT r2 #4).

Measures, on the real chip at 3840×2160:
  * the full frame (engine default = Pallas tile kernel)
  * geometry + binning + kernel only (no shading)
  * the shading pass's texel row-gather in isolation (8.3M-element take)
  * an empty-scene frame (the fixed floor at 4K)

JSON lines to stdout; the numbers feed BENCHMARKS.md's 4K analysis.
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


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import (Engine, camera_matrices,
                                             scene_fragment_shader,
                                             scene_vertex_shader)
    from softwarerenderer_tpu.models import scene as scene_mod
    from softwarerenderer_tpu.ops import culling, geometry, pallas_tile, \
        raster
    from softwarerenderer_tpu.utils import mathlib as ml
    from softwarerenderer_tpu.utils.profiling import timed_frames

    W, H = 3840, 2160
    insts, _, _, ufn, ekw = bench.config_workload(5)
    sc = jax.device_put(scene_mod.build_scene_buffers(insts))
    params = RenderParams(width=W, height=H)

    eng = Engine(sc, params, **ekw)
    u0 = dict(eng.uniforms)
    if ufn:
        ufn(u0, sc)

    def report(tag, fn, n=args.frames):
        jf = jax.jit(fn)
        t0 = time.time()

        def step(i):
            u = dict(u0)
            u["fov_degrees"] = np.float32(90.0 + 0.01 * i)
            return jf(sc, u)

        spf = timed_frames(step, n)
        print(json.dumps({"tag": tag, "ms": round(spf * 1e3, 2),
                          "fps": round(1 / spf, 2),
                          "compile_s": round(time.time() - t0 - spf * n,
                                             1)}), flush=True)
        return spf

    def prep(scene, u):
        view, proj = camera_matrices(u, W, H)
        vp = ml.transform(view, proj, xp=jnp)
        visible = culling.spheres_in_frustum(
            scene["bounds_center"], scene["bounds_radius"],
            scene["mesh_matrices"], vp, xp=jnp)
        tri_mask = jnp.take(visible, scene["tri_mesh_id"])
        model_pv = jnp.take(scene["mesh_matrices"],
                            scene["vert_mesh_id"], axis=0)
        uu = dict(u)
        uu.update(model=model_pv, view=view, projection=proj,
                  atlas_data=scene["atlas_data"],
                  atlas_offsets=scene["atlas_offsets"],
                  atlas_sizes=scene["atlas_sizes"],
                  base_color=scene["base_color"])
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        tris = geometry.build_triangles(
            scene_vertex_shader, vin, scene["indices"], uu, width=W,
            height=H, cull_mode=params.cull_mode,
            near_clip=uu["near_clip"], tri_mask=tri_mask,
            keep_varyings=scene_fragment_shader.varyings)
        tid2 = jnp.repeat(scene["tri_texture_id"], 2)
        aoff = jnp.asarray(scene["atlas_offsets"], jnp.int32)
        asiz = jnp.asarray(scene["atlas_sizes"], jnp.int32)
        per_tri = {"tex_oy": jnp.take(aoff[:, 0], tid2),
                   "tex_ox": jnp.take(aoff[:, 1], tid2),
                   "tex_h": jnp.take(asiz[:, 0], tid2),
                   "tex_w": jnp.take(asiz[:, 1], tid2)}
        fb_d = jnp.full((H, W), raster.DEPTH_CLEAR, jnp.float32)
        return tris, uu, per_tri, fb_d

    def full(scene, u):
        c, d = eng._frame(scene, u)
        return jnp.sum(c[..., 0]) + jnp.sum(d)

    def kernel_only(scene, u):
        tris, uu, per_tri, fb_d = prep(scene, u)
        ctx = pallas_tile._prepare_ctx(
            tris, params, fb_d, per_tri, 0,
            gb_keep=pallas_tile._gb_keep(scene_fragment_shader))
        frag, bd, bi = pallas_tile._run_pass(ctx, False)
        return jnp.sum(bd) + jnp.sum(bi)

    def gather_only(scene, u):
        # the shading pass's per-pixel texel row-gather in isolation:
        # uv from iota (defeats constant folding), same atlas tables
        from softwarerenderer_tpu.ops import texture as tex_ops
        yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        t = u["fov_degrees"] * 0.001
        uv = jnp.stack([xx * 7.1e-5 + t, yy * 3.7e-5], axis=-1)
        zeros = jnp.zeros((H, W), jnp.int32)
        c = tex_ops.sample_atlas_region(
            scene["atlas_data"], zeros + 1, zeros + 1, zeros + 60,
            zeros + 60, uv, xp=jnp)
        return jnp.sum(c)

    empty = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(
            {"position": np.zeros((3, 3), np.float32),
             "uv": np.zeros((3, 2), np.float32),
             "normal": np.zeros((3, 3), np.float32),
             "color": np.ones((3, 4), np.float32),
             "indices": np.asarray([[0, 1, 2]], np.int32)})])
    eng_empty = Engine(jax.device_put(empty), params, **ekw)

    def empty_frame(scene, u):
        c, d = eng_empty._frame(jax.device_put(empty), u)
        return jnp.sum(c[..., 0])

    report("config5_full_4k", full)
    report("config5_kernel_only_4k", kernel_only)
    report("texel_row_gather_8.3Mpx", gather_only)
    report("empty_scene_4k", empty_frame)


if __name__ == "__main__":
    main()
