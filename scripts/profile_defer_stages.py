#!/usr/bin/env python
"""Cumulative stage bisection of the deferred-geometry LOD-crowd frame.

profile_lod's prep_only/bin_only/kernel_only splits leave ~100 ms
unattributed (XLA DCEs different subgraphs per split); this script jits
CUMULATIVE prefixes of the real pipeline so consecutive deltas attribute
cost to one stage each.  JSON lines to stdout; evidence for
BENCHMARKS.md's capacity-caps section.

Usage: python scripts/profile_defer_stages.py [--frames 4] [--stages a,b,...]
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--stages", default=None,
                    help="comma list of stage names to run (default all)")
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
    from scripts.profile_lod import build_instances

    W, H = args.width, args.height
    sc_np = scene_mod.build_scene_buffers(build_instances(True))
    sc = jax.device_put(sc_np)
    params0 = RenderParams(width=W, height=H)
    u0 = dict(Engine(sc, params0).uniforms)
    u0["camera_position"] = np.asarray([0.0, 0.3, 2.0], np.float32)
    u0["far_clip"] = np.float32(200.0)
    u0["fog_start"] = np.float32(150.0)
    u0["fog_end"] = np.float32(220.0)
    print(json.dumps({"n_verts": int(sc_np["position"].shape[0]),
                      "n_tris": int(sc_np["indices"].shape[0])}),
          flush=True)

    def fsum(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                   if hasattr(l, "dtype") and l.dtype != bool) + \
            sum(jnp.sum(l.astype(jnp.int32)) for l in leaves
                if hasattr(l, "dtype") and l.dtype == bool)

    # -- pipeline pieces (mirrors profile_lod prep + engine defer path) --
    def vshade(scene, u):
        view, proj = camera_matrices(u, W, H)
        vp = ml.transform(view, proj, xp=jnp)
        visible = culling.spheres_in_frustum(
            scene["bounds_center"], scene["bounds_radius"],
            scene["mesh_matrices"], vp, xp=jnp)
        tri_mask = jnp.take(visible, scene["tri_mesh_id"])
        tri_mask = tri_mask & lod.lod_tri_mask(scene, u, H, xp=jnp)
        model_pv = jnp.take(scene["mesh_matrices"],
                            scene["vert_mesh_id"], axis=0)
        uu = dict(u)
        uu.update(model=model_pv, view=view, projection=proj,
                  atlas_data=scene["atlas_data"],
                  atlas_offsets=scene["atlas_offsets"],
                  atlas_sizes=scene["atlas_sizes"],
                  base_color=scene["base_color"])
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        vs_out = geometry.shade_vertices(scene_vertex_shader, vin, uu)
        return vs_out, tri_mask, uu

    def build(scene, u):
        _, tri_mask, uu = vshade(scene, u)
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        tris = geometry.build_triangles(
            scene_vertex_shader, vin, scene["indices"], uu, width=W,
            height=H, cull_mode=params0.cull_mode,
            near_clip=uu["near_clip"], tri_mask=tri_mask,
            keep_varyings=scene_fragment_shader.varyings,
            defer_attrs=True)
        return tris, uu

    def per_tri_of(scene):
        tid2 = jnp.repeat(scene["tri_texture_id"], 2)
        aoff = jnp.asarray(scene["atlas_offsets"], jnp.int32)
        asiz = jnp.asarray(scene["atlas_sizes"], jnp.int32)
        return {"tex_oy": jnp.take(aoff[:, 0], tid2),
                "tex_ox": jnp.take(aoff[:, 1], tid2),
                "tex_h": jnp.take(asiz[:, 0], tid2),
                "tex_w": jnp.take(asiz[:, 1], tid2)}

    # measured-valid cap (same as profile_lod valid_defer)
    def count_valid(scene, u):
        tris, _ = build(scene, u)
        return jnp.sum(tris["valid"].astype(jnp.int32))
    nv = int(jax.jit(count_valid)(sc, u0))
    cap = -(-int(nv * 1.25) // 128) * 128

    def compacted(scene, u):
        tris, uu = build(scene, u)
        tris, per_tri, _ = geometry.compact_triangles(
            tris, cap, per_tri_of(scene))
        return tris, per_tri, uu

    def pair_counts(scene, u):
        tris = compacted(scene, u)[0]
        p = params0.replace(active_cap=cap)
        bins = binning.bin_triangles(tris, p, 32, p.tile_w, p.span_cap, 0)
        return jnp.sum(bins["counts"]), bins["n_global"]
    live, nglob = map(int, jax.jit(pair_counts)(sc, u0))
    params = params0.replace(
        active_cap=cap,
        pair_cap=-(-int(live * 1.25) // 128) * 128,
        global_cap=max(256, -(-int(nglob * 2) // 128) * 128))
    print(json.dumps({"cap": cap, "n_valid": nv, "pair_cap": params.pair_cap,
                      "global_cap": params.global_cap}), flush=True)

    def materialized(scene, u):
        tris, per_tri, uu = compacted(scene, u)
        return geometry.materialize_attrs(tris), per_tri, uu

    def binned(scene, u):
        tris, per_tri, uu = materialized(scene, u)
        bins = binning.bin_triangles(tris, params, 32, params.tile_w,
                                     params.span_cap, 0)
        return tris, per_tri, uu, bins

    def ctx_of(scene, u):
        tris, per_tri, uu = materialized(scene, u)
        fb_d = jnp.full((H, W), raster.DEPTH_CLEAR, jnp.float32)
        return pallas_tile._prepare_ctx(
            tris, params, fb_d, per_tri, 0,
            gb_keep=pallas_tile._gb_keep(scene_fragment_shader)), uu

    def kernel(scene, u):
        ctx, uu = ctx_of(scene, u)
        frag, bd, bi = pallas_tile._run_pass(ctx, False)
        return frag, bd, bi

    stages = {
        "uniforms": lambda s, u: fsum(camera_matrices(u, W, H)),
        "vshade": lambda s, u: fsum(vshade(s, u)[0]),
        "build": lambda s, u: fsum(build(s, u)[0]),
        "compact": lambda s, u: fsum(compacted(s, u)[:2]),
        "materialize": lambda s, u: fsum(materialized(s, u)[:2]),
        "bin": lambda s, u: fsum(binned(s, u)[3]) + fsum(binned(s, u)[0]),
        "ctx": lambda s, u: fsum({k: v for k, v in ctx_of(s, u)[0].items()
                                  if hasattr(v, "dtype")}),
        "kernel": lambda s, u: fsum(kernel(s, u)),
    }
    only = set(args.stages.split(",")) if args.stages else None
    prev = 0.0
    for name, fn in stages.items():
        if only is not None and name not in only:
            continue
        jf = jax.jit(fn)
        t0 = time.time()

        def step(i, jf=jf):
            u = dict(u0)
            u["fov_degrees"] = np.float32(90.0 + 0.01 * i)
            return jf(sc, u)

        spf = timed_frames(step, args.frames)
        ms = spf * 1e3
        print(json.dumps({"stage": name, "ms": round(ms, 2),
                          "delta_ms": round(ms - prev, 2),
                          "compile_s": round(
                              time.time() - t0 - spf * args.frames, 1)}),
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
