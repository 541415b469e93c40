"""Measure the ray-traced mode: brute force vs bundle-culled clusters
(ops/rt_accel.py), plus survivor statistics to size cluster_cap.

Usage:  python scripts/profile_raytrace.py [--width 480] [--height 320]
            [--frames 4] [--cap N] [--group 64] [--chunk 512]
            [--no-shadows] [--reflections]

Prints per-mode frame times and the max per-chunk cluster-survivor
count across the frame's primary-ray tiles (the number cluster_cap must
cover for the fast path to run overflow-free).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--cap", type=int, default=0,
                    help="cluster cap (0 = auto from measured survivors)")
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--no-shadows", action="store_true")
    ap.add_argument("--reflections", action="store_true")
    args = ap.parse_args()

    import bench
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine.renderer import default_frame_uniforms
    from softwarerenderer_tpu.ops import rt_accel, sky as sky_mod
    from softwarerenderer_tpu.ops.raytrace import (
        build_rt_world,
        render_frame_raytraced,
    )

    W, H = args.width, args.height
    scene = jax.device_put(bench.build_scene())
    n_tri = int(scene["indices"].shape[0])
    params = RenderParams(width=W, height=H)
    u = bench.camera_uniforms(default_frame_uniforms(W, H))
    shadows = not args.no_shadows

    # --- survivor statistics (primary tiles) to size the cap ----------
    world = build_rt_world(scene, u)
    accel = rt_accel.build_rt_accel(world, group=args.group)
    dirs = sky_mod.pixel_ray_directions(u, W, H, xp=jnp)
    tw = min(32, W)
    th = max(1, args.chunk // tw)
    hp, Wp = -(-H // th) * th, -(-W // tw) * tw
    d2 = jnp.pad(dirs, ((0, hp - H), (0, Wp - W), (0, 0)), mode="edge")
    tiles = d2.reshape(hp // th, th, Wp // tw, tw, 3).transpose(
        0, 2, 1, 3, 4).reshape(-1, th * tw, 3)
    eye = jnp.asarray(u["camera_position"], jnp.float32)

    @jax.jit
    def survivors(tiles):
        def one(d):
            o = jnp.broadcast_to(eye, d.shape)
            return rt_accel.bundle_survivor_count(o, d, world, accel)
        return jax.lax.map(one, tiles)

    surv = np.asarray(survivors(tiles))
    nc = accel["n_clusters"]
    print(f"scene: {n_tri} tris, {nc} clusters of {args.group}; "
          f"primary-tile survivors: max {surv.max()}, "
          f"p95 {np.percentile(surv, 95):.0f}, "
          f"p50 {np.percentile(surv, 50):.0f}, mean {surv.mean():.1f}")
    if args.cap:
        cap = min(args.cap, nc)
    else:
        # ladder: most chunks land on the p50 rung, busy ones climb
        cap = tuple(sorted({
            max(1, int(np.percentile(surv, 50) * 1.25)),
            max(2, int(np.percentile(surv, 95) * 1.25)),
            min(nc, int(surv.max() * 1.1) + 1)}))
    print(f"cluster_cap = {cap}")

    # --- timed frames ---------------------------------------------------
    def run(label, **kw):
        fn = jax.jit(lambda s, uu: render_frame_raytraced(
            s, uu, params, chunk=args.chunk, shadows=shadows,
            reflections=args.reflections, **kw))
        c, d = fn(scene, u)
        jax.block_until_ready((c, d))
        t0 = time.perf_counter()
        for i in range(args.frames):
            c, d = fn(scene, u)
        jax.block_until_ready((c, d))
        dt = (time.perf_counter() - t0) / args.frames
        print(f"{label:28s} {dt * 1e3:8.2f} ms/frame "
              f"({1.0 / dt:6.1f} fps)")
        return dt, np.asarray(c), np.asarray(d)

    tb, cb, db = run("brute force")
    tc, cc, dc = run("bundle-culled",
                     cluster_cap=cap, cluster_group=args.group)
    cov_b = db != np.float32(np.finfo(np.float32).max) * -0.5  # unused
    same_cov = ((db == dc) | (np.abs(db - dc) < 1e-5)).mean()
    cdiff = np.abs(cb - cc).max()
    print(f"speedup {tb / tc:.2f}x; depth agreement {same_cov * 100:.2f}%"
          f"; max color diff {cdiff:.4f}")


if __name__ == "__main__":
    main()
