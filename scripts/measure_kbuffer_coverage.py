#!/usr/bin/env python
"""Measure per-peel-pass coverage on the dust2 K-buffer workload.

Decides whether active-pixel-compacted layer shading can pay: prints,
for each peel pass k, the fraction of pixels whose pass-k winner exists
(best_i >= 0) and the fraction of 32x128 kernel tiles with any winner.
Shading pass k is only worth compacting if its pixel coverage is well
below 1; peel-pass tile skipping only pays if tile coverage drops.

Implementation: monkeypatches pallas_tile._replay_layers to smuggle the
per-pass coverage counts out through the frame's color return value.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--kbuffer", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import bench
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.ops import pallas_tile as pt

    W, H = args.width, args.height
    K = args.kbuffer
    th, tw = 32, 128

    def patched(src, sd, si_i, fb_color, fb_depth, params, with_stats):
        cov = si_i >= 0                                   # (K, H, W)
        pix = jnp.sum(cov, axis=(1, 2)).astype(jnp.float32)
        Hc, Wc = (cov.shape[1] // th) * th, (cov.shape[2] // tw) * tw
        t = cov[:, :Hc, :Wc].reshape(
            cov.shape[0], Hc // th, th, Wc // tw, tw).max(axis=(2, 4))
        tiles = jnp.sum(t, axis=(1, 2)).astype(jnp.float32)
        color = jnp.zeros_like(fb_color)
        color = color.at[0, :cov.shape[0], 0].set(pix)
        color = color.at[1, :cov.shape[0], 0].set(tiles)
        return color, fb_depth

    pt._replay_layers = patched

    scene = jax.device_put(bench.build_scene())
    # kbuffer_short_circuit=False: measure NATURAL peel coverage (the
    # short-circuit zeroes passes >= 1 on opaque content — the point of
    # this script is to see what it saves).
    eng = Engine(scene, RenderParams(width=W, height=H, use_pallas=True,
                                     kbuffer=K,
                                     kbuffer_short_circuit=False))
    u = bench.camera_uniforms(eng.uniforms, 7)
    color, _ = eng.render(u)
    color = np.asarray(color)
    ntiles = (H // th) * ((W + tw - 1) // tw)
    for k in range(K):
        px = color[0, k, 0]
        tl = color[1, k, 0]
        print(json.dumps({
            "pass": k,
            "pixel_cov": round(float(px / (H * W)), 4),
            "tile_cov": round(float(tl / ntiles), 4),
            "covered_px": int(px),
        }), flush=True)


if __name__ == "__main__":
    main()
