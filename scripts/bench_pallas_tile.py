#!/usr/bin/env python
"""A/B the new Pallas tile kernel vs the XLA fused path on the real chip.

Measures 1080p dust2 full frames via the Mosaic-safe methodology and
verifies pixel parity on-device.  JSON lines to stdout.
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
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--parity", action="store_true",
                    help="also compare one frame pixel-by-pixel")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--kbuffer", type=int, default=0,
                    help="also A/B the K-buffer paths at this K")
    args = ap.parse_args()

    import jax
    import bench
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.utils.profiling import timed_frames

    W, H = args.width, args.height
    scene = jax.device_put(bench.build_scene())
    u0 = None

    def run(tag, params):
        eng = Engine(scene, params)
        t0 = time.time()
        spf = timed_frames(
            lambda i: eng.render(bench.camera_uniforms(eng.uniforms, i)),
            args.frames)
        print(json.dumps({
            "tag": tag, "ms": round(spf * 1e3, 3),
            "mpix_s": round(W * H / spf / 1e6, 2),
            "fps": round(1 / spf, 2),
            "compile_s": round(time.time() - t0 - spf * args.frames, 1),
        }), flush=True)
        return eng

    engp = run("pallas_tile", RenderParams(width=W, height=H,
                                           use_pallas=True))
    if not args.skip_xla:
        engx = run("xla_fused", RenderParams(width=W, height=H,
                                               use_pallas=False))
        if args.parity:
            u = bench.camera_uniforms(engp.uniforms, 7)
            cp, dp = map(np.asarray, engp.render(u))
            cx, dx = map(np.asarray, engx.render(u))
            bad = float((np.abs(cp - cx).max(axis=-1) > 1e-5).mean())
            print(json.dumps({"tag": "parity",
                              "color_mismatch_frac": bad,
                              "depth_mismatch_frac": float(
                                  (np.abs(dp - dx) > 1e-5).mean())}),
                  flush=True)

    if args.kbuffer:
        K = args.kbuffer
        engkp = run(f"kbuffer{K}_pallas_peel",
                    RenderParams(width=W, height=H, use_pallas=True,
                                 kbuffer=K))
        if not args.skip_xla:
            engkx = run(f"kbuffer{K}_xla",
                        RenderParams(width=W, height=H, use_pallas=False,
                                     kbuffer=K))
            if args.parity:
                u = bench.camera_uniforms(engkp.uniforms, 7)
                cp, dp = map(np.asarray, engkp.render(u))
                cx, dx = map(np.asarray, engkx.render(u))
                bad = float((np.abs(cp - cx).max(axis=-1) > 1e-5).mean())
                print(json.dumps({"tag": f"kbuffer{K}_parity",
                                  "color_mismatch_frac": bad,
                                  "depth_mismatch_frac": float(
                                      (np.abs(dp - dx) > 1e-5).mean())}),
                      flush=True)


if __name__ == "__main__":
    main()
