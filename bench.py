#!/usr/bin/env python
"""Benchmark: Mpixels/s shaded at 1080p on the Dust2 scene (one TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = TPU Mpixels/s ÷ the CPU golden reference's Mpixels/s on the
same scene (the reference publishes no numbers — BASELINE.md — so the
measured NumPy-faithful CPU implementation is the baseline, per
BASELINE.json's north star "≥100× CPU Mpixels/s at 1080p on one chip").

Usage:
  python bench.py            # full: 1080p dust2 on the default JAX device
  python bench.py --small    # quick smoke: 320x240, fewer frames
"""

import argparse
import json
import os
import sys
import time

import numpy as np


DUST2 = "/root/reference/OutputAssets/Assets/dust2/scene.gltf"


def build_scene():
    from softwarerenderer_tpu.io_host import model_loader
    from softwarerenderer_tpu.models import primitives, scene as scene_mod
    from softwarerenderer_tpu.ops import texture as tex_ops

    fallback = np.asarray(tex_ops.checkerboard(
        64, 8, (0.8, 0.75, 0.6, 1.0), (0.55, 0.5, 0.4, 1.0))["data"])
    if os.path.exists(DUST2):
        model = model_loader.load_model(DUST2)
        insts = model_loader.model_instances(model,
                                             fallback_texture=fallback)
    else:  # fallback workload with the same triangle count
        insts = [scene_mod.MeshInstance(
            primitives.random_triangle_soup(9061, seed=0), texture=fallback)]
    return scene_mod.build_scene_buffers(insts)


def camera_uniforms(uniforms, frame_idx=0):
    from softwarerenderer_tpu.utils import mathlib as ml
    u = dict(uniforms)
    u["camera_position"] = np.float32([0.0, 2.5, 6.0])
    u["camera_rotation"] = ml.quat_from_yaw_pitch_roll(
        np.float32(0.6 + 0.01 * frame_idx), np.float32(-0.15), np.float32(0))
    return u


def bench_tpu(width, height, frames):
    import jax
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine

    scene = build_scene()
    params = RenderParams(width=width, height=height)
    eng = Engine(scene, params)
    u = camera_uniforms(eng.uniforms)

    color, depth = eng.render(u)   # compile + warm up
    jax.block_until_ready((color, depth))
    t0 = time.perf_counter()
    for i in range(frames):
        color, depth = eng.render(camera_uniforms(eng.uniforms, i))
    jax.block_until_ready((color, depth))
    dt = time.perf_counter() - t0
    mpix = width * height * frames / dt / 1e6
    return mpix, frames / dt


def bench_cpu_reference(width, height, frames=1):
    """The golden NumPy implementation on a scaled-down frame; Mpixels/s is
    resolution-stable enough to serve as the 1080p baseline denominator."""
    from softwarerenderer_tpu import shaders
    from softwarerenderer_tpu.engine import camera_matrices, \
        default_frame_uniforms
    from softwarerenderer_tpu.io_host import model_loader
    from softwarerenderer_tpu.ops import texture as tex_ops
    from softwarerenderer_tpu.ref_cpu import rasterizer as ref

    u = camera_uniforms(default_frame_uniforms(width, height))
    view, proj = camera_matrices(u, width, height, xp=np)
    fallback = {"data": np.asarray(tex_ops.checkerboard(
        64, 8, (0.8, 0.75, 0.6, 1.0), (0.55, 0.5, 0.4, 1.0))["data"])}
    meshes = (model_loader.load_model(DUST2).meshes
              if os.path.exists(DUST2) else [])
    t0 = time.perf_counter()
    for _ in range(frames):
        fb = ref.Framebuffer(width, height)
        fb.clear_color(u["clear_color"])
        for mesh in meshes:
            mu = dict(u)
            mu.update(model=np.eye(4, dtype=np.float32), view=view,
                      projection=proj, texture=fallback)
            vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                            mesh["normal"], mesh["color"])
            ref.render_mesh(fb, vin, mesh["indices"], mu,
                            shaders.default_vertex_shader,
                            shaders.default_fragment_shader)
    dt = time.perf_counter() - t0
    return width * height * frames / dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--no-baseline", action="store_true",
                    help="skip the slow CPU-reference measurement")
    args = ap.parse_args()

    if args.small:
        width, height, frames = 320, 240, 10
        ref_w, ref_h = 160, 120
    else:
        width, height, frames = 1920, 1080, 30
        ref_w, ref_h = 320, 240

    mpix, fps = bench_tpu(width, height, args.frames or frames)
    if args.no_baseline:
        cpu_mpix = None
        vs = None
    else:
        cpu_mpix = bench_cpu_reference(ref_w, ref_h)
        vs = mpix / cpu_mpix
    print(json.dumps({
        "metric": f"mpixels_per_s_{height}p_dust2",
        "value": round(mpix, 2),
        "unit": "Mpixels/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "extra": {"fps": round(fps, 2),
                  "cpu_ref_mpixels_per_s": (round(cpu_mpix, 3)
                                            if cpu_mpix else None),
                  "resolution": f"{width}x{height}",
                  "device": _device_name()},
    }))


def _device_name():
    try:
        import jax
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    sys.exit(main())
