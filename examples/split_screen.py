"""Split-screen example: two cameras orbit the same scene, composed
side-by-side in ONE jitted program (engine.render_frame_multiview) —
the local-co-op capability the reference's single-camera loop
(Renderer.cs:404-419) can't express.

    python examples/split_screen.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import (default_frame_uniforms,
                                         render_frame_multiview, to_rgb8)
from softwarerenderer_tpu.models import primitives, scene
from softwarerenderer_tpu.ops import texture
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def arena():
    checker = np.asarray(texture.checkerboard(64, 8)["data"])
    rng = np.random.default_rng(5)
    insts = [scene.MeshInstance(primitives.plane(16.0),
                                ml.translation([0, -1, 0]),
                                texture=checker)]
    for _ in range(10):
        p = rng.uniform(-5, 5, 3).astype(F32)
        p[1] = rng.uniform(-0.5, 1.0)
        insts.append(scene.MeshInstance(
            primitives.cube(rng.uniform(0.5, 1.4)),
            ml.translation(p), texture=checker))
    return scene.build_scene_buffers(insts)


def main(out_dir="/tmp/split"):
    os.makedirs(out_dir, exist_ok=True)
    sc = arena()
    params = RenderParams(width=640, height=240)
    u = default_frame_uniforms(params.width, params.height)

    frame = jax.jit(lambda s, u, v: render_frame_multiview(
        s, u, params, v))

    def orbit_view(yaw, pitch, dist=7.0):
        """Orbit camera looking back at the origin (the viewer app's
        parameterization: eye = dist·[cp·sin(yaw), −sin(pitch),
        cp·cos(yaw)], rotation = (yaw, pitch))."""
        cp = np.cos(pitch)
        eye = dist * np.float32([cp * np.sin(yaw), -np.sin(pitch),
                                 cp * np.cos(yaw)])
        return {"camera_position": eye,
                "camera_rotation": np.asarray(
                    ml.quat_from_yaw_pitch_roll(F32(yaw), F32(pitch),
                                                F32(0.0)), F32)}

    from PIL import Image
    for i in range(8):
        a = i / 8.0 * 2 * np.pi
        views = (orbit_view(a, -0.25),
                 orbit_view(a + np.pi, -0.4, dist=9.0))
        c, _d = frame(sc, u, views)
        Image.fromarray(np.asarray(to_rgb8(c))).save(
            os.path.join(out_dir, f"frame_{i:03d}.png"))
    print("wrote 8 split-screen frames to", out_dir)


if __name__ == "__main__":
    main(*sys.argv[1:])
