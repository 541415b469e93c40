"""Minimal example: a spinning textured cube rendered headless to PNGs.

    python examples/spinning_cube.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import Engine
from softwarerenderer_tpu.models import primitives, scene
from softwarerenderer_tpu.ops import texture
from softwarerenderer_tpu.utils import mathlib as ml


def main(out_dir="/tmp/spinning_cube"):
    os.makedirs(out_dir, exist_ok=True)
    checker = np.asarray(texture.checkerboard(64, 8)["data"])
    insts = [scene.MeshInstance(primitives.cube(1.5), texture=checker)]
    sc = scene.build_scene_buffers(insts)

    eng = Engine(sc, RenderParams(width=640, height=480))
    u = eng.uniforms
    u["camera_position"] = np.float32([0.0, 1.0, 3.5])
    u["camera_rotation"] = np.asarray(
        ml.quat_from_yaw_pitch_roll(0.0, -0.25, 0.0), np.float32)

    from PIL import Image
    for i in range(8):
        angle = i * np.pi / 8
        # per-frame motion = rewrite the mesh-matrix array (traced, so no
        # recompilation)
        eng.scene["mesh_matrices"] = np.asarray(
            ml.matrix_from_yaw_pitch_roll(angle, angle * 0.3, 0.0),
            np.float32)[None]
        rgb = eng.present(u)
        Image.fromarray(rgb).save(f"{out_dir}/frame_{i:02d}.png")
    print(f"wrote 8 frames to {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
