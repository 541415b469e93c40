
#!/usr/bin/env python
"""Directional shadow maps: one extra depth-only pass from the light
inside the same jitted frame (a capability beyond the reference).

    python examples/shadowed_scene.py [out.png]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import (default_frame_uniforms,
                                         render_frame_with_shadows)
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.ops import texture as tex_ops
from softwarerenderer_tpu.utils import mathlib as ml


def main(out="shadow_demo.png"):
    checker = np.asarray(tex_ops.checkerboard(
        64, 8, (0.85, 0.8, 0.7, 1.0), (0.5, 0.45, 0.4, 1.0))["data"])
    insts = [scene_mod.MeshInstance(primitives.plane(24.0),
                                    ml.translation([0, -1, 0]),
                                    texture=checker)]
    rng = np.random.default_rng(4)
    for _ in range(6):
        pos = rng.uniform(-4, 4, 3).astype(np.float32)
        pos[1] = rng.uniform(-0.4, 1.2)
        pos[2] = rng.uniform(-7, -2)
        insts.append(scene_mod.MeshInstance(
            primitives.cube(float(rng.uniform(0.6, 1.3))),
            ml.translation(pos), texture=checker))
    sc = scene_mod.build_scene_buffers(insts)

    params = RenderParams(width=640, height=480)
    u = default_frame_uniforms(640, 480)
    u["camera_position"] = np.float32([3.5, 2.5, 1.0])
    u["camera_rotation"] = ml.quat_from_yaw_pitch_roll(
        np.float32(0.6), np.float32(-0.35), np.float32(0))

    frame = jax.jit(functools.partial(render_frame_with_shadows,
                                      params=params, shadow_size=512))
    color, _ = frame(sc, u)
    rgb = (np.clip(np.asarray(color)[..., :3], 0, 1) * 255).astype(np.uint8)
    from PIL import Image
    Image.fromarray(rgb).save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
