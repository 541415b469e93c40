"""Example: render one frame sharded over an 8-device mesh.

Runs on the virtual CPU mesh anywhere:

    PYTHONPATH= JAX_PLATFORMS=cpu \\
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    python examples/multichip_render.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import default_frame_uniforms
from softwarerenderer_tpu.models import primitives, scene
from softwarerenderer_tpu.parallel import (
    make_mesh,
    render_frame_sharded,
    shard_scene_triangles,
)
from softwarerenderer_tpu.utils import mathlib as ml


def main():
    n = len(jax.devices())
    n_tri = 2 if n % 2 == 0 else 1
    n_fb = n // n_tri
    print(f"mesh: {n_fb} framebuffer bands x {n_tri} triangle shards")

    insts = [scene.MeshInstance(primitives.plane(20.0),
                                ml.translation([0.0, -1.0, 0.0]))]
    rng = np.random.default_rng(0)
    for _ in range(10):
        pos = rng.uniform(-5, 5, 3).astype(np.float32)
        pos[2] = rng.uniform(-8, -2)
        insts.append(scene.MeshInstance(primitives.cube(0.8),
                                        ml.translation(pos)))
    sc = shard_scene_triangles(scene.build_scene_buffers(insts), n_tri)

    params = RenderParams(width=512, height=384, tile_h=16, tile_w=64,
                          tile_group=4)
    u = default_frame_uniforms(params.width, params.height)
    u["camera_position"] = np.float32([0.0, 1.0, 4.0])

    mesh = make_mesh(n_fb, n_tri)
    with mesh:
        color, depth = jax.jit(
            lambda s, u: render_frame_sharded(s, u, params, mesh))(sc, u)
    rgb = (np.clip(np.asarray(color)[..., :3], 0, 1) * 255).astype(np.uint8)
    from PIL import Image
    Image.fromarray(rgb).save("/tmp/multichip.png")
    print("wrote /tmp/multichip.png", rgb.shape)


if __name__ == "__main__":
    main()
