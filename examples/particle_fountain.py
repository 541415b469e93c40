"""Particle fountain: emission, ballistics, floor bounce and
camera-facing billboards — the WHOLE loop (sim step + billboard write +
rasterize) is one jitted device program per frame (sim/particles.py).

    python examples/particle_fountain.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import Engine
from softwarerenderer_tpu.models import primitives, scene
from softwarerenderer_tpu.ops import texture
from softwarerenderer_tpu.sim import particles as P
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def main(out="/tmp/particle_fountain.png"):
    n = 512
    checker = np.asarray(texture.checkerboard(64, 8)["data"])
    insts = [
        scene.MeshInstance(primitives.plane(20.0),
                           ml.translation([0.0, -1.0, 0.0]),
                           texture=checker),
        scene.MeshInstance(P.particles_mesh(n, extent=30.0), particles=n,
                           texture=P.soft_disc_texture()),
    ]
    sc = scene.build_scene_buffers(insts)
    eng = Engine(sc, RenderParams(width=640, height=360))

    em = P.default_emitter_params()
    em["origin"] = np.float32([0.0, -0.9, -5.0])
    em["base_velocity"] = np.float32([0.0, 5.5, 0.0])
    em["spread"] = np.float32(0.9)
    em["rate"] = np.float32(240.0)
    em["floor_y"] = np.float32(-0.95)
    em["size"] = np.float32([0.16, 0.05])

    u0 = dict(eng.uniforms)
    u0["camera_position"] = np.float32([0.0, 0.6, 1.0])

    @jax.jit
    def frame(state):
        state = P.particle_step(state, em, 1.0 / 60.0)
        u = dict(u0)
        u.update(P.particle_uniforms(state, em))
        color, _ = eng._frame(eng.scene, u)
        return state, color

    state = P.initial_particle_state(n, seed=11)
    for _ in range(120):          # 2 s: the fountain reaches steady state
        state, color = frame(state)

    from PIL import Image
    from softwarerenderer_tpu.engine import to_rgb8
    rgb = np.asarray(to_rgb8(color))
    Image.fromarray(rgb).save(out)
    alive = int(np.sum(np.asarray(state["lifetime"]) > 0))
    print(f"wrote {out} ({alive}/{n} particles alive)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
