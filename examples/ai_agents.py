"""AI agent crowd: N characters patrol a walled arena and fight — the
whole crowd (steering, waypoint-graph routing, combat sensing, every
capsule controller) advances with ONE jitted step per frame
(sim/agents.py), and the arena renders through the same jitted frame
program.  Beyond the reference (it has no AI — Renderer.cs:62-70 only
tracks human ConnectedPlayers); dust2 exposes this as `--bots N`.

    python examples/ai_agents.py [out.png]
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
from softwarerenderer_tpu.sim import (
    agents_step,
    build_collision_world,
    build_waypoint_graph,
    default_brain_params,
    default_character_params,
    initial_agents_state,
)
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32
N_AGENTS = 6


def arena():
    """A floor split by a center wall whose gap is at +z: the beeline
    between the two courts is blocked, so the waypoint graph must route
    cross-court traffic through the flank waypoint at the gap."""
    checker = np.asarray(texture.checkerboard(64, 8)["data"])
    wall_tex = np.asarray(texture.checkerboard(
        32, 4, (0.75, 0.3, 0.25, 1.0), (0.5, 0.2, 0.18, 1.0))["data"])
    insts = [scene.MeshInstance(primitives.plane(40.0), np.eye(4, dtype=F32),
                                texture=checker)]
    # wall at x=0, z from -12 to 4, 2.4 m tall (unjumpable)
    m = (np.diag(np.asarray([0.3, 1.2, 8.0, 1.0], F32))
         @ ml.translation(np.asarray([0.0, 1.2, -4.0], F32)))
    insts.append(scene.MeshInstance(primitives.cube(2.0),
                                    m.astype(F32), texture=wall_tex))
    # one marker cube per agent (the "player model")
    for i in range(N_AGENTS):
        insts.append(scene.MeshInstance(primitives.cube(1.0),
                                        np.eye(4, dtype=F32)))
    return insts


def main(out="/tmp/ai_agents.png"):
    insts = arena()
    sc = scene.build_scene_buffers(insts)
    n_static = len(insts) - N_AGENTS
    world = build_collision_world(sc)
    static_tris = np.asarray(sc["tri_mesh_id"]) < n_static

    # 0/1: the two courts (beeline blocked by the wall), 2: the gap
    # flank, 3/4: patrol extras deep in each court
    wps = np.asarray([[-8, 0, -4], [8, 0, -4], [0, 0, 8],
                      [-8, 0, -10], [8, 0, -10]], F32)
    next_hop = build_waypoint_graph(world, wps, tri_mask=static_tris)
    print("next_hop table:\n", next_hop)
    assert next_hop[0, 1] == 2 and next_hop[1, 0] == 2, \
        "cross-court routes must flank through the gap"

    cp = default_character_params()
    br = default_brain_params()
    rngpos = np.random.default_rng(3)
    starts = np.stack([
        wps[i % len(wps)][:3] + np.asarray(
            [rngpos.uniform(-1, 1), 0.6, rngpos.uniform(-1, 1)], F32)
        for i in range(N_AGENTS)])
    st = initial_agents_state(starts, key=jax.random.PRNGKey(7),
                              waypoint_idx=np.arange(N_AGENTS) % len(wps))

    ids = np.arange(N_AGENTS, dtype=np.int32)

    @jax.jit
    def step(s, dt):
        # every agent is everyone else's combat target (FFA)
        return agents_step(
            s, dt, wps, world, cp, br, tri_mask=static_tris,
            next_hop=next_hop, targets=s["char"]["position"],
            target_ids=ids, self_ids=ids)

    shots = 0
    for _ in range(240):                      # 8 s of crowd life
        st = step(st, np.float32(1 / 30))
        shots += int(np.asarray(st["fire"]).sum())
    pos = np.asarray(st["char"]["position"])
    print(f"{N_AGENTS} agents, {shots} shots fired, "
          f"positions:\n{np.round(pos, 2)}")

    # render the final state: marker cubes at agent positions
    eng = Engine(sc, RenderParams(width=640, height=360))
    u = dict(eng.uniforms)
    mats = np.asarray(sc["mesh_matrices"]).copy()
    for i in range(N_AGENTS):
        mats[n_static + i] = ml.translation(
            pos[i] + np.asarray([0, 0.25, 0], F32)).astype(F32)
    eng.scene["mesh_matrices"] = mats
    u["camera_position"] = np.float32([0.0, 7.0, 10.0])
    u["camera_rotation"] = np.asarray(ml.quat_from_yaw_pitch_roll(
        0.0, -0.5, 0.0), F32)
    rgb = eng.present(u)
    try:
        from PIL import Image
        Image.fromarray(np.asarray(rgb)).save(out)
        print("wrote", out)
    except ImportError:
        print("PIL unavailable; skipped PNG")


if __name__ == "__main__":
    main(*sys.argv[1:])
