"""Batched AI agents (sim/agents.py): waypoint brain + vmapped controller.

Beyond the reference (it has no AI, /root/reference/Renderer.cs:62-70);
the agents are the reference's CharacterController re-used N-wide, so
these tests focus on the brain, batching semantics, and PRNG hygiene.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.sim import (
    agents_step,
    build_collision_world,
    default_brain_params,
    default_character_params,
    initial_agents_state,
    respawn_agent,
    scatter_waypoints_on_floor,
)
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def world_from(meshes_and_mats):
    insts = [scene_mod.MeshInstance(m, mat) for m, mat in meshes_and_mats]
    return build_collision_world(scene_mod.build_scene_buffers(insts))


@pytest.fixture(scope="module")
def floor():
    return world_from([(primitives.plane(80.0, y=0.0),
                        np.eye(4, dtype=F32))])


def run(world, state, waypoints, steps, dt=1 / 60,
        char_params=None, brain=None):
    cp = char_params or default_character_params()
    br = brain or default_brain_params()
    wps = jnp.asarray(waypoints, F32)
    step = jax.jit(lambda s, d: agents_step(s, d, wps, world, cp, br))
    for _ in range(steps):
        state = step(state, jnp.float32(dt))
    return jax.device_get(state)


# ---------------------------------------------------------------------------
# Brain behavior
# ---------------------------------------------------------------------------

def test_crowd_walks_toward_waypoint(floor):
    starts = np.asarray([[0, 1, 0], [2, 1, 1], [-1, 1, -2]], F32)
    st = initial_agents_state(starts, key=jax.random.PRNGKey(3))
    out = run(floor, st, [[20.0, 0.0, 0.0]], steps=90)
    pos = out["char"]["position"]
    assert np.isfinite(pos).all()
    # everyone made progress toward +x and stayed on the floor
    assert (pos[:, 0] > starts[:, 0] + 1.0).all(), pos
    assert (pos[:, 1] > -1.0).all()


def test_waypoint_advances_on_arrival(floor):
    # start INSIDE the arrive radius of waypoint 0 → first step switches
    # to a PRNG-chosen other waypoint and resets wp_age
    wps = [[0.0, 0.0, 0.0], [10.0, 0.0, 0.0], [0.0, 0.0, 10.0]]
    st = initial_agents_state(np.asarray([[0, 0.5, 0]], F32),
                              key=jax.random.PRNGKey(0))
    out = run(floor, st, wps, steps=1)
    assert int(out["waypoint"][0]) in (1, 2)
    assert float(out["wp_age"][0]) == 0.0


def test_patience_abandons_unreachable_goal(floor):
    # a goal 1000 m out is never reached; after `patience` seconds the
    # agent must switch waypoints instead of deadlocking
    br = default_brain_params()
    br["patience"] = np.float32(0.5)
    wps = [[1000.0, 0.0, 0.0], [0.0, 0.0, 5.0]]
    st = initial_agents_state(np.asarray([[0, 0.5, 0]], F32),
                              key=jax.random.PRNGKey(1))
    out = run(floor, st, wps, steps=45, brain=br)   # 0.75 s > patience
    assert int(out["waypoint"][0]) == 1


def test_stuck_agent_eventually_jumps():
    # floor + a wall of cubes between the agent and its goal: the agent
    # runs into it, XZ speed collapses, and after stuck_time the dithered
    # jump fires (p=0.5/frame ⇒ certain within the 3 s window)
    wall = ml.translation(np.asarray([2.0, 0.5, 0.0], F32)) @ \
        np.diag(np.asarray([0.5, 4.0, 40.0, 1.0], F32))
    world = world_from([
        (primitives.plane(80.0, y=0.0), np.eye(4, dtype=F32)),
        (primitives.cube(2.0), wall.astype(F32)),
    ])
    st = initial_agents_state(np.asarray([[0, 0.5, 0]], F32),
                              key=jax.random.PRNGKey(2))
    cp = default_character_params()
    br = default_brain_params()
    wps = jnp.asarray([[20.0, 0.0, 0.0]], F32)
    step = jax.jit(lambda s, d: agents_step(s, d, wps, world, cp, br))
    jumped = False
    for _ in range(180):
        prev_y = float(st["char"]["velocity"][0, 1])
        st = step(st, jnp.float32(1 / 60))
        if float(st["char"]["velocity"][0, 1]) > max(prev_y, 0.5):
            jumped = True
            break
    assert jumped, "stuck agent never jumped"


# ---------------------------------------------------------------------------
# Batching semantics + PRNG hygiene
# ---------------------------------------------------------------------------

def test_batch_matches_singletons(floor):
    """A batch of N agents steps identically to N separate batches of 1
    seeded with the same per-agent keys (the vmapped controller and the
    per-agent PRNG streams are batch-size independent)."""
    starts = np.asarray([[0, 1, 0], [3, 1, 2], [-2, 1, 4]], F32)
    wps = [[15.0, 0.0, 0.0], [0.0, 0.0, 15.0], [-15.0, 0.0, 0.0]]
    stN = initial_agents_state(starts, key=jax.random.PRNGKey(9),
                               waypoint_idx=np.asarray([0, 1, 2], np.int32))
    keys = np.asarray(stN["key"])
    outN = run(floor, stN, wps, steps=40)
    for i in range(3):
        st1 = initial_agents_state(
            starts[i:i + 1],
            waypoint_idx=np.asarray([i], np.int32))
        st1["key"] = jnp.asarray(keys[i:i + 1])
        out1 = run(floor, st1, wps, steps=40)
        np.testing.assert_allclose(
            out1["char"]["position"][0], outN["char"]["position"][i],
            rtol=0, atol=1e-6)
        assert int(out1["waypoint"][0]) == int(outN["waypoint"][i])


def test_pytree_structure_stable_under_jit(floor):
    """agents_step(state) returns the SAME pytree structure it takes —
    a drifting structure would silently retrace the jitted step every
    frame."""
    st = initial_agents_state(np.asarray([[0, 1, 0], [1, 1, 1]], F32),
                              key=jax.random.PRNGKey(5))
    struct0 = jtu.tree_structure(st)
    cp = default_character_params()
    br = default_brain_params()
    wps = jnp.asarray([[5.0, 0.0, 0.0]], F32)
    step = jax.jit(lambda s, d: agents_step(s, d, wps, floor, cp, br))
    st = step(st, jnp.float32(1 / 60))
    assert jtu.tree_structure(st) == struct0
    st = step(st, jnp.float32(1 / 60))       # accepts its own output
    assert jtu.tree_structure(st) == struct0


def test_respawn_agent_resets_state(floor):
    st = initial_agents_state(np.asarray([[0, 1, 0], [5, 1, 5]], F32),
                              key=jax.random.PRNGKey(4))
    st = run(floor, st, [[30.0, 0.0, 0.0]], steps=30)
    st = {k: jnp.asarray(v) if not isinstance(v, dict) else
          {kk: jnp.asarray(vv) for kk, vv in v.items()}
          for k, v in st.items()}
    out = jax.device_get(respawn_agent(st, 1, np.asarray([9, 2, 9], F32)))
    np.testing.assert_allclose(out["char"]["position"][1], [9, 2, 9])
    np.testing.assert_allclose(out["char"]["velocity"][1], 0.0)
    assert float(out["wp_age"][1]) == 0.0
    assert float(out["slow_time"][1]) == 0.0
    # agent 0 untouched
    np.testing.assert_allclose(out["char"]["position"][0],
                               np.asarray(st["char"]["position"])[0])


def test_scatter_waypoints_lands_on_floor():
    world = world_from([(primitives.plane(80.0, y=1.5),
                         np.eye(4, dtype=F32))])
    centers = [[0.0, 1.5, 0.0], [4.0, 1.5, 4.0]]
    wps = scatter_waypoints_on_floor(world, centers, n_points=12, seed=7)
    assert wps.shape[0] >= 2 + 8            # centers + most drops hit
    np.testing.assert_allclose(wps[:2], centers, atol=1e-6)
    np.testing.assert_allclose(wps[2:, 1], 1.5, atol=1e-4)
