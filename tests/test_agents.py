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
    build_waypoint_graph,
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


# ---------------------------------------------------------------------------
# Waypoint-graph routing
# ---------------------------------------------------------------------------

def walled_world():
    """Floor with a long wall through x=0 leaving a gap at z>8: the
    straight line between (-6,0) and (6,0) is blocked; the flank
    waypoint at (0, 10) is the only route."""
    wall = (np.diag(np.asarray([0.25, 3.0, 8.0, 1.0], F32))
            @ ml.translation(np.asarray([0.0, 1.0, 0.0], F32)))
    return world_from([
        (primitives.plane(80.0, y=0.0), np.eye(4, dtype=F32)),
        (primitives.cube(2.0), wall.astype(F32)),
    ])


WALLED_WPS = np.asarray([[-6, 0, 0], [6, 0, 0], [0, 0, 12]], F32)


def test_waypoint_graph_routes_around_wall():
    world = walled_world()
    nxt = build_waypoint_graph(world, WALLED_WPS)
    assert nxt.shape == (3, 3)
    # 0 → 1 must route via the flank point 2, both directions
    assert nxt[0, 1] == 2 and nxt[1, 0] == 2
    assert nxt[2, 0] == 0 and nxt[2, 1] == 1
    np.testing.assert_array_equal(np.diag(nxt), [0, 1, 2])


def test_agents_follow_route_through_gap():
    """An agent at waypoint 0 heading for goal 1 walks to the FLANK
    waypoint first (positive z), instead of beelining into the wall."""
    world = walled_world()
    nxt = build_waypoint_graph(world, WALLED_WPS)
    st = initial_agents_state(np.asarray([[-6, 0.5, 0]], F32),
                              key=jax.random.PRNGKey(0),
                              waypoint_idx=np.asarray([0], np.int32))
    st["goal"] = jnp.asarray([1], jnp.int32)
    st["waypoint"] = jnp.asarray([int(nxt[0, 1])], jnp.int32)
    cp = default_character_params()
    br = default_brain_params()
    step = jax.jit(lambda s, d: agents_step(
        s, d, WALLED_WPS, world, cp, br, next_hop=nxt))
    for _ in range(240):
        st = step(st, jnp.float32(1 / 30))
    out = jax.device_get(st)
    # reached (or nearly reached) the far side without teleporting
    assert np.isfinite(out["char"]["position"]).all()
    assert out["char"]["position"][0, 2] > 2.0 or \
        out["char"]["position"][0, 0] > 0.0, out["char"]["position"]
    # waypoint advanced off the flank hop at some point
    assert int(out["waypoint"][0]) in (0, 1, 2)


# ---------------------------------------------------------------------------
# Combat
# ---------------------------------------------------------------------------

def combat_step_fn(world, brain=None, **kw):
    cp = default_character_params()
    br = brain or default_brain_params()
    wps = jnp.asarray([[0.0, 0.0, 0.0]], F32)
    return jax.jit(lambda s, d, tpos, talive, tids, sids: agents_step(
        s, d, wps, world, cp, br, targets=tpos, target_alive=talive,
        target_ids=tids, self_ids=sids, **kw))


def test_combat_acquires_and_fires(floor):
    br = default_brain_params()
    br["aim_spread"] = np.float32(0.0)
    step = combat_step_fn(floor, brain=br)
    st = initial_agents_state(np.asarray([[0, 0.5, 0]], F32),
                              key=jax.random.PRNGKey(1))
    tpos = jnp.asarray([[0.0, 0.0, -10.0]], F32)
    talive = jnp.asarray([True])
    tids = jnp.asarray([7], jnp.int32)
    sids = jnp.asarray([10000], jnp.int32)
    fired, aims = 0, []
    eye_h = float(default_brain_params()["eye_height"])
    for _ in range(90):                      # 3 s, cooldown 0.9 s
        prev = np.asarray(st["char"]["position"][0])
        st = step(st, jnp.float32(1 / 30), tpos, talive, tids, sids)
        if bool(st["fire"][0]):
            fired += 1
            # aim was computed from the PRE-step eye position
            want = (np.asarray([0, eye_h, -10.0])
                    - (prev + np.asarray([0, eye_h, 0.0])))
            want = want / np.linalg.norm(want)
            aims.append((np.asarray(st["aim"][0]), want))
    assert 2 <= fired <= 5, fired           # cooldown caps the rate
    for a, want in aims:                    # spread 0 → dead-on the enemy
        assert float(a @ want) > 0.999, (a, want)
    # combat facing: rotation turned toward the enemy (-z → identity yaw)
    out = jax.device_get(st)
    assert abs(float(out["rotation"][0, 3])) > 0.9


def test_combat_requires_line_of_sight():
    """A wall between agent and target: never acquires, never fires,
    keeps patrolling instead of grinding into the wall."""
    wall = (np.diag(np.asarray([4.0, 3.0, 0.25, 1.0], F32))
            @ ml.translation(np.asarray([0.0, 1.0, -5.0], F32)))
    world = world_from([
        (primitives.plane(80.0, y=0.0), np.eye(4, dtype=F32)),
        (primitives.cube(2.0), wall.astype(F32)),
    ])
    step = combat_step_fn(world)
    st = initial_agents_state(np.asarray([[0, 0.5, 0]], F32),
                              key=jax.random.PRNGKey(2))
    tpos = jnp.asarray([[0.0, 0.0, -10.0]], F32)
    for _ in range(60):
        st = step(st, jnp.float32(1 / 30), tpos, jnp.asarray([True]),
                  jnp.asarray([7], jnp.int32),
                  jnp.asarray([10000], jnp.int32))
        assert not bool(st["fire"][0])


def test_combat_never_targets_self(floor):
    """An agent whose own id is the only 'target' keeps patrolling."""
    step = combat_step_fn(floor)
    st = initial_agents_state(np.asarray([[0, 0.5, 0]], F32),
                              key=jax.random.PRNGKey(3))
    for _ in range(30):
        st = step(st, jnp.float32(1 / 30),
                  jnp.asarray([[0.5, 0.0, 0.5]], F32),
                  jnp.asarray([True]), jnp.asarray([10000], jnp.int32),
                  jnp.asarray([10000], jnp.int32))
        assert not bool(st["fire"][0])


def test_combat_standoff_and_strafe(floor):
    """Inside standoff range the agent stops closing: its distance to
    the enemy stays near/above standoff instead of collapsing to zero."""
    br = default_brain_params()
    step = combat_step_fn(floor, brain=br)
    st = initial_agents_state(np.asarray([[0, 0.5, -2.0]], F32),
                              key=jax.random.PRNGKey(4))
    tpos = jnp.asarray([[0.0, 0.0, -10.0]], F32)
    dists = []
    for _ in range(150):
        st = step(st, jnp.float32(1 / 30), tpos, jnp.asarray([True]),
                  jnp.asarray([7], jnp.int32),
                  jnp.asarray([10000], jnp.int32))
        p = np.asarray(st["char"]["position"][0])
        dists.append(float(np.linalg.norm(
            (p - np.asarray([0, 0, -10.0]))[[0, 2]])))
    assert min(dists[60:]) > float(br["standoff"]) * 0.5, min(dists[60:])


# ---------------------------------------------------------------------------
# Separation
# ---------------------------------------------------------------------------

def test_separation_unstacks_agents(floor):
    """Two agents dropped at the same point with the same goal spread to
    roughly separation_radius instead of riding inside each other."""
    br = default_brain_params()
    starts = np.asarray([[0, 0.5, 0], [0.05, 0.5, 0]], F32)
    st = initial_agents_state(starts, key=jax.random.PRNGKey(5))
    out = run(floor, st, [[25.0, 0.0, 0.0]], steps=90, brain=br)
    p = out["char"]["position"]
    gap = float(np.linalg.norm((p[0] - p[1])[[0, 2]]))
    assert gap > 0.5 * float(br["separation_radius"]), gap
