"""Simulation tests: batched Möller–Trumbore raycast + character controller."""

import numpy as np

import jax
import jax.numpy as jnp

from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.sim import (
    FACE_MASK_IGNORE_BACKFACES,
    FACE_MASK_IGNORE_FRONTFACES,
    FACE_MASK_NONE,
    build_collision_world,
    character_step,
    default_character_params,
    initial_character_state,
    raycast,
    raycast_batch,
)
from softwarerenderer_tpu.utils import mathlib as ml


def world_from(meshes_and_mats):
    insts = [scene_mod.MeshInstance(m, mat) for m, mat in meshes_and_mats]
    return build_collision_world(scene_mod.build_scene_buffers(insts))


def floor_world(y=0.0, size=50.0):
    return world_from([(primitives.plane(size, y=y), np.eye(4, dtype=np.float32))])


# ---------------------------------------------------------------------------
# Raycast
# ---------------------------------------------------------------------------

def test_ray_hits_floor():
    w = floor_world()
    out = raycast([0.0, 5.0, 0.0], [0.0, -1.0, 0.0], w)
    assert bool(out["hit"])
    np.testing.assert_allclose(float(out["distance"]), 5.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["point"]), [0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["normal"]), [0, 1, 0],
                               atol=1e-5)


def test_ray_misses():
    w = floor_world()
    out = raycast([0.0, 5.0, 0.0], [0.0, 1.0, 0.0], w)
    assert not bool(out["hit"])
    assert float(out["distance"]) == np.finfo(np.float32).max


def test_backface_mask():
    w = floor_world()
    # From below, the floor's front faces point up: backface-ignored rays
    # pass through, mask-free rays hit.
    up = raycast([0.0, -5.0, 0.0], [0.0, 1.0, 0.0], w,
                 FACE_MASK_IGNORE_BACKFACES)
    assert not bool(up["hit"])
    any_face = raycast([0.0, -5.0, 0.0], [0.0, 1.0, 0.0], w, FACE_MASK_NONE)
    assert bool(any_face["hit"])
    front_only = raycast([0.0, 5.0, 0.0], [0.0, -1.0, 0.0], w,
                         FACE_MASK_IGNORE_FRONTFACES)
    assert not bool(front_only["hit"])


def test_nearest_hit_wins():
    w = world_from([(primitives.plane(50.0, y=0.0), np.eye(4, dtype=np.float32)),
                    (primitives.plane(50.0, y=2.0), np.eye(4, dtype=np.float32))])
    out = raycast([0.0, 5.0, 0.0], [0.0, -1.0, 0.0], w)
    np.testing.assert_allclose(float(out["distance"]), 3.0, atol=1e-5)


def test_model_matrix_transform():
    # A floor lifted by its model matrix must be hit at the lifted height.
    w = world_from([(primitives.plane(50.0, y=0.0),
                     ml.translation([0.0, 3.0, 0.0]))])
    out = raycast([0.0, 5.0, 0.0], [0.0, -1.0, 0.0], w)
    np.testing.assert_allclose(float(out["distance"]), 2.0, atol=1e-5)


def test_smooth_normal_interpolation():
    mesh = primitives.uv_sphere(1.0, rings=16, sectors=24)
    w = world_from([(mesh, np.eye(4, dtype=np.float32))])
    out = raycast([0.0, 0.0, 5.0], [0.0, 0.0, -1.0], w)
    assert bool(out["hit"])
    # interpolated vertex normals ≈ the exact sphere normal at the hit
    np.testing.assert_allclose(np.asarray(out["normal"]), [0, 0, 1],
                               atol=0.05)


def test_batched_rays():
    w = floor_world()
    origins = np.array([[x, 5.0, 0.0] for x in range(5)], np.float32)
    dirs = np.tile(np.float32([0, -1, 0]), (5, 1))
    out = raycast_batch(origins, dirs, w)
    assert bool(out["hit"].all())
    np.testing.assert_allclose(np.asarray(out["distance"]),
                               np.full(5, 5.0), atol=1e-5)


def test_tri_mask_excludes():
    w = floor_world()
    n_tris = w["v0"].shape[0]
    out = raycast([0.0, 5.0, 0.0], [0.0, -1.0, 0.0], w,
                  tri_mask=np.zeros(n_tris, bool))
    assert not bool(out["hit"])


def test_raycast_jits():
    w = floor_world()
    f = jax.jit(lambda o, d: raycast_batch(o, d, w))
    out = f(np.float32([[0, 5, 0]]), np.float32([[0, -1, 0]]))
    assert bool(out["hit"][0])


# ---------------------------------------------------------------------------
# Character controller
# ---------------------------------------------------------------------------

def step_n(state, world, params, n, move=(0.0, 0.0, 0.0), jump=False,
           dt=1.0 / 60.0):
    f = jax.jit(lambda s: character_step(s, np.float32(move), jump, dt,
                                         world, params))
    for _ in range(n):
        state = f(state)
    return state


def test_falls_and_lands_on_floor():
    w = floor_world()
    p = default_character_params()
    s = initial_character_state([0.0, 3.0, 0.0])
    s = step_n(s, w, p, 120)
    assert bool(s["grounded"])
    # standing height = floor + height/2
    np.testing.assert_allclose(float(s["position"][1]), 0.25, atol=0.02)
    assert abs(float(s["velocity"][1])) < 1e-3


def test_walks_forward_on_ground():
    w = floor_world()
    p = default_character_params()
    s = initial_character_state([0.0, 0.25, 0.0])
    s = step_n(s, w, p, 90, move=(0.0, 0.0, -1.0))
    assert float(s["position"][2]) < -1.0
    assert abs(float(s["position"][0])) < 1e-3
    assert bool(s["grounded"])


def test_jump_leaves_ground_then_lands():
    w = floor_world()
    p = default_character_params()
    s = initial_character_state([0.0, 0.25, 0.0])
    s = step_n(s, w, p, 30)           # settle
    s = step_n(s, w, p, 3, jump=True)
    assert float(s["velocity"][1]) > 1.0 or not bool(s["grounded"])
    s = step_n(s, w, p, 180)
    assert bool(s["grounded"])
    np.testing.assert_allclose(float(s["position"][1]), 0.25, atol=0.02)


def test_wall_blocks_and_slides():
    # floor + wall at z=-2 (a big cube face); walking diagonally into the
    # wall must not tunnel and should slide along x.
    wall = primitives.cube(4.0)
    w = world_from([
        (primitives.plane(50.0, y=0.0), np.eye(4, dtype=np.float32)),
        (wall, ml.translation([0.0, 2.0, -4.0])),  # front face at z=-2
    ])
    p = default_character_params()
    s = initial_character_state([0.0, 0.25, 0.0])
    s = step_n(s, w, p, 240, move=(-0.3, 0.0, -1.0))
    # not through the wall (front face at z=-2, capsule radius 0.15)
    assert float(s["position"][2]) > -2.0
    # slid sideways along the wall
    assert float(s["position"][0]) < -0.5


def test_ceiling_stops_upward_velocity():
    w = world_from([
        (primitives.plane(50.0, y=0.0), np.eye(4, dtype=np.float32)),
        (primitives.plane(50.0, y=1.2), ml.matrix_from_yaw_pitch_roll(
            0.0, np.float32(np.pi), 0.0)),  # flipped to face down
    ])
    p = default_character_params()
    s = initial_character_state([0.0, 0.25, 0.0])
    s = step_n(s, w, p, 30)
    s = step_n(s, w, p, 30, jump=True)
    # jumped but bonked: never passes the ceiling
    assert float(s["position"][1]) < 1.2
    s = step_n(s, w, p, 120)
    assert bool(s["grounded"])


def test_noclip_moves_freely():
    w = floor_world()
    p = default_character_params()
    s = initial_character_state([0.0, 0.25, 0.0])
    s["noclip"] = jnp.asarray(True)
    s = step_n(s, w, p, 60, move=(0.0, -1.0, 0.0))
    assert float(s["position"][1]) < -3.0  # straight through the floor


def test_step_is_jittable_and_shape_stable():
    w = floor_world()
    p = default_character_params()
    s = initial_character_state([0.0, 1.0, 0.0])
    f = jax.jit(lambda s, m, j: character_step(s, m, j, 1.0 / 60.0, w, p))
    s1 = f(s, np.float32([0, 0, 0]), False)
    s2 = f(s1, np.float32([1, 0, 0]), True)
    assert s2["position"].shape == (3,)
