"""Unit tests for the row-vector math library against hand-computed
System.Numerics semantics (the conventions the reference relies on —
SURVEY.md §6 note 2)."""

import numpy as np
import pytest

from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def test_perspective_matrix_values():
    # fov=60deg, aspect 4:3, near .1 far 100 — .NET formula
    m = ml.perspective_fov(np.deg2rad(60.0), 4.0 / 3.0, 0.1, 100.0)
    y = 1.0 / np.tan(np.deg2rad(30.0))
    assert np.isclose(m[1, 1], y, rtol=1e-6)
    assert np.isclose(m[0, 0], y * 3.0 / 4.0, rtol=1e-6)
    assert np.isclose(m[2, 2], 100.0 / (0.1 - 100.0), rtol=1e-6)
    assert m[2, 3] == -1.0
    assert np.isclose(m[3, 2], 0.1 * 100.0 / (0.1 - 100.0), rtol=1e-6)
    assert m[3, 3] == 0.0


def test_perspective_ndc_range():
    near, far = 0.1, 100.0
    m = ml.perspective_fov(np.deg2rad(90.0), 1.0, near, far)
    for d, expected in [(near, 0.0), (far, 1.0)]:
        v = np.array([0, 0, -d, 1], dtype=F32)
        clip = ml.transform(v, m)
        assert np.isclose(clip[3], d, rtol=1e-5)
        assert np.isclose(clip[2] / clip[3], expected, atol=1e-5)


def test_look_at_maps_forward_to_negative_z():
    eye = np.array([1.0, 2.0, 3.0], dtype=F32)
    target = np.array([1.0, 2.0, 0.0], dtype=F32)  # looking down -Z
    view = ml.look_at(eye, target, [0, 1, 0])
    p = ml.transform(np.array([1.0, 2.0, 1.0, 1.0], dtype=F32), view)
    # point 2 in front of eye -> view z = -2
    assert np.allclose(p, [0, 0, -2, 1], atol=1e-5)


def test_look_at_right_handed_basis():
    view = ml.look_at([0, 0, 0], [0, 0, -1], [0, 1, 0])
    # +X world point should be at +X in view space
    p = ml.transform(np.array([1.0, 0, 0, 1], dtype=F32), view)
    assert np.allclose(p, [1, 0, 0, 1], atol=1e-6)


def test_translation_row_vector():
    m = ml.translation([1, 2, 3])
    p = ml.transform(np.array([0, 0, 0, 1], dtype=F32), m)
    assert np.allclose(p, [1, 2, 3, 1])
    # scale-then-translate composes in application order (A first)
    st = ml.scale(2.0) @ ml.translation([1, 0, 0])
    p = ml.transform(np.array([1, 0, 0, 1], dtype=F32), st)
    assert np.allclose(p, [3, 0, 0, 1])


def test_quat_axis_angle_rotation():
    # +90deg about +Y maps -Z to -X (right-hand rule)
    q = ml.quat_from_axis_angle([0, 1, 0], np.pi / 2)
    v = ml.quat_rotate(np.array([0, 0, -1], dtype=F32), q)
    assert np.allclose(v, [-1, 0, 0], atol=1e-6)


def test_quat_matrix_consistency():
    rng = np.random.default_rng(3)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    q = ml.quat_from_axis_angle(axis.astype(F32), 1.234)
    m = ml.matrix_from_quaternion(q)
    v = rng.normal(size=3).astype(F32)
    assert np.allclose(ml.quat_rotate(v, q), ml.transform_normal(v, m),
                       atol=1e-5)


def test_quat_mul_hamilton_composition():
    # Hamilton product: rotate(v, q1*q2) == rotate(rotate(v, q2), q1)
    q1 = ml.quat_from_axis_angle([0, 1, 0], 0.7)
    q2 = ml.quat_from_axis_angle([1, 0, 0], -0.4)
    v = np.array([0.3, -0.5, 0.8], dtype=F32)
    lhs = ml.quat_rotate(v, ml.quat_mul(q1, q2))
    rhs = ml.quat_rotate(ml.quat_rotate(v, q2), q1)
    assert np.allclose(lhs, rhs, atol=1e-6)


def test_yaw_pitch_roll_euler_roundtrip():
    q = ml.quat_from_yaw_pitch_roll(np.deg2rad(30.0), np.deg2rad(-20.0),
                                    np.deg2rad(10.0))
    e = ml.quat_to_euler_degrees(q)
    assert np.allclose(e, [-20.0, 30.0, 10.0], atol=1e-3)


def test_invert():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(4, 4)).astype(F32)
    inv, ok = ml.invert(m)
    assert ok
    assert np.allclose(m @ inv, np.eye(4), atol=1e-4)


def test_invert_singular():
    m = np.zeros((4, 4), dtype=F32)
    _, ok = ml.invert(m)
    assert not ok


def test_slerp_endpoints():
    q1 = ml.quat_from_axis_angle([0, 1, 0], 0.0)
    q2 = ml.quat_from_axis_angle([0, 1, 0], 1.0)
    assert np.allclose(ml.quat_slerp(q1, q2, 0.0), q1, atol=1e-6)
    assert np.allclose(ml.quat_slerp(q1, q2, 1.0), q2, atol=1e-6)
    mid = ml.quat_slerp(q1, q2, 0.5)
    expected = ml.quat_from_axis_angle([0, 1, 0], 0.5)
    assert np.allclose(mid, expected, atol=1e-5)


def test_euler_to_direction_default_light():
    # Renderer.cs:42-43: LightEulerDegrees (-45,-45,0)
    d = ml.euler_degrees_to_direction([-45.0, -45.0, 0.0])
    assert np.isclose(np.linalg.norm(d), 1.0, atol=1e-6)
    # pitch -45 rotates -Z downward: y' = -sin(45) — the light shines down
    assert np.isclose(d[1], -np.sin(np.pi / 4), atol=1e-5)


def test_jax_backend_matches_numpy():
    import jax.numpy as jnp

    m_np = ml.perspective_fov(np.deg2rad(70.0), 1.5, 0.1, 50.0, xp=np)
    m_jx = np.asarray(ml.perspective_fov(
        jnp.float32(np.deg2rad(70.0)), jnp.float32(1.5),
        jnp.float32(0.1), jnp.float32(50.0), xp=jnp))
    assert np.allclose(m_np, m_jx, atol=1e-7)

    v = ml.look_at([1, 2, 3], [0, 0, 0], [0, 1, 0], xp=np)
    vj = np.asarray(ml.look_at(
        jnp.asarray([1.0, 2, 3]), jnp.zeros(3), jnp.asarray([0.0, 1, 0]),
        xp=jnp))
    assert np.allclose(v, vj, atol=1e-6)
