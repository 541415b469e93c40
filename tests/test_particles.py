"""Particle system (sim/particles.py): pure-step physics, ring-buffer
emission, billboard geometry, and the fused sim+render program.

Beyond the reference (it has no particles); the tests pin the same
contracts the rest of the sim layer lives by — deterministic pure steps,
static shapes, device/host agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softwarerenderer_tpu.models import scene as scene_mod
from softwarerenderer_tpu.sim import particles as P

F32 = np.float32


def _quiet_emitter(**over):
    em = P.default_emitter_params()
    em["rate"] = np.float32(0.0)
    em.update({k: np.asarray(v, F32) if np.ndim(v) else np.float32(v)
               for k, v in over.items()})
    return em


def _seed_one(state, pos, vel, lifetime=10.0):
    state = dict(state)
    state["position"] = state["position"].at[0].set(jnp.asarray(pos, F32))
    state["velocity"] = state["velocity"].at[0].set(jnp.asarray(vel, F32))
    state["lifetime"] = state["lifetime"].at[0].set(F32(lifetime))
    return state


def test_step_matches_host_integration():
    """Semi-implicit Euler with drag: device step == NumPy replica."""
    em = _quiet_emitter(drag=0.25)
    state = _seed_one(P.initial_particle_state(4), [1.0, 2.0, -3.0],
                      [0.5, 4.0, 0.25])
    dt = 1.0 / 60.0
    step = jax.jit(lambda s: P.particle_step(s, em, dt))

    p = np.asarray([1.0, 2.0, -3.0])
    v = np.asarray([0.5, 4.0, 0.25])
    g = np.asarray(em["gravity"], np.float64)
    for _ in range(90):
        state = step(state)
        v = (v + g * dt) * max(0.0, 1.0 - float(em["drag"]) * dt)
        p = p + v * dt
    np.testing.assert_allclose(np.asarray(state["position"])[0], p,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(state["velocity"])[0], v,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(state["age"])[0], 90 * dt,
                               atol=1e-5)


def test_floor_bounce():
    """A falling particle reflects off floor_y with restitution."""
    em = _quiet_emitter(floor_y=0.0, restitution=0.5)
    state = _seed_one(P.initial_particle_state(2), [0.0, 0.05, 0.0],
                      [0.0, -3.0, 0.0])
    dt = 1.0 / 30.0
    state = P.particle_step(state, em, dt)
    assert float(state["position"][0, 1]) == 0.0
    assert float(state["velocity"][0, 1]) > 0.0


def test_death_zeroes_render_channels():
    em = _quiet_emitter()
    state = _seed_one(P.initial_particle_state(2), [0, 0, 0], [0, 0, 0],
                      lifetime=0.05)
    state = P.particle_step(state, em, 0.1)
    assert float(state["lifetime"][0]) == 0.0
    u = P.particle_uniforms(state, em)
    assert float(u["particle_size"][0]) == 0.0
    assert float(u["particle_color"][0, 3]) == 0.0


def test_emission_rate_and_determinism():
    em = P.default_emitter_params()   # rate 120/s, lifetime ≥ 1.2 s
    dt = 1.0 / 60.0
    s1 = P.initial_particle_state(256, seed=7)
    s2 = P.initial_particle_state(256, seed=7)
    s3 = P.initial_particle_state(256, seed=8)
    step = jax.jit(lambda s: P.particle_step(s, em, dt))
    for _ in range(30):
        s1, s2, s3 = step(s1), step(s2), step(s3)
    alive = int(np.sum(np.asarray(s1["lifetime"]) > 0))
    assert 58 <= alive <= 60          # ≈ rate · t, all still inside lifetime
    for k in s1:
        np.testing.assert_array_equal(np.asarray(s1[k]), np.asarray(s2[k]))
    assert not np.allclose(np.asarray(s1["position"]),
                           np.asarray(s3["position"]))


def test_ring_recycles_oldest():
    em = P.default_emitter_params()
    em["rate"] = np.float32(300.0)
    state = P.initial_particle_state(8, seed=1)
    for _ in range(20):
        state = P.particle_step(state, em, 1.0 / 30.0)
    assert int(np.sum(np.asarray(state["lifetime"]) > 0)) == 8
    # the ring keeps only the newest 8: every age < 8 emission intervals
    assert np.asarray(state["age"]).max() < 8 / 300.0 + 0.2


def test_billboards_use_camera_basis():
    """Corner positions = center ± size/2 · camera right/up — the view
    matrix's columns, cross-checked against the Camera helpers."""
    from softwarerenderer_tpu.engine import camera_matrices
    from softwarerenderer_tpu.utils import mathlib as ml

    rot = ml.quat_from_euler_degrees(20.0, 40.0, 0.0) \
        if hasattr(ml, "quat_from_euler_degrees") else None
    if rot is None:
        yaw = np.deg2rad(40.0)
        rot = np.asarray([0, np.sin(yaw / 2), 0, np.cos(yaw / 2)], F32)
    cam = scene_mod.Camera(position=np.asarray([1.0, 2.0, 3.0], F32),
                           rotation=np.asarray(rot, F32))
    uniforms = {"camera_position": cam.position,
                "camera_rotation": cam.rotation,
                "fov_degrees": np.float32(70.0),
                "near_clip": np.float32(0.1),
                "far_clip": np.float32(100.0)}
    view, _ = camera_matrices(uniforms, 64, 64)

    n = 2
    mesh = P.particles_mesh(n)
    scene = {"particle_vert_index": np.arange(4 * n, dtype=np.int32),
             "particle_vert_pidx": np.repeat(np.arange(n, dtype=np.int32),
                                             4),
             "particle_corner": np.tile(P._CORNERS, (n, 1))}
    centers = np.asarray([[0.0, 0.0, -5.0], [2.0, 1.0, -4.0]], F32)
    u = {"particle_centers": centers,
         "particle_size": np.asarray([1.0, 0.5], F32),
         "particle_color": np.tile(np.asarray([1, 0, 0, 1], F32), (n, 1))}
    vin = {"position": jnp.zeros((4 * n, 3), jnp.float32),
           "normal": jnp.zeros((4 * n, 3), jnp.float32),
           "color": jnp.zeros((4 * n, 4), jnp.float32)}
    out = P.apply_billboards(vin, scene, u, view, xp=jnp)

    right, up = cam.right(), cam.up()
    got = np.asarray(out["position"]).reshape(n, 4, 3)
    for i, (c, s) in enumerate(zip(centers, [1.0, 0.5])):
        for k, (cx, cy) in enumerate(P._CORNERS):
            want = c + cx * s * right + cy * s * up
            np.testing.assert_allclose(got[i, k], want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["normal"])[0],
                               -np.asarray(cam.front()), atol=1e-5)


def test_fused_sim_render_program():
    """Step + billboard + full frame in ONE jitted program; coverage
    appears where the burst is and vanishes when everything is dead."""
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine

    n = 64
    insts = [scene_mod.MeshInstance(P.particles_mesh(n, extent=30.0),
                                    particles=n,
                                    texture=P.soft_disc_texture())]
    scene = scene_mod.build_scene_buffers(insts)
    eng = Engine(scene, RenderParams(width=160, height=120))
    em = P.default_emitter_params()
    em["origin"] = np.asarray([0.0, 0.0, -4.0], F32)
    em["base_velocity"] = np.zeros(3, F32)
    em["spread"] = np.float32(0.5)
    em["gravity"] = np.zeros(3, F32)
    em["size"] = np.asarray([0.5, 0.3], F32)

    @jax.jit
    def frame(state, uniforms):
        state = P.particle_step(state, em, 1.0 / 60.0)
        u = dict(uniforms)
        u.update(P.particle_uniforms(state, em))
        c, d = eng._frame(eng.scene, u)
        return state, c, d

    state = P.initial_particle_state(n, seed=3)
    for _ in range(12):
        state, c, d = frame(state, eng.uniforms)
    cov = np.asarray(d) > -1e30
    assert cov.sum() > 20
    assert np.isfinite(np.asarray(c)).all()

    # kill everything: no emission, ages past all lifetimes
    em_dead = dict(em)
    em_dead["rate"] = np.float32(0.0)

    @jax.jit
    def frame_dead(state, uniforms):
        state = P.particle_step(state, em_dead, 10.0)
        u = dict(uniforms)
        u.update(P.particle_uniforms(state, em_dead))
        _, d = eng._frame(eng.scene, u)
        return state, d

    state, d = frame_dead(state, eng.uniforms)
    assert (np.asarray(d) > -1e30).sum() == 0


def test_capacity_mismatch_rejected():
    from softwarerenderer_tpu.models.primitives import cube
    with pytest.raises(ValueError, match="particles"):
        scene_mod.build_scene_buffers(
            [scene_mod.MeshInstance(cube(1.0), particles=16)])
