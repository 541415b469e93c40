"""Ray-traced render mode (ops/raytrace.py): hit shading, raster
agreement, hard shadows, sky background, Engine integration."""

import jax
import numpy as np

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import Engine
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.ops import texture as tex_ops
from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR
from softwarerenderer_tpu.ops.raytrace import render_frame_raytraced
from softwarerenderer_tpu.utils import mathlib as ml

W, H = 96, 72


def _scene(extra=()):
    checker = np.asarray(tex_ops.checkerboard(16, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.cube(1.0),
                                    ml.translation([0.0, 0.0, -3.0]),
                                    texture=checker)]
    insts += list(extra)
    return scene_mod.build_scene_buffers(insts)


def test_raytraced_agrees_with_raster():
    """Primary-ray visibility and shading match the rasterizer away from
    triangle edges (same camera model, same fragment shader)."""
    sc = _scene()
    params = RenderParams(width=W, height=H)
    eng = Engine(sc, params, chunk=32)
    u = dict(eng.uniforms)
    rc_color, rc_depth = eng.render(u)

    rt = jax.jit(lambda s, uu: render_frame_raytraced(
        s, uu, params, chunk=512))
    rt_color, rt_depth = rt(sc, u)
    rc_color, rc_depth = np.asarray(rc_color), np.asarray(rc_depth)
    rt_color, rt_depth = np.asarray(rt_color), np.asarray(rt_depth)

    cov_rc = rc_depth != DEPTH_CLEAR
    cov_rt = rt_depth != DEPTH_CLEAR
    # coverage agrees except edge pixels
    assert (cov_rc != cov_rt).mean() < 0.02
    both = cov_rc & cov_rt
    assert both.sum() > 100
    np.testing.assert_allclose(rt_depth[both], rc_depth[both], atol=1e-3)
    # shaded colors agree closely on interior pixels (same shader; the
    # differences are nearest-texel boundary flips where fp-different uv
    # paths land on opposite sides of a checker edge)
    diff = np.abs(rt_color[both] - rc_color[both]).max(axis=-1)
    assert (diff < 0.02).mean() > 0.9
    assert np.median(diff) < 1e-3


def test_hard_shadow_darkens_occluded_ground():
    """A slab above the ground casts a geometrically exact shadow."""
    ground = scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0.0, -1.0, 0.0]))
    slab = scene_mod.MeshInstance(primitives.cube(1.6),
                                  ml.translation([0.0, 1.5, -4.0]))
    sc = scene_mod.build_scene_buffers([ground, slab])
    params = RenderParams(width=W, height=H)
    u = Engine(sc, params).uniforms
    u = dict(u)
    u["camera_position"] = np.float32([0.0, 0.5, 0.0])
    u["light_direction"] = np.float32([0.0, -1.0, 0.0])   # straight down

    rt = jax.jit(lambda s, uu, sh: render_frame_raytraced(
        s, uu, params, chunk=512, shadows=sh), static_argnums=2)
    shadowed, _ = rt(sc, u, True)
    unshadowed, _ = rt(sc, u, False)
    shadowed, unshadowed = np.asarray(shadowed), np.asarray(unshadowed)
    dark = (unshadowed[..., :3].sum(-1)
            - shadowed[..., :3].sum(-1)) > 0.05
    assert dark.sum() > 20                    # a shadow patch exists
    assert (shadowed <= unshadowed + 1e-6).all()


def test_miss_shows_clear_color_and_sky():
    sc = _scene()
    params = RenderParams(width=32, height=24)
    u = dict(Engine(sc, params).uniforms)
    u["camera_rotation"] = np.asarray(
        ml.quat_from_yaw_pitch_roll(np.pi, 0.0, 0.0), np.float32)
    rt = jax.jit(lambda s, uu: render_frame_raytraced(
        s, uu, params, chunk=256))
    color, depth = rt(sc, u)
    color, depth = np.asarray(color), np.asarray(depth)
    assert (depth == DEPTH_CLEAR).all()       # cube is behind the camera
    np.testing.assert_allclose(color[0, 0], u["clear_color"], atol=1e-6)

    pano = np.zeros((8, 16, 4), np.float32)
    pano[:, :, 1] = 1.0                       # green sky
    u2 = dict(u)
    u2["sky_panorama"] = pano
    color2, _ = jax.jit(lambda s, uu: render_frame_raytraced(
        s, uu, params, chunk=256))(sc, u2)
    np.testing.assert_allclose(np.asarray(color2)[0, 0, 1], 1.0,
                               atol=1e-5)


def test_engine_frame_fn_and_mesh_visibility():
    sc = _scene()
    params = RenderParams(width=32, height=24)
    eng = Engine(sc, params, frame_fn=render_frame_raytraced)
    u = dict(eng.uniforms)
    u["mesh_visible"] = np.ones(sc["mesh_matrices"].shape[0], bool)
    _, depth = eng.render(u)
    assert (np.asarray(depth) != DEPTH_CLEAR).any()
    u["mesh_visible"] = np.zeros_like(u["mesh_visible"])
    _, depth2 = eng.render(u)
    assert (np.asarray(depth2) == DEPTH_CLEAR).all()


def test_soft_shadows_produce_penumbra():
    """With a disc light (rt_light_radius) and multiple samples, shadow
    edges take intermediate visibility values; radius 0 stays binary."""
    import functools

    ground = scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0.0, -1.0, 0.0]))
    slab = scene_mod.MeshInstance(primitives.cube(1.2),
                                  ml.translation([0.0, 2.0, -4.0]))
    sc = scene_mod.build_scene_buffers([ground, slab])
    params = RenderParams(width=W, height=H)
    u = dict(Engine(sc, params).uniforms)
    u["camera_position"] = np.float32([0.0, 0.5, 0.0])
    u["light_direction"] = np.float32([0.0, -1.0, 0.0])
    u["rt_light_radius"] = np.float32(0.35)

    fn = jax.jit(functools.partial(render_frame_raytraced, params=params,
                                   chunk=512, shadow_samples=8))
    color, _ = fn(sc, u)
    lum = np.asarray(color)[..., :3].sum(-1)

    u0 = dict(u)
    u0["rt_light_radius"] = np.float32(0.0)
    hard, _ = fn(sc, u0)
    hard_lum = np.asarray(hard)[..., :3].sum(-1)

    def n_levels(a):
        return len(np.unique(np.round(a, 4)))

    # soft shadows show strictly more distinct lighting levels on the
    # ground than the binary hard shadow
    assert n_levels(lum) > n_levels(hard_lum) + 3


def test_reflections_mirror_scene_content():
    """A floor with reflections shows the sphere above it; without,
    it doesn't."""
    import functools

    ground = scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0.0, -1.0, 0.0]))
    ball = scene_mod.MeshInstance(
        primitives.uv_sphere(0.6, rings=12, sectors=24),
        ml.translation([0.0, 0.2, -3.5]))
    # paint the ball red via vertex colors so its reflection is traceable
    ball.mesh = dict(ball.mesh)
    col = np.asarray(ball.mesh["color"]).copy()
    col[:] = [1.0, 0.05, 0.05, 1.0]
    ball.mesh["color"] = col
    sc = scene_mod.build_scene_buffers([ground, ball])
    params = RenderParams(width=W, height=H)
    u = dict(Engine(sc, params).uniforms)
    u["camera_position"] = np.float32([0.0, 0.3, 0.0])
    u["rt_reflectivity"] = np.float32(0.6)

    fn = jax.jit(functools.partial(
        render_frame_raytraced, params=params, chunk=512,
        shadows=False, reflections=True))
    off = jax.jit(functools.partial(
        render_frame_raytraced, params=params, chunk=512,
        shadows=False, reflections=False))
    refl, _ = fn(sc, u)
    base, _ = off(sc, u)
    refl, base = np.asarray(refl), np.asarray(base)

    # bottom quarter (floor only — the ball itself sits higher): with
    # reflections, red appears there
    floor_r = refl[H * 3 // 4:]
    floor_b = base[H * 3 // 4:]
    redness_r = (floor_r[..., 0] - floor_r[..., 1]).max()
    redness_b = (floor_b[..., 0] - floor_b[..., 1]).max()
    assert redness_r > redness_b + 0.15
