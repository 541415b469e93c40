"""Directional shadow maps (ops/shadows.py — capability beyond the
reference): occluded points read 0, open points 1, and the full frame
darkens exactly where the occluder blocks the light."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import (default_frame_uniforms,
                                         render_frame,
                                         render_frame_with_shadows)
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.ops import shadows, texture as tex_ops
from softwarerenderer_tpu.utils import mathlib as ml


def scene_with_occluder():
    checker = np.asarray(tex_ops.checkerboard(32, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0, -1, 0]),
                                    texture=checker),
             scene_mod.MeshInstance(primitives.cube(1.0),
                                    ml.translation([0, 0.2, -4]),
                                    texture=checker)]
    return scene_mod.build_scene_buffers(insts)


def test_shadow_factor_occlusion():
    """A floor point straight down-light from the cube is occluded; a
    point far to the side is lit."""
    sc = scene_with_occluder()
    u = default_frame_uniforms(64, 64)
    ld = np.asarray(u["light_direction"], np.float32)

    @jax.jit
    def factors(scene, u):
        mm = jnp.asarray(scene["mesh_matrices"], jnp.float32)
        wc = ml.transform_point(jnp.asarray(scene["bounds_center"],
                                            jnp.float32), mm, xp=jnp)
        rn = jnp.sqrt(jnp.sum(mm[:, :3, :3] ** 2, axis=-1))
        wr = jnp.asarray(scene["bounds_radius"], jnp.float32) \
            * jnp.max(rn, -1)
        center = jnp.mean(wc, axis=0)
        radius = jnp.max(jnp.linalg.norm(wc - center, axis=-1) + wr)
        view, proj, _ = shadows.directional_light_camera(
            u["light_direction"], center, radius)
        smap = shadows.render_shadow_depth(sc, u, view, proj, 256)
        uu = dict(u)
        uu.update(shadow_map=smap, shadow_view=view, shadow_proj=proj)
        cube_center = np.float32([0, 0.2, -4])
        # march from the cube center along the light onto the floor plane
        t = (-1.0 - cube_center[1]) / ld[1]
        behind = cube_center + ld * t          # floor point in shadow
        aside = behind + np.float32([6.0, 0.0, 0.0])
        pts = jnp.asarray(np.stack([behind, aside]))
        return shadows.shadow_factor(pts, uu, xp=jnp)

    f = np.asarray(factors(sc, u))
    assert f[0] == 0.0, f"occluded point reads lit: {f}"
    assert f[1] == 1.0, f"open point reads shadowed: {f}"


@pytest.mark.slow
def test_shadowed_frame_darkens_under_occluder():
    sc = scene_with_occluder()
    params = RenderParams(width=160, height=120)
    u = default_frame_uniforms(160, 120)
    u["camera_position"] = np.float32([2.5, 2.0, 0.5])
    u["camera_rotation"] = ml.quat_from_yaw_pitch_roll(
        np.float32(0.55), np.float32(-0.35), np.float32(0))

    plain = np.asarray(jax.jit(functools.partial(
        render_frame, params=params))(sc, u)[0])
    shaded = np.asarray(jax.jit(functools.partial(
        render_frame_with_shadows, params=params,
        shadow_size=256))(sc, u)[0])

    assert plain.shape == shaded.shape
    darker = (shaded[..., :3].sum(-1) < plain[..., :3].sum(-1) - 0.05)
    # a contiguous-ish shadow patch exists but most of the frame matches
    assert 20 < darker.sum() < 0.25 * darker.size, int(darker.sum())


# ---------------------------------------------------------------------------
# Point-light cube shadows
# ---------------------------------------------------------------------------

def test_point_shadow_factor_occlusion():
    """Light at the origin, cube occluder at (0, 0, -4): a point straight
    behind the cube is shadowed, points in other directions are lit (also
    exercises face selection on all six faces)."""
    checker = np.asarray(tex_ops.checkerboard(32, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.cube(1.0),
                                    ml.translation([0, 0, -4]),
                                    texture=checker)]
    sc = scene_mod.build_scene_buffers(insts)
    u = default_frame_uniforms(64, 64)
    lp = np.float32([0.0, 0.0, 0.0])

    @jax.jit
    def factors(scene, u):
        smap, views, projs = shadows.render_point_shadow_depth(
            scene, u, lp, shadow_size=256, far=50.0)
        uu = dict(u)
        uu.update(point_shadow_map=smap, point_shadow_views=views,
                  point_shadow_projs=projs, point_light_position=lp)
        pts = jnp.asarray(np.float32([
            [0, 0, -8],      # straight behind the cube: occluded
            [0, 0, 8],       # opposite face: lit
            [8, 0, 0], [-8, 0, 0], [0, 8, 0], [0, -8, 0],   # lit
        ]))
        return shadows.point_shadow_factor(pts, uu, xp=jnp)

    f = np.asarray(factors(sc, u))
    assert f[0] == 0.0, f"occluded point reads lit: {f}"
    assert (f[1:] == 1.0).all(), f"open directions read shadowed: {f}"


@pytest.mark.slow
def test_point_shadowed_frame_darkens_behind_occluder():
    """Full frame via render_frame_with_point_shadows vs the same shader
    with an all-lit cube map: a bounded shadow patch darkens, the rest of
    the frame matches (pixel-wise, so the checker texture cancels)."""
    from softwarerenderer_tpu.engine import render_frame_with_point_shadows

    checker = np.asarray(tex_ops.checkerboard(32, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0, -1, 0]),
                                    texture=checker),
             scene_mod.MeshInstance(primitives.cube(0.8),
                                    ml.translation([0, 0.6, -4]),
                                    texture=checker)]
    sc = scene_mod.build_scene_buffers(insts)
    params = RenderParams(width=160, height=120)
    u = default_frame_uniforms(160, 120)
    u["camera_position"] = np.float32([2.5, 2.0, -0.5])
    u["camera_rotation"] = ml.quat_from_yaw_pitch_roll(
        np.float32(0.55), np.float32(-0.35), np.float32(0))
    u["point_light_position"] = np.float32([0.0, 3.0, -4.0])
    u["point_light_color"] = np.ones(4, np.float32)
    u["point_light_range"] = np.float32(40.0)

    shaded = np.asarray(jax.jit(functools.partial(
        render_frame_with_point_shadows, params=params,
        shadow_size=256))(sc, u)[0])

    # Same shader, empty cube map (DEPTH_CLEAR = nothing recorded ⇒ every
    # fragment passes the shadow compare ⇒ fully lit).
    from softwarerenderer_tpu.engine import render_frame as rf
    from softwarerenderer_tpu.ops.lighting import lit_scene_vertex_shader
    from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR
    views, projs = shadows.point_light_cameras(
        u["point_light_position"], 0.05, 100.0, xp=np)
    ulit = dict(u)
    ulit.update(point_shadow_map=np.full((6, 256, 256), DEPTH_CLEAR,
                                         np.float32),
                point_shadow_views=np.asarray(views, np.float32),
                point_shadow_projs=np.asarray(projs, np.float32))
    plain = np.asarray(jax.jit(functools.partial(
        rf, params=params, vertex_shader=lit_scene_vertex_shader,
        fragment_shader=shadows.point_shadowed_fragment_shader))(
            sc, ulit)[0])

    assert plain.shape == shaded.shape
    darker = (shaded[..., :3].sum(-1) < plain[..., :3].sum(-1) - 0.05)
    # a bounded shadow patch exists but most of the frame matches
    assert 20 < darker.sum() < 0.25 * darker.size, int(darker.sum())


# ---------------------------------------------------------------------------
# Spot-light shadows
# ---------------------------------------------------------------------------

def test_spot_shadow_factor_occlusion():
    """Spot light above, cube occluder below it: the floor point straight
    down the axis is occluded; a point inside the cone but to the side of
    the occluder is lit."""
    checker = np.asarray(tex_ops.checkerboard(32, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.cube(0.8),
                                    ml.translation([0, 0.6, -4]),
                                    texture=checker)]
    sc = scene_mod.build_scene_buffers(insts)
    u = default_frame_uniforms(64, 64)
    lp = np.float32([0.0, 3.0, -4.0])
    ldir = np.float32([0.0, -1.0, 0.0])

    @jax.jit
    def factors(scene, u):
        view, proj = shadows.spot_light_camera(lp, ldir,
                                               np.float32(np.deg2rad(40)))
        smap = shadows.render_shadow_depth(sc, u, view, proj, 256)
        uu = dict(u)
        uu.update(shadow_map=smap, shadow_view=view, shadow_proj=proj)
        pts = jnp.asarray(np.float32([
            [0.0, -1.0, -4.0],     # straight below: occluded by the cube
            [1.8, -1.0, -4.0],     # inside the cone, beside the occluder
        ]))
        return shadows.shadow_factor(pts, uu, xp=jnp)

    f = np.asarray(factors(sc, u))
    assert f[0] == 0.0, f"occluded point reads lit: {f}"
    assert f[1] == 1.0, f"open point reads shadowed: {f}"


@pytest.mark.slow
def test_spot_shadowed_frame():
    """Full frame via render_frame_with_spot_shadow: cone-limited lighting
    with a dark patch behind the occluder, pixel-compared against the
    same shader with an empty shadow map."""
    import functools
    from softwarerenderer_tpu.engine import (render_frame,
                                             render_frame_with_spot_shadow)
    from softwarerenderer_tpu.ops.lighting import lit_scene_vertex_shader
    from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR

    checker = np.asarray(tex_ops.checkerboard(32, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0, -1, 0]),
                                    texture=checker),
             scene_mod.MeshInstance(primitives.cube(0.8),
                                    ml.translation([0, 0.6, -4]),
                                    texture=checker)]
    sc = scene_mod.build_scene_buffers(insts)
    params = RenderParams(width=160, height=120)
    u = default_frame_uniforms(160, 120)
    u["camera_position"] = np.float32([2.5, 2.0, -0.5])
    u["camera_rotation"] = ml.quat_from_yaw_pitch_roll(
        np.float32(0.55), np.float32(-0.35), np.float32(0))
    u["spot_position"] = np.float32([0.0, 3.0, -4.0])
    u["spot_direction"] = np.float32([0.0, -1.0, 0.0])
    u["spot_inner"] = np.float32(np.deg2rad(25))
    u["spot_outer"] = np.float32(np.deg2rad(40))
    u["spot_color"] = np.ones(4, np.float32)
    u["spot_range"] = np.float32(40.0)

    shaded = np.asarray(jax.jit(functools.partial(
        render_frame_with_spot_shadow, params=params,
        shadow_size=256))(sc, u)[0])

    view, proj = shadows.spot_light_camera(
        u["spot_position"], u["spot_direction"], u["spot_outer"], xp=np)
    ulit = dict(u)
    ulit.update(shadow_map=np.full((256, 256), DEPTH_CLEAR, np.float32),
                shadow_view=np.asarray(view, np.float32),
                shadow_proj=np.asarray(proj, np.float32))
    plain = np.asarray(jax.jit(functools.partial(
        render_frame, params=params, vertex_shader=lit_scene_vertex_shader,
        fragment_shader=shadows.spot_shadowed_fragment_shader))(
            sc, ulit)[0])

    darker = (shaded[..., :3].sum(-1) < plain[..., :3].sum(-1) - 0.05)
    assert 20 < darker.sum() < 0.25 * darker.size, int(darker.sum())


def test_animated_geometry_casts_posed_shadows():
    """Regression: the shadow depth pass runs the same vertex-update
    chain as the main frame — a skinned arm's SHADOW moves with the
    anim_time clock (it used to cast its rest pose forever)."""
    from tests.test_skinning import arm_mesh, two_bone_skin

    arm = arm_mesh()
    insts = [scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0, -1, 0])),
             scene_mod.MeshInstance(arm,
                                    ml.translation([0.0, 0.5, -4.0]),
                                    skin=two_bone_skin(arm["position"]))]
    scene = scene_mod.build_scene_buffers(insts)
    params = RenderParams(width=128, height=96, cull_mode=0)
    u = default_frame_uniforms(params.width, params.height)
    u["camera_position"] = np.float32([0.0, 2.0, 1.0])
    u["light_direction"] = np.float32([0.0, -1.0, 0.0])

    frame = jax.jit(functools.partial(render_frame_with_shadows,
                                      params=params, shadow_size=128))

    def shadow_px(t):
        uu = dict(u)
        uu["anim_time"] = np.float32(t)
        c, _d = map(np.asarray, frame(scene, uu))
        # shadowed floor pixels are darker than their lit neighbors;
        # count "dark" pixels as a pose signature
        lum = c[..., :3].mean(-1)
        return lum < 0.55 * float(np.median(lum))

    s0, s1 = shadow_px(0.0), shadow_px(1.0)   # 0° vs 90° child bone
    assert s0.sum() > 10, "no shadow at rest pose"
    assert np.any(s0 != s1), "shadow did not move with the skin pose"
