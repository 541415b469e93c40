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
