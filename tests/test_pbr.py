"""PBR-lite material shading (ops/lighting.pbr_scene_fragment_shader):
metallic / roughness / emissive are imported by the reference but never
shaded with (Material.cs:14-22; SURVEY.md §2) — here they drive a
metalness Blinn-Phong model."""

import functools

import numpy as np

import jax

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.engine import default_frame_uniforms, render_frame
from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR
from softwarerenderer_tpu.ops.lighting import (lit_scene_vertex_shader,
                                               pbr_scene_fragment_shader)
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32
W, H = 160, 120


def _render(material):
    insts = [scene_mod.MeshInstance(
        primitives.uv_sphere(1.0, rings=24, sectors=48),
        ml.translation([0, 0, -3.0]), material=material)]
    sc = scene_mod.build_scene_buffers(insts)
    u = default_frame_uniforms(W, H)
    ld = np.float32([0.3, -0.5, -1.0])
    u["light_direction"] = ld / np.linalg.norm(ld)
    u["fog_start"], u["fog_end"] = np.float32(900.0), np.float32(1000.0)
    params = RenderParams(width=W, height=H, use_pallas=False)
    c, d = jax.jit(functools.partial(
        render_frame, params=params,
        vertex_shader=lit_scene_vertex_shader,
        fragment_shader=pbr_scene_fragment_shader))(sc, u)
    return np.asarray(c), np.asarray(d)


def test_material_props_reach_the_scene_buffers():
    m = scene_mod.Material(base_color=(1, 0, 0, 1), metallic=0.7,
                           roughness=0.3, emissive=(0.1, 0.2, 0.3))
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(primitives.cube(1.0), material=m)])
    np.testing.assert_allclose(sc["mesh_metallic"], [0.7])
    np.testing.assert_allclose(sc["mesh_roughness"], [0.3])
    np.testing.assert_allclose(sc["mesh_emissive"][0], [0.1, 0.2, 0.3])


def test_metallic_sphere_has_specular_highlight():
    shiny = scene_mod.Material(base_color=(0.6, 0.6, 0.6, 1.0),
                               metallic=1.0, roughness=0.15)
    c_diff, d = _render(scene_mod.Material(
        base_color=(0.6, 0.6, 0.6, 1.0), metallic=0.0, roughness=1.0))
    c_spec, _ = _render(shiny)
    covered = d != float(DEPTH_CLEAR)
    # the glossy metal shows a hotspot far brighter than any pixel of the
    # rough dielectric
    assert c_spec[..., :3].max() > c_diff[covered][..., :3].max() + 0.2
    # away from the hotspot, the metal (no diffuse lobe) is darker
    assert np.median(c_spec[covered][..., 0]) \
        < np.median(c_diff[covered][..., 0])


def test_emissive_glows_with_no_light():
    dark = scene_mod.Material(base_color=(1, 1, 1, 1))
    glow = scene_mod.Material(base_color=(1, 1, 1, 1),
                              emissive=(0.0, 0.9, 0.0))

    def render_unlit(mat):
        insts = [scene_mod.MeshInstance(primitives.cube(1.2),
                                        ml.translation([0, 0, -3.0]),
                                        material=mat)]
        sc = scene_mod.build_scene_buffers(insts)
        u = default_frame_uniforms(W, H)
        u["light_color"] = np.zeros(4, F32)          # lights off
        u["fog_start"], u["fog_end"] = np.float32(900.0), np.float32(1000.0)
        params = RenderParams(width=W, height=H, use_pallas=False)
        c, d = jax.jit(functools.partial(
            render_frame, params=params,
            vertex_shader=lit_scene_vertex_shader,
            fragment_shader=pbr_scene_fragment_shader))(sc, u)
        return np.asarray(c), np.asarray(d)

    c0, d0 = render_unlit(dark)
    c1, _ = render_unlit(glow)
    covered = d0 != float(DEPTH_CLEAR)
    assert c0[covered][..., 1].max() < 0.05          # pitch dark
    assert np.median(c1[covered][..., 1]) > 0.8      # green glow


def test_metal_reflects_sky_panorama():
    """With a sky panorama, glossy metals mirror the environment: a
    sphere under a red-top/blue-bottom sky shows both hues in its
    reflection; without the panorama it stays dark off-highlight."""
    pano = np.zeros((32, 64, 4), F32)
    pano[:16] = [1, 0, 0, 1]
    pano[16:] = [0, 0, 1, 1]
    shiny = scene_mod.Material(base_color=(1, 1, 1, 1.0),
                               metallic=1.0, roughness=0.05)
    insts = [scene_mod.MeshInstance(
        primitives.uv_sphere(1.0, rings=24, sectors=48),
        ml.translation([0, 0, -3.0]), material=shiny)]
    sc = scene_mod.build_scene_buffers(insts)
    u = default_frame_uniforms(W, H)
    u["light_color"] = np.zeros(4, F32)            # reflections only
    u["fog_start"], u["fog_end"] = np.float32(900.0), np.float32(1000.0)
    params = RenderParams(width=W, height=H, use_pallas=False)
    fn = jax.jit(functools.partial(
        render_frame, params=params,
        vertex_shader=lit_scene_vertex_shader,
        fragment_shader=pbr_scene_fragment_shader))
    c0, d = map(np.asarray, fn(sc, u))
    u2 = dict(u)
    u2["sky_panorama"] = pano
    c1, _ = map(np.asarray, fn(sc, u2))
    covered = d != float(DEPTH_CLEAR)
    assert c0[covered][..., :3].max() < 0.05       # unlit metal: black
    red = c1[..., 0] * covered
    blue = c1[..., 2] * covered
    assert red.max() > 0.5 and blue.max() > 0.5    # both hues mirrored
    # upper hemisphere reflects the red sky top
    ys, xs = np.nonzero(red > 0.5)
    assert ys.mean() < np.nonzero(covered)[0].mean()


def test_irradiance_ambient_lights_diffuse():
    """sky.irradiance_panorama + env_irradiance: a dielectric sphere
    under a red-top sky picks up red ambient on upward-facing surfaces
    even with the direct light off; the irradiance map itself is a
    normalized cosine average (uniform sky → uniform irradiance)."""
    from softwarerenderer_tpu.ops.sky import irradiance_panorama

    uni = np.full((16, 32, 4), 0.5, np.float32)
    irr = irradiance_panorama(uni)
    np.testing.assert_allclose(irr[..., :3], 0.5, atol=1e-3)

    pano = np.zeros((32, 64, 4), F32)
    pano[:16] = [1, 0, 0, 1]               # red upper hemisphere
    irr = irradiance_panorama(pano)
    # straight-up direction: almost all cosine weight in the red half
    assert irr[0, 16, 0] > 0.75 and irr[0, 16, 2] < 0.1
    # straight-down: red contributes ~nothing
    assert irr[-1, 16, 0] < 0.25

    mat = scene_mod.Material(base_color=(1, 1, 1, 1.0), metallic=0.0,
                             roughness=1.0)
    insts = [scene_mod.MeshInstance(
        primitives.uv_sphere(1.0, rings=24, sectors=48),
        ml.translation([0, 0, -3.0]), material=mat)]
    sc = scene_mod.build_scene_buffers(insts)
    u = default_frame_uniforms(W, H)
    u["light_color"] = np.zeros(4, F32)
    u["fog_start"], u["fog_end"] = np.float32(900.0), np.float32(1000.0)
    u["env_irradiance"] = irr
    params = RenderParams(width=W, height=H, use_pallas=False)
    c, d = map(np.asarray, jax.jit(functools.partial(
        render_frame, params=params,
        vertex_shader=lit_scene_vertex_shader,
        fragment_shader=pbr_scene_fragment_shader))(sc, u))
    covered = d != float(DEPTH_CLEAR)
    ys, xs = np.nonzero(covered)
    top = ys < np.median(ys)
    r_top = c[ys[top], xs[top], 0]
    r_bot = c[ys[~top], xs[~top], 0]
    assert r_top.mean() > r_bot.mean() + 0.1      # lit from above, red
    assert c[covered][..., 2].max() < 0.15        # no blue anywhere
