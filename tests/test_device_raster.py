"""Golden-image parity: jitted device pipeline vs the NumPy reference.

The CPU golden (ref_cpu.rasterizer) is the trusted oracle for the exact
reference semantics (SURVEY.md §4b); every case renders the same scene both
ways and compares color + depth pixelwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softwarerenderer_tpu import (
    BlendMode,
    CullMode,
    DepthTest,
    RenderParams,
)
from softwarerenderer_tpu.models import primitives
from softwarerenderer_tpu import shaders
from softwarerenderer_tpu.ops import geometry, raster, texture as tex_ops
from softwarerenderer_tpu.ref_cpu import rasterizer as ref
from softwarerenderer_tpu.utils import mathlib as ml

W, H = 96, 80
CLEAR = np.asarray([0.2, 0.3, 0.4, 1.0], dtype=np.float32)


def base_uniforms(model=None, eye=(0.0, 0.0, 3.0)):
    ld = np.asarray([0.5, -1.0, -0.3], np.float32)
    return {
        "model": (np.eye(4, dtype=np.float32) if model is None
                  else model.astype(np.float32)),
        "view": ml.look_at(np.asarray(eye, np.float32), [0, 0, 0], [0, 1, 0]),
        "projection": ml.perspective_fov(np.deg2rad(60.0), W / H, 0.1, 100.0),
        "light_direction": ld / np.linalg.norm(ld),
        "light_color": np.ones(4, np.float32),
        "fog_color": CLEAR.copy(),
        "fog_start": np.float32(10.0),
        "fog_end": np.float32(50.0),
        "near_clip": np.float32(0.1),
    }


def render_ref(mesh, uniforms, frag, vert=shaders.default_vertex_shader,
               params=RenderParams(width=W, height=H), clear_depth=None):
    fb = ref.Framebuffer(params.width, params.height)
    fb.clear_color(CLEAR)
    if clear_depth is not None:
        fb.clear_depth(clear_depth)
    vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                    mesh["normal"], mesh["color"])
    ref.render_mesh(fb, vin, mesh["indices"], uniforms, vert, frag,
                    cull_mode=params.cull_mode, depth_test=params.depth_test,
                    blend_mode=params.blend_mode,
                    near_clip=float(uniforms["near_clip"]))
    return fb.color, fb.depth


def render_dev(mesh, uniforms, frag, vert=shaders.default_vertex_shader,
               params=RenderParams(width=W, height=H), clear_depth=None):
    vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                    mesh["normal"], mesh["color"])
    depth0 = ref.DEPTH_CLEAR if clear_depth is None else clear_depth

    def frame(vin, idx, u):
        tris = geometry.build_triangles(
            vert, vin, idx, u, width=params.width, height=params.height,
            cull_mode=params.cull_mode)
        c0 = jnp.broadcast_to(jnp.asarray(CLEAR),
                              (params.height, params.width, 4))
        d0 = jnp.full((params.height, params.width), jnp.float32(depth0))
        return raster.render_deferred(tris, frag, u, params, c0, d0, chunk=32)

    color, depth = jax.jit(frame)(vin, mesh["indices"], uniforms)
    return np.asarray(color), np.asarray(depth)


def assert_parity(mesh, uniforms, frag, atol=5e-6, outlier_frac=0.0, **kw):
    """Pixel parity with an optional allowance for decision-boundary pixels:
    where two triangles are near-coplanar, CPU-vs-XLA float reassociation
    can flip the depth tie and legitimately pick a different winner."""
    rc, rd = render_ref(mesh, uniforms, frag, **kw)
    dc, dd = render_dev(mesh, uniforms, frag, **kw)
    cbad = np.abs(dc - rc).max(axis=-1) > atol
    covered = rd > np.finfo(np.float32).min
    dcovered = dd > np.finfo(np.float32).min
    dbad = (covered != dcovered)
    dbad |= covered & dcovered & (np.abs(dd - rd) > 1e-5)
    n_px = rd.size
    assert cbad.mean() <= outlier_frac, (
        f"{cbad.sum()}/{n_px} color mismatches (max "
        f"{np.abs(dc - rc).max():.2e})")
    assert dbad.mean() <= outlier_frac, f"{dbad.sum()}/{n_px} depth mismatches"


def test_flat_soup_parity():
    mesh = primitives.random_triangle_soup(50, seed=1)
    assert_parity(mesh, base_uniforms(), shaders.flat_color_fragment_shader,
                  outlier_frac=0.005)


def test_lit_cube_parity():
    rot = ml.matrix_from_yaw_pitch_roll(0.6, 0.4, 0.0)
    assert_parity(primitives.cube(1.2), base_uniforms(rot),
                  shaders.default_fragment_shader)


def test_near_clip_parity():
    mesh = primitives.random_triangle_soup(40, seed=3, z_range=(-4.0, 1.0))
    assert_parity(mesh, base_uniforms(), shaders.flat_color_fragment_shader, outlier_frac=0.005)


def test_textured_cube_parity():
    tex = tex_ops.checkerboard(32, 4)
    u = base_uniforms(ml.matrix_from_yaw_pitch_roll(0.3, -0.5, 0.1))
    u["texture"] = {"data": np.asarray(tex["data"])}
    assert_parity(primitives.cube(1.5), u, shaders.default_fragment_shader)


def test_sphere_parity():
    assert_parity(primitives.uv_sphere(1.0, rings=8, sectors=12),
                  base_uniforms(), shaders.default_fragment_shader)


@pytest.mark.parametrize("depth_test", [
    DepthTest.LESS, DepthTest.LESS_EQUAL, DepthTest.ALWAYS,
    DepthTest.DISABLED])
def test_depth_modes_parity(depth_test):
    mesh = primitives.random_triangle_soup(30, seed=7)
    params = RenderParams(width=W, height=H, depth_test=depth_test)
    assert_parity(mesh, base_uniforms(), shaders.flat_color_fragment_shader,
                  params=params, outlier_frac=0.005)


def test_greater_equal_with_max_clear_parity():
    # GREATER_* rows need a MaxValue-cleared buffer to draw anything
    # (ref_cpu.Framebuffer.clear_depth docstring).
    mesh = primitives.random_triangle_soup(30, seed=9)
    params = RenderParams(width=W, height=H,
                          depth_test=DepthTest.GREATER_EQUAL)
    assert_parity(mesh, base_uniforms(), shaders.flat_color_fragment_shader,
                  params=params, clear_depth=np.finfo(np.float32).max,
                  outlier_frac=0.005)


@pytest.mark.parametrize("cull", [CullMode.NONE, CullMode.BACK,
                                  CullMode.FRONT])
def test_cull_modes_parity(cull):
    params = RenderParams(width=W, height=H, cull_mode=cull)
    assert_parity(primitives.cube(1.2),
                  base_uniforms(ml.matrix_from_yaw_pitch_roll(0.4, 0.2, 0.0)),
                  shaders.flat_color_fragment_shader, params=params)


def test_two_pass_depth_interaction():
    """Second render pass (the 'gun after map' pattern, Renderer.cs:414-416)
    must depth-test against the first pass's buffer on both paths."""
    far = primitives.random_triangle_soup(20, seed=11, z_range=(-8.0, -6.0))
    near = primitives.random_triangle_soup(20, seed=12, z_range=(-5.0, -2.0))
    u = base_uniforms()
    params = RenderParams(width=W, height=H)

    fb = ref.Framebuffer(W, H)
    fb.clear_color(CLEAR)
    for mesh in (far, near):
        vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                        mesh["normal"], mesh["color"])
        ref.render_mesh(fb, vin, mesh["indices"], u,
                        shaders.default_vertex_shader,
                        shaders.flat_color_fragment_shader)

    def frame(vins, idxs, u):
        c = jnp.broadcast_to(jnp.asarray(CLEAR), (H, W, 4))
        d = jnp.full((H, W), raster.DEPTH_CLEAR, jnp.float32)
        for vin, idx in zip(vins, idxs):
            tris = geometry.build_triangles(
                shaders.default_vertex_shader, vin, idx, u, width=W, height=H)
            c, d = raster.render_deferred(
                tris, shaders.flat_color_fragment_shader, u, params, c, d,
                chunk=32)
        return c, d

    vins = tuple(shaders.make_vertex_input(m["position"], m["uv"],
                                           m["normal"], m["color"])
                 for m in (far, near))
    idxs = tuple(m["indices"] for m in (far, near))
    dc, dd = jax.jit(frame)(vins, idxs, u)
    np.testing.assert_allclose(np.asarray(dc), fb.color, atol=5e-6, rtol=0)
    covered = fb.depth > np.finfo(np.float32).min
    np.testing.assert_allclose(np.asarray(dd)[covered], fb.depth[covered],
                               atol=1e-5, rtol=0)


def test_tri_mask_culls_triangles():
    mesh = primitives.random_triangle_soup(10, seed=5)
    u = base_uniforms()
    params = RenderParams(width=W, height=H)
    mask = np.zeros(10, dtype=bool)
    vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                    mesh["normal"], mesh["color"])

    def frame(vin, idx, u):
        tris = geometry.build_triangles(
            shaders.default_vertex_shader, vin, idx, u, width=W, height=H,
            tri_mask=mask)
        c0 = jnp.broadcast_to(jnp.asarray(CLEAR), (H, W, 4))
        d0 = jnp.full((H, W), raster.DEPTH_CLEAR, jnp.float32)
        return raster.render_deferred(
            tris, shaders.flat_color_fragment_shader, u, params, c0, d0,
            chunk=32)

    color, depth = jax.jit(frame)(vin, mesh["indices"], u)
    np.testing.assert_allclose(np.asarray(color),
                               np.broadcast_to(CLEAR, (H, W, 4)), atol=0)
    assert (np.asarray(depth) == ref.DEPTH_CLEAR).all()
