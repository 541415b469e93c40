"""Forward (sequential, blend-exact) path parity vs the CPU golden."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softwarerenderer_tpu import (
    BlendMode,
    CullMode,
    DebugMode,
    DepthTest,
    RenderParams,
)
from softwarerenderer_tpu.models import primitives
from softwarerenderer_tpu import shaders
from softwarerenderer_tpu.ops import forward, geometry, raster
from softwarerenderer_tpu.ref_cpu import rasterizer as ref
from softwarerenderer_tpu.utils import mathlib as ml

W, H = 96, 80
CLEAR = np.asarray([0.1, 0.1, 0.15, 1.0], dtype=np.float32)


def uniforms():
    return {
        "model": np.eye(4, dtype=np.float32),
        "view": ml.look_at(np.float32([0, 0, 3]), [0, 0, 0], [0, 1, 0]),
        "projection": ml.perspective_fov(np.deg2rad(60.0), W / H, 0.1, 100.0),
        "near_clip": np.float32(0.1),
    }


def run_pair(mesh, params, frag=shaders.flat_color_fragment_shader):
    u = uniforms()
    vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                    mesh["normal"], mesh["color"])
    fb = ref.Framebuffer(W, H)
    fb.clear_color(CLEAR)
    ref.render_mesh(fb, vin, mesh["indices"], u,
                    shaders.default_vertex_shader, frag,
                    cull_mode=params.cull_mode, depth_test=params.depth_test,
                    blend_mode=params.blend_mode,
                    debug_mode=params.debug_mode)

    def frame(vin, idx, u):
        tris = geometry.build_triangles(
            shaders.default_vertex_shader, vin, idx, u,
            width=W, height=H, cull_mode=params.cull_mode)
        c0 = jnp.broadcast_to(jnp.asarray(CLEAR), (H, W, 4))
        d0 = jnp.full((H, W), raster.DEPTH_CLEAR, jnp.float32)
        return forward.render_forward(tris, frag, u, params, c0, d0)

    dc, dd = jax.jit(frame)(vin, mesh["indices"], u)
    return fb, np.asarray(dc), np.asarray(dd)


def translucent_soup(n=25, seed=13):
    mesh = primitives.random_triangle_soup(n, seed=seed)
    mesh["color"] = mesh["color"].copy()
    mesh["color"][:, 3] = 0.5
    return mesh


def test_ordered_alpha_blending_exact():
    """Overlapping translucent triangles — order matters, deferred can't do
    this; forward must match the golden exactly."""
    params = RenderParams(width=W, height=H, cull_mode=CullMode.NONE,
                          blend_mode=BlendMode.ALPHA,
                          depth_test=DepthTest.ALWAYS)
    fb, dc, dd = run_pair(translucent_soup(), params)
    np.testing.assert_allclose(dc, fb.color, atol=2e-5, rtol=0)


@pytest.mark.parametrize("blend", [BlendMode.ADDITIVE, BlendMode.MULTIPLY,
                                   BlendMode.NONE])
def test_blend_modes_exact(blend):
    params = RenderParams(width=W, height=H, cull_mode=CullMode.NONE,
                          blend_mode=blend, depth_test=DepthTest.ALWAYS)
    fb, dc, dd = run_pair(translucent_soup(15, seed=5), params)
    np.testing.assert_allclose(dc, fb.color, atol=2e-5, rtol=0)


def test_depth_equal_mode():
    """EQUAL passes only where a previous write left that exact depth —
    order-dependent: second identical mesh re-blends over the first."""
    mesh = primitives.random_triangle_soup(10, seed=2)
    two = {k: (np.concatenate([v, v]) if k != "indices" else
               np.concatenate([v, v + mesh["position"].shape[0]]))
           for k, v in mesh.items()}
    params = RenderParams(width=W, height=H, cull_mode=CullMode.NONE,
                          blend_mode=BlendMode.ADDITIVE,
                          depth_test=DepthTest.LESS_EQUAL)
    fb, dc, dd = run_pair(two, params)
    bad = (np.abs(dc - fb.color).max(axis=-1) > 2e-5).mean()
    assert bad < 0.005


def test_discard_reveals_farther_triangle():
    """A discarded near fragment must leave the farther triangle visible —
    the deferred path documents this divergence; forward must be exact."""
    pos = np.float32([[-1, -1, -3], [1, -1, -3], [0, 1, -3],
                      [-1, -1, -5], [1, -1, -5], [0, 1, -5]])
    col = np.float32([[1, 0, 0, 0]] * 3 + [[0, 1, 0, 1]] * 3)  # near alpha=0
    mesh = {"position": pos, "uv": np.zeros((6, 2), np.float32),
            "normal": np.tile(np.float32([0, 0, 1]), (6, 1)),
            "color": col,
            "indices": np.int32([[0, 1, 2], [3, 4, 5]])}
    params = RenderParams(width=W, height=H, cull_mode=CullMode.NONE)
    fb, dc, dd = run_pair(mesh, params)
    np.testing.assert_allclose(dc, fb.color, atol=2e-5, rtol=0)
    # and the green far triangle is actually visible at center
    assert dc[H // 2, W // 2, 1] > 0.5


def test_wireframe_parity():
    params = RenderParams(width=W, height=H, cull_mode=CullMode.NONE,
                          debug_mode=DebugMode.WIREFRAME)
    fb, dc, dd = run_pair(primitives.random_triangle_soup(12, seed=9),
                          params)
    bad = (np.abs(dc - fb.color).max(axis=-1) > 2e-5).mean()
    assert bad < 0.01, f"{bad:.4f} wireframe pixel mismatch"
    # wireframe actually drew something
    assert (np.abs(dc - CLEAR).max(axis=-1) > 1e-3).any()


def test_forward_matches_deferred_on_opaque():
    mesh = primitives.random_triangle_soup(20, seed=4)
    params = RenderParams(width=W, height=H, cull_mode=CullMode.NONE)
    fb, dc, dd = run_pair(mesh, params)
    bad = (np.abs(dc - fb.color).max(axis=-1) > 2e-5).mean()
    assert bad < 0.005


def test_wireframe_deferred_matches_forward():
    """The fast deferred wireframe must agree with the exact forward one on
    an opaque scene (modulo boundary ties)."""
    mesh = primitives.random_triangle_soup(12, seed=9)
    params = RenderParams(width=W, height=H, cull_mode=CullMode.NONE,
                          debug_mode=DebugMode.WIREFRAME)
    u = uniforms()
    vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                    mesh["normal"], mesh["color"])

    def both(vin, idx, u):
        tris = geometry.build_triangles(
            shaders.default_vertex_shader, vin, idx, u,
            width=W, height=H, cull_mode=params.cull_mode)
        c0 = jnp.broadcast_to(jnp.asarray(CLEAR), (H, W, 4))
        d0 = jnp.full((H, W), raster.DEPTH_CLEAR, jnp.float32)
        fc, fd = forward.render_forward(
            tris, shaders.flat_color_fragment_shader, u, params, c0, d0)
        dc, dd = raster.render_wireframe_deferred(
            tris, shaders.flat_color_fragment_shader, u, params, c0, d0,
            chunk=16)
        return fc, fd, dc, dd

    fc, fd, dc, dd = map(np.asarray, jax.jit(both)(vin, mesh["indices"], u))
    bad = (np.abs(fc - dc).max(axis=-1) > 1e-5).mean()
    assert bad < 0.01, f"{bad:.4f} wireframe deferred/forward mismatch"
