"""Behavioral tests for the golden CPU reference rasterizer (the oracle).

These pin down the reference semantics (SURVEY.md §6) with hand-computed
cases: depth conventions, culling, clipping, blending, discard, texturing.
"""

import numpy as np
import pytest

from softwarerenderer_tpu import shaders
from softwarerenderer_tpu.config import BlendMode, CullMode, DebugMode, DepthTest
from softwarerenderer_tpu.models import primitives
from softwarerenderer_tpu.ops import texture as tex_ops
from softwarerenderer_tpu.ref_cpu import rasterizer as ref
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32
W, H = 64, 48


def make_uniforms(model=None, eye=(0, 0, 2.5), fov=60.0, texture=None):
    view = ml.look_at(np.asarray(eye, dtype=F32), [0, 0, 0], [0, 1, 0])
    proj = ml.perspective_fov(np.deg2rad(fov), W / H, 0.1, 100.0)
    return dict(
        model=np.eye(4, dtype=F32) if model is None else model,
        view=view, projection=proj,
        light_direction=ml.euler_degrees_to_direction([-45, -45, 0]),
        light_color=np.ones(4, dtype=F32),
        fog_start=F32(1.0), fog_end=F32(25.0),
        fog_color=np.array([1, 0.62, 0.5, 1], dtype=F32),
        texture=texture,
    )


def single_triangle(z=-2.0, offset=(0.0, 0.0), scale=1.0, color=(1, 0, 0, 1)):
    ox, oy = offset
    pos = np.array([[ox - scale, oy - scale, z],
                    [ox + scale, oy - scale, z],
                    [ox, oy + scale, z]], dtype=F32)
    colors = np.tile(np.asarray(color, dtype=F32), (3, 1))
    return {
        "position": pos,
        "uv": np.array([[0, 0], [1, 0], [0.5, 1]], dtype=F32),
        "normal": np.tile(np.array([[0, 0, 1]], dtype=F32), (3, 1)),
        "color": colors,
        "indices": np.array([[0, 1, 2]], dtype=np.int32),
    }


def render(meshes, depth_test=DepthTest.LESS_EQUAL, blend=BlendMode.ALPHA,
           cull=CullMode.NONE, frag=shaders.flat_color_fragment_shader,
           uniforms=None, debug=DebugMode.NONE, clear=(0, 0, 0, 1)):
    fb = ref.Framebuffer(W, H)
    fb.clear_color(clear)
    fb.clear_depth()
    u = uniforms or make_uniforms()
    for mesh in meshes:
        vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                        mesh["normal"], mesh["color"])
        ref.render_mesh(fb, vin, mesh["indices"], u,
                        shaders.default_vertex_shader, frag,
                        cull_mode=cull, depth_test=depth_test,
                        blend_mode=blend, debug_mode=debug)
    return fb


def test_triangle_covers_center():
    fb = render([single_triangle()])
    assert np.allclose(fb.color[H // 2, W // 2], [1, 0, 0, 1])
    assert (fb.depth != ref.DEPTH_CLEAR).sum() > 100


def test_stored_depth_is_negated_and_nearer_is_larger():
    # near triangle then far triangle: stored depths in (-1,-0.5); nearer
    # (z=-1.5) must store a LARGER value than farther (z=-5)
    fb_near = render([single_triangle(z=-1.5)])
    fb_far = render([single_triangle(z=-5.0)])
    c = (H // 2, W // 2)
    dn, df = fb_near.depth[c], fb_far.depth[c]
    assert -1.0 < dn < -0.5 and -1.0 < df < -0.5
    assert dn > df


def test_depth_occlusion_nearest_wins_both_orders():
    near = single_triangle(z=-1.5, color=(0, 1, 0, 1))
    far = single_triangle(z=-5.0, color=(1, 0, 0, 1))
    for order in ([near, far], [far, near]):
        fb = render(order)
        assert np.allclose(fb.color[H // 2, W // 2], [0, 1, 0, 1]), \
            "nearest triangle must win regardless of submission order"


def test_backface_culling():
    tri = single_triangle()
    rev = dict(tri)
    rev["indices"] = tri["indices"][:, ::-1].copy()
    fb_front = render([tri], cull=CullMode.BACK)
    fb_back = render([rev], cull=CullMode.BACK)
    assert (fb_front.depth != ref.DEPTH_CLEAR).any()
    assert not (fb_back.depth != ref.DEPTH_CLEAR).any()
    # FRONT culling inverts the selection
    fb_front2 = render([tri], cull=CullMode.FRONT)
    assert not (fb_front2.depth != ref.DEPTH_CLEAR).any()


def test_near_clip_triggered_only_by_w_nonpositive():
    # Triangle crossing the camera plane (one vertex behind the eye): w<=0
    # for that vertex -> clipped, rest still renders.
    tri = single_triangle(z=-2.0)
    tri["position"][2] = [0.0, 0.0, 3.5]  # behind the eye at z=+2.5
    fb = render([tri])
    assert (fb.depth != ref.DEPTH_CLEAR).any()
    # all vertices behind -> dropped entirely
    tri_all = single_triangle(z=5.0)
    fb2 = render([tri_all])
    assert not (fb2.depth != ref.DEPTH_CLEAR).any()


def test_blend_modes():
    base = single_triangle(color=(0.5, 0.25, 1.0, 0.5))
    # ALPHA over black clear: src*a + dst*(1-a) = (0.25,0.125,0.5, .25+.5*.5)
    fb = render([base], blend=BlendMode.ALPHA)
    c = fb.color[H // 2, W // 2]
    assert np.allclose(c, [0.25, 0.125, 0.5, 0.75], atol=1e-5)
    # ADDITIVE clamps at 1
    fb = render([base], blend=BlendMode.ADDITIVE, clear=(0.9, 0.9, 0.9, 1))
    assert np.allclose(fb.color[H // 2, W // 2], [1.0, 1.0, 1.0, 1.0])
    # MULTIPLY
    fb = render([base], blend=BlendMode.MULTIPLY, clear=(0.5, 0.5, 0.5, 1))
    assert np.allclose(fb.color[H // 2, W // 2],
                       [0.25, 0.125, 0.5, 0.5], atol=1e-5)
    # NONE overwrites
    fb = render([base], blend=BlendMode.NONE, clear=(0.9, 0.9, 0.9, 1))
    assert np.allclose(fb.color[H // 2, W // 2], [0.5, 0.25, 1.0, 0.5])


def test_fragment_discard_alpha_zero_writes_nothing():
    tri = single_triangle(color=(1, 0, 0, 0.0))  # alpha 0 -> discard
    fb = render([tri])
    assert not (fb.depth != ref.DEPTH_CLEAR).any()
    assert np.allclose(fb.color, np.broadcast_to(
        np.array([0, 0, 0, 1], dtype=F32), fb.color.shape))


def test_depth_written_only_when_color_written():
    # discarded fragments must not update depth: draw transparent tri first,
    # then a farther opaque one — opaque must still render.
    transparent = single_triangle(z=-1.5, color=(1, 1, 1, 0.0))
    opaque = single_triangle(z=-5.0, color=(0, 0, 1, 1))
    fb = render([transparent, opaque])
    assert np.allclose(fb.color[H // 2, W // 2], [0, 0, 1, 1])


def test_depth_test_disabled_no_depth_write():
    tri = single_triangle()
    fb = render([tri], depth_test=DepthTest.DISABLED)
    assert np.allclose(fb.color[H // 2, W // 2], [1, 0, 0, 1])
    assert (fb.depth == ref.DEPTH_CLEAR).all()


def test_shared_edge_double_shading_additive():
    # No fill rule: two triangles sharing an edge both shade pixels exactly
    # on it (SURVEY.md §6 note 5).  Detect via additive blending.
    quad = {
        "position": np.array([[-1, -1, -2], [1, -1, -2], [1, 1, -2],
                              [-1, 1, -2]], dtype=F32),
        "uv": np.zeros((4, 2), dtype=F32),
        "normal": np.tile(np.array([[0, 0, 1]], dtype=F32), (4, 1)),
        "color": np.full((4, 4), 0.4, dtype=F32),
        "indices": np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32),
    }
    fb = render([quad], blend=BlendMode.ADDITIVE, clear=(0, 0, 0, 0))
    vals = np.unique(np.round(fb.color[..., 0], 3))
    assert 0.8 in vals, f"expected double-shaded diagonal pixels, got {vals}"


def test_texture_sampling_nearest_repeat():
    tex = tex_ops.checkerboard(size=8, cells=2)
    uv = np.array([[0.1, 0.1], [0.6, 0.1], [1.1, 1.1], [-0.4, -0.4]],
                  dtype=F32)
    c = tex_ops.sample_nearest(tex, uv)
    assert np.allclose(c[0], [1, 1, 1, 1])      # cell (0,0) white
    assert np.allclose(c[1], [0.2, 0.2, 0.2, 1])  # cell (1,0) dark
    assert np.allclose(c[2], c[0])              # repeat wrap
    assert np.allclose(c[3], tex_ops.sample_nearest(
        tex, np.array([[0.6, 0.6]], dtype=F32))[0])  # negative wrap


def test_textured_triangle():
    tex = tex_ops.checkerboard(size=8, cells=2)
    tri = single_triangle()
    u = make_uniforms(texture=tex)
    fb = render([tri], frag=shaders.textured_fragment_shader, uniforms=u)
    covered = fb.depth != ref.DEPTH_CLEAR
    cols = fb.color[covered][:, 0]
    assert (np.isclose(cols, 1.0)).any() and (np.isclose(cols, 0.2)).any()


def test_wireframe_mode():
    tri = single_triangle()
    fb = render([tri], debug=DebugMode.WIREFRAME)
    covered = (fb.color[..., 0] > 0.5).sum()
    fb_solid = render([tri])
    solid = (fb_solid.color[..., 0] > 0.5).sum()
    assert 0 < covered < solid, "wireframe must cover edge pixels only"


def test_default_shader_lighting_and_fog():
    cube = primitives.cube(1.0)
    model = ml.matrix_from_yaw_pitch_roll(F32(0.6), F32(0.4), F32(0.0))
    u = make_uniforms(model=model)
    vin = shaders.make_vertex_input(cube["position"], cube["uv"],
                                    cube["normal"], cube["color"])
    fb = ref.Framebuffer(W, H)
    fb.clear_color([0.9137, 0.7098, 0.6588, 1.0])
    fb.clear_depth()
    ref.render_mesh(fb, vin, cube["indices"], u,
                    shaders.default_vertex_shader,
                    shaders.default_fragment_shader,
                    cull_mode=CullMode.BACK)
    covered = fb.depth != ref.DEPTH_CLEAR
    assert covered.sum() > 200
    # lit faces should differ in brightness (N.L term)
    lum = fb.color[covered][:, :3].mean(-1)
    assert lum.std() > 0.01


def test_equal_depth_test_epsilon():
    a = np.array([-0.75], dtype=F32)
    assert ref.depth_test_passes(DepthTest.EQUAL, a, a + F32(1e-8)).all()
    assert not ref.depth_test_passes(DepthTest.EQUAL, a, a + F32(1e-3)).any()
    assert ref.depth_test_passes(DepthTest.NOT_EQUAL, a, a + F32(1e-3)).all()


def test_bounding_sphere():
    from softwarerenderer_tpu.models.scene import bounding_sphere
    pts = np.array([[1, 0, 0], [-1, 0, 0], [0, 0.5, 0]], dtype=F32)
    center, radius = bounding_sphere(pts)
    d = np.linalg.norm(pts - center, axis=-1)
    assert (d <= radius + 1e-5).all()
    assert radius < 1.5
