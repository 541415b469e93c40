"""Debug visualizations (ops/debugviz.py): overdraw counts, depth view,
engine dispatch for the OVERDRAW/DEPTH modes."""

import jax
import jax.numpy as jnp
import numpy as np

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.config import CullMode, DebugMode
from softwarerenderer_tpu.engine import (
    Engine,
    default_frame_uniforms,
    scene_vertex_shader,
)
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.ops import debugviz, geometry
from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR
from softwarerenderer_tpu.utils import mathlib as ml

W, H = 64, 48


def _tri_soup(tris_xyz, width=W, height=H):
    """Build the geometry SoA for a list of CCW triangles given directly
    in clip space (w=1): the minimal path into the raster stage."""
    t = np.asarray(tris_xyz, np.float32)        # (T, 3, 3)
    T = t.shape[0]
    vin = {
        "position": t.reshape(-1, 3),
        "uv": np.zeros((T * 3, 2), np.float32),
        "normal": np.tile(np.asarray([0, 0, 1], np.float32), (T * 3, 1)),
        "color": np.ones((T * 3, 4), np.float32),
    }

    def vs(v, u, xp):
        pos = xp.asarray(v["position"], xp.float32)
        clip = xp.concatenate(
            [pos, xp.ones(pos.shape[:-1] + (1,), xp.float32)], axis=-1)
        return {"clip_position": clip, "color": v["color"],
                "uv": v["uv"], "normal": v["normal"]}

    idx = np.arange(T * 3, dtype=np.int32).reshape(T, 3)
    return geometry.build_triangles(
        vs, vin, idx, {"near_clip": np.float32(0.01)},
        width=width, height=height, cull_mode=CullMode.NONE)


def test_overdraw_counts_exact():
    # Two big triangles covering the left half twice; right half empty.
    half = [
        [[-1.0, -1.0, 0.0], [0.0, -1.0, 0.0], [-1.0, 1.0, 0.0]],
        [[-1.0, -1.0, 0.2], [0.0, -1.0, 0.2], [-1.0, 1.0, 0.2]],
    ]
    tris = _tri_soup(half)
    params = RenderParams(width=W, height=H, cull_mode=CullMode.NONE)
    count = np.asarray(jax.jit(
        lambda t: debugviz.overdraw_count(t, params))(tris))
    assert count.shape == (H, W)
    assert count.max() == 2                      # both triangles stack
    assert (count[:, W * 3 // 4:] == 0).all()    # right quarter empty
    assert (count == 2).sum() > 50


def test_overdraw_ramp_monotone():
    c = jnp.asarray([[0, 1, 4, 8, 16]], jnp.int32)
    rgb = np.asarray(debugviz.overdraw_to_color(c, saturate=8))[0]
    assert (rgb[0, :3] == 0).all()               # zero = black
    assert rgb[1, 2] > rgb[3, 2]                 # blue fades with load
    assert rgb[3, 0] > rgb[1, 0]                 # red grows with load
    assert (rgb[3] == rgb[4]).all()              # saturates


def test_depth_view_nearer_is_brighter():
    depth = np.full((4, 4), DEPTH_CLEAR, np.float32)
    depth[1, 1] = 0.2      # farther (reversed convention: smaller = far)
    depth[2, 2] = 0.9      # nearer
    img = np.asarray(debugviz.depth_view(jnp.asarray(depth)))
    assert img[2, 2, 0] > img[1, 1, 0]
    assert img[0, 0, 0] == 0.0                   # uncovered black


def test_engine_overdraw_and_depth_modes():
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(primitives.cube(1.0),
                                ml.translation([0.0, 0.0, -3.0]))])
    base = RenderParams(width=W, height=H)
    eng_od = Engine(sc, base.replace(debug_mode=DebugMode.OVERDRAW),
                    chunk=32)
    color, counts = eng_od.render(eng_od.uniforms)
    counts = np.asarray(counts)
    assert counts.max() >= 1                     # cube on screen
    assert counts.min() == 0                     # background uncovered
    color = np.asarray(color)
    assert (color[counts == 0][:, :3] == 0).all()

    eng_dp = Engine(sc, base.replace(debug_mode=DebugMode.DEPTH),
                    chunk=32)
    dcolor, ddepth = eng_dp.render(eng_dp.uniforms)
    dcolor, ddepth = np.asarray(dcolor), np.asarray(ddepth)
    covered = ddepth != DEPTH_CLEAR
    assert covered.any() and not covered.all()
    assert (dcolor[~covered][:, 0] == 0).all()
    assert dcolor[covered][:, 0].max() > 0.5

    # The DEPTH view's buffer equals the production frame's depth plane.
    eng = Engine(sc, base, chunk=32)
    _, depth_ref = eng.render(eng.uniforms)
    np.testing.assert_array_equal(ddepth, np.asarray(depth_ref))
