"""Device text overlay (ops/text.py + utils/font.py): atlas, packing,
bit-exact masking, jit/no-recompile, and post-FX integration."""

import jax
import jax.numpy as jnp
import numpy as np

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import Engine
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.ops import text as text_ops
from softwarerenderer_tpu.utils import font as font_mod
from softwarerenderer_tpu.utils import mathlib as ml

FONT = font_mod.build_font(cell_h=12)
GH, GW = FONT["cell_h"], FONT["cell_w"]


def test_font_atlas_shape_and_contents():
    bm = FONT["bitmaps"]
    assert bm.shape == (96, GH, GW)
    assert bm.dtype == np.float32
    assert bm.min() >= 0.0 and bm.max() <= 1.0
    assert bm[0].sum() == 0.0                      # space is blank
    assert bm[ord("A") - 32].sum() > 0.0           # visible glyph
    assert bm[95].sum() > 0.0                      # replacement box


def test_encode_glyphs_mapping():
    ids = text_ops.encode_glyphs("A \t\x01" + chr(200), max_chars=8)
    assert ids[0] == ord("A") - 32
    assert ids[1] == 0                             # space
    assert ids[2] == 0 and ids[3] == 0             # control chars → space
    assert ids[4] == 95                            # out of range → box
    assert list(ids[5:]) == [0, 0, 0]              # padding


def test_pack_text_shapes_and_defaults():
    p = text_ops.pack_text([("hi", (3, 4)),
                            ("red", (1, 2), (1.0, 0.0, 0.0))],
                           max_strings=4, max_chars=6)
    assert p["glyphs"].shape == (4, 6)
    assert p["pos"].shape == (4, 2) and tuple(p["pos"][0]) == (3, 4)
    assert p["color"].shape == (4, 4)
    assert tuple(p["color"][0]) == (1.0, 1.0, 1.0, 1.0)   # default white
    assert tuple(p["color"][1]) == (1.0, 0.0, 0.0, 1.0)   # rgb → alpha 1
    assert p["color"][2, 3] == 0.0                        # unused → hidden


def _composite(buf, packed):
    f = jax.jit(lambda c, p: text_ops.composite_text(c, FONT["bitmaps"], p))
    return np.asarray(f(jnp.asarray(buf), packed))


def test_composite_writes_only_covered_pixels():
    H, W = 48, 96
    rng = np.random.default_rng(0)
    buf = rng.uniform(0.1, 0.9, (H, W, 4)).astype(np.float32)
    x, y = 5, 7
    packed = text_ops.pack_text([("AB", (x, y), (1.0, 0.0, 0.0))],
                                max_strings=2, max_chars=4)
    out = _composite(buf, packed)

    sw, sh = 4 * GW, GH
    outside = np.ones((H, W), bool)
    outside[y:y + sh, x:x + sw] = False
    assert (out[outside] == buf[outside]).all()    # bit-exact outside

    ids = packed["glyphs"][0]
    strip = FONT["bitmaps"][ids].transpose(1, 0, 2).reshape(GH, -1)
    cov = strip > 0
    region = out[y:y + sh, x:x + sw]
    base = buf[y:y + sh, x:x + sw]
    assert (region[~cov] == base[~cov]).all()      # uncovered: bit-exact
    assert cov.any()
    # covered pixels moved toward red (channel 0 up or equal, 1/2 down)
    assert (region[cov][:, 0] >= base[cov][:, 0] - 1e-6).all()
    assert (region[cov][:, 1] <= base[cov][:, 1] + 1e-6).all()
    full = strip == 1.0
    if full.any():
        np.testing.assert_allclose(region[full][:, :3],
                                   [[1.0, 0.0, 0.0]] * full.sum(),
                                   atol=1e-6)


def test_hidden_slot_is_bit_exact_noop():
    buf = np.random.default_rng(1).uniform(
        0, 1, (32, 64, 4)).astype(np.float32)
    packed = text_ops.pack_text([], max_strings=3, max_chars=8)
    out = _composite(buf, packed)
    assert (out == buf).all()


def test_offscreen_positions_vanish():
    buf = np.random.default_rng(2).uniform(
        0, 1, (24, 40, 4)).astype(np.float32)
    packed = text_ops.pack_text([("W", (10_000, -50)),
                                 ("W", (-10_000, 5)),
                                 ("W", (5, 10_000))],
                                max_strings=3, max_chars=1)
    out = _composite(buf, packed)            # must not raise / go OOB
    assert (out == buf).all()                # fully off-screen = no-op


def test_partially_offscreen_clips_exactly():
    buf = np.zeros((24, 40, 4), np.float32)
    # Hang half a glyph off the left edge: the visible right half must
    # match the same glyph drawn fully on-screen, shifted.
    packed_edge = text_ops.pack_text([("W", (-(GW // 2), 4))],
                                     max_strings=1, max_chars=1)
    packed_full = text_ops.pack_text([("W", (0, 4))],
                                     max_strings=1, max_chars=1)
    edge = _composite(buf, packed_edge)
    full = _composite(buf, packed_full)
    half = GW - GW // 2
    assert (edge[:, :half] == full[:, GW // 2:GW]).all()
    assert (edge[:, half:] == 0).all()


def test_text_changes_do_not_recompile():
    f = jax.jit(lambda c, p: text_ops.composite_text(
        c, FONT["bitmaps"], p))
    buf = jnp.zeros((32, 64, 4), jnp.float32)
    a = text_ops.pack_text([("one", (2, 2))], max_strings=2, max_chars=8)
    b = text_ops.pack_text([("two!", (9, 11), (0.0, 1.0, 0.0))],
                           max_strings=2, max_chars=8)
    f(buf, a)
    n0 = f._cache_size()
    f(buf, b)
    assert f._cache_size() == n0


def test_text_overlay_fx_in_render_frame():
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(primitives.cube(1.0),
                                ml.translation([0.0, 0.0, -3.0]))])
    fx = text_ops.text_overlay_fx(FONT)
    params = RenderParams(width=64, height=48, post_fx=(fx,))
    eng = Engine(sc, params, chunk=32)
    u = dict(eng.uniforms)
    u["hud_text"] = text_ops.pack_text(
        [("hp 100", (2, 2), (0.0, 1.0, 0.0))], max_strings=2, max_chars=8)
    color, _ = eng.render(u)
    color = np.asarray(color)

    u2 = dict(u)
    u2["hud_text"] = text_ops.pack_text([], max_strings=2, max_chars=8)
    base, _ = eng.render(u2)
    base = np.asarray(base)

    sh, sw = GH, 8 * GW
    assert (color[:sh + 2, :sw + 2] != base[:sh + 2, :sw + 2]).any()
    assert (color[sh + 2:] == base[sh + 2:]).all()
