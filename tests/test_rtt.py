"""Render-to-texture tests (engine/rtt.py).

The reference has no offscreen render targets (its textures come only from
image files, Texture.cs:70-94) — RTT is a beyond-reference capability.
The exactness contract: writing an image into a dynamic atlas slot on
device must be bit-identical to packing the same image statically at
scene-build time (same u8 quantization, same box-filtered mip chain)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import (
    Engine,
    RttPass,
    atlas_id_of,
    default_frame_uniforms,
    render_frame,
    render_frame_rtt,
    rtt_slot,
    write_atlas_texture,
)
from softwarerenderer_tpu.models import primitives, scene as scene_mod


def screen_quad(w=2.0, h=1.5):
    """A unit quad in the z=0 plane (the 'monitor' surface)."""
    return {
        "position": np.asarray([[-w / 2, -h / 2, 0], [w / 2, -h / 2, 0],
                                [w / 2, h / 2, 0], [-w / 2, h / 2, 0]],
                               np.float32),
        "uv": np.asarray([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32),
        "normal": np.tile(np.float32([0, 0, 1]), (4, 1)),
        "color": np.ones((4, 4), np.float32),
        "indices": np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
    }


def exact_grid_image(h, w, seed=0):
    """Values m/256: every 2x2 box mean at every mip level is exact in
    f32 regardless of summation order (numerator stays under 24 bits), so
    device-built and pack-time mips must agree BITWISE."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 257, (h, w, 4)).astype(np.float32) / np.float32(256.0)


def _scenes_with_slot_and_static(img):
    """Two scenes differing only in how `img` reaches the atlas: a dynamic
    placeholder slot vs the image packed statically."""
    h, w = img.shape[:2]
    slot = rtt_slot(h, w)
    quad = screen_quad()
    world = primitives.cube(1.0)
    m_quad = np.eye(4, dtype=np.float32)
    m_quad[3, 2] = -3.0                      # row-vector translation
    m_cube = np.eye(4, dtype=np.float32)
    m_cube[3, 0], m_cube[3, 2] = 5.0, -4.0
    inst_a = [scene_mod.MeshInstance(quad, m_quad, texture=slot),
              scene_mod.MeshInstance(world, m_cube)]
    inst_b = [scene_mod.MeshInstance(quad, m_quad, texture=img),
              scene_mod.MeshInstance(world, m_cube)]
    return (scene_mod.build_scene_buffers(inst_a), atlas_id_of(inst_a, slot),
            scene_mod.build_scene_buffers(inst_b))


def test_dynamic_write_matches_static_pack_bitwise():
    """write_atlas_texture == pack_atlas for the same image: base region
    AND every mip level, u8-bitwise, on both the jnp and np paths."""
    img = exact_grid_image(16, 12)
    sc_a, tid, sc_b = _scenes_with_slot_and_static(img)
    assert sc_a["atlas_data"].shape == sc_b["atlas_data"].shape

    up_j = np.asarray(
        write_atlas_texture(jax.device_put(sc_a), tid, jnp.asarray(img),
                            xp=jnp)["atlas_data"])
    np.testing.assert_array_equal(up_j, sc_b["atlas_data"])

    up_n = write_atlas_texture(sc_a, tid, img, xp=np)["atlas_data"]
    np.testing.assert_array_equal(up_n, sc_b["atlas_data"])

    # and rendering through the mip-sampling shader sees identical texels
    p = RenderParams(width=96, height=64, use_pallas=False, cull_mode=0,
                     use_mipmaps=True)
    u = default_frame_uniforms(96, 64)
    sc_a2 = dict(sc_a)
    sc_a2["atlas_data"] = up_j
    c_a, d_a = map(np.asarray, jax.jit(
        lambda s, u: render_frame(s, u, p))(jax.device_put(sc_a2), u))
    c_b, d_b = map(np.asarray, jax.jit(
        lambda s, u: render_frame(s, u, p))(jax.device_put(sc_b), u))
    np.testing.assert_array_equal(c_a, c_b)
    np.testing.assert_array_equal(d_a, d_b)


def test_render_frame_rtt_multi_pass_exact():
    """A pass rendered into the slot and sampled by the main view equals
    composing the same two renders by hand through a static twin scene."""
    slot = rtt_slot(32, 32)
    quad = screen_quad()
    tri = primitives.cube(1.0)
    m_quad = np.eye(4, dtype=np.float32)
    m_quad[3, 2] = -3.0
    m_tri = np.eye(4, dtype=np.float32)
    m_tri[3, 0], m_tri[3, 2] = 40.0, -44.0   # far away: pass-camera only
    instances = [scene_mod.MeshInstance(quad, m_quad, texture=slot),
                 scene_mod.MeshInstance(tri, m_tri)]
    sc = scene_mod.build_scene_buffers(instances)
    tid = atlas_id_of(instances, slot)

    pp = RenderParams(width=32, height=32, use_pallas=False, cull_mode=0,
                      use_mipmaps=False)
    mp = RenderParams(width=96, height=64, use_pallas=False, cull_mode=0,
                      use_mipmaps=False)
    pu = default_frame_uniforms(32, 32)
    pu["camera_position"] = np.float32([40.0, 0.0, -40.0])
    pu["clear_color"] = np.float32([0.1, 0.2, 0.3, 1.0])
    # hide the monitor from its own feed
    pu["mesh_visible"] = np.asarray([False, True])
    mu = default_frame_uniforms(96, 64)
    mu["clear_color"] = np.zeros(4, np.float32)
    mu["cam"] = pu

    passes = (RttPass(tex_id=tid, params=pp, uniforms_key="cam",
                      update_mips=False),)
    color, depth = map(np.asarray, jax.jit(
        lambda s, u: render_frame_rtt(s, u, mp, passes))(
            jax.device_put(sc), mu))

    # hand-composed: render the pass, write it, render the main view
    feed = np.asarray(jax.jit(lambda s, u: render_frame(s, u, pp))(
        jax.device_put(sc), pu)[0])
    sc2 = write_atlas_texture(sc, tid, feed, update_mips=False, xp=np)
    mu2 = {k: v for k, v in mu.items() if k != "cam"}
    want_c, want_d = map(np.asarray, jax.jit(
        lambda s, u: render_frame(s, u, mp))(jax.device_put(sc2), mu2))
    np.testing.assert_array_equal(color, want_c)
    np.testing.assert_array_equal(depth, want_d)

    # the monitor genuinely shows the feed: changing only the PASS clear
    # color repaints a block of main-view pixels (the lit monitor quad)
    mu_b = dict(mu)
    mu_b["cam"] = dict(pu, clear_color=np.float32([0.9, 0.8, 0.2, 1.0]))
    color_b = np.asarray(jax.jit(
        lambda s, u: render_frame_rtt(s, u, mp, passes))(
            jax.device_put(sc), mu_b)[0])
    changed = np.any(np.abs(color_b - color) > 1e-4, axis=-1)
    assert changed.sum() > 50

    # return_atlas hands back the written atlas for feedback loops
    _c, _d, atlas = jax.jit(
        lambda s, u: render_frame_rtt(s, u, mp, passes, return_atlas=True))(
            jax.device_put(sc), mu)
    np.testing.assert_array_equal(np.asarray(atlas), sc2["atlas_data"])


def test_engine_rtt_passes_tunable_without_rebuild():
    """Engine(rtt_passes=...) auto-fills pass uniforms; moving the pass
    camera changes the monitor without touching the Engine."""
    slot = rtt_slot(16, 16)
    quad = screen_quad()
    cube = primitives.cube(1.0)
    m_quad = np.eye(4, dtype=np.float32)
    m_quad[3, 2] = -3.0
    m_cube = np.eye(4, dtype=np.float32)
    m_cube[3, 0], m_cube[3, 2] = 40.0, -44.0
    instances = [scene_mod.MeshInstance(quad, m_quad, texture=slot),
                 scene_mod.MeshInstance(cube, m_cube)]
    sc = scene_mod.build_scene_buffers(instances)
    tid = atlas_id_of(instances, slot)
    pp = RenderParams(width=16, height=16, use_pallas=False, cull_mode=0)
    mp = RenderParams(width=64, height=48, use_pallas=False, cull_mode=0)

    eng = Engine(sc, mp, rtt_passes=(
        RttPass(tex_id=tid, params=pp, uniforms_key="cctv"),))
    assert "cctv" in eng.uniforms
    eng.uniforms["clear_color"] = np.zeros(4, np.float32)
    eng.uniforms["cctv"]["camera_position"] = np.float32([40, 0, -40])
    c0 = np.asarray(eng.render()[0])
    eng.uniforms["cctv"]["camera_position"] = np.float32([400, 0, -400])
    c1 = np.asarray(eng.render()[0])
    assert np.abs(c1 - c0).max() > 0.05      # the feed changed
    # only monitor pixels changed: depth identical
    d0 = np.asarray(eng.render()[1])
    eng.uniforms["cctv"]["camera_position"] = np.float32([40, 0, -40])
    d1 = np.asarray(eng.render()[1])
    np.testing.assert_array_equal(d0, d1)


def test_atlas_id_of_orderings_and_errors():
    imgs = [exact_grid_image(4, 4, seed=s) for s in range(3)]
    quad = screen_quad()
    instances = [
        scene_mod.MeshInstance(quad, texture=imgs[0]),
        scene_mod.MeshInstance(quad, texture=imgs[1],
                               normal_texture=imgs[2]),
        scene_mod.MeshInstance(quad, texture=imgs[0]),   # dedup by identity
    ]
    # ids 1, 3, 4: the shared neutral normal texel (packed for instance 0
    # because instance 1 normal-maps the scene) takes id 2
    assert atlas_id_of(instances, imgs[0]) == 1
    assert atlas_id_of(instances, imgs[1]) == 3
    assert atlas_id_of(instances, imgs[2]) == 4
    with pytest.raises(ValueError, match="not used"):
        atlas_id_of(instances, exact_grid_image(4, 4, seed=9))
    # matches what build_scene_buffers actually packed
    sc = scene_mod.build_scene_buffers(instances)
    oy, ox = sc["atlas_offsets"][1]
    h, w = sc["atlas_sizes"][1]
    got = sc["atlas_data"][oy:oy + h, ox:ox + w].astype(np.float32) / 255.0
    np.testing.assert_allclose(got, np.round(imgs[0] * 255) / 255,
                               atol=1e-6)


def test_rtt_pass_rejects_stats_params():
    with pytest.raises(ValueError, match="stats"):
        RttPass(tex_id=1, uniforms_key="x",
                params=RenderParams(width=8, height=8, kbuffer=4,
                                    kbuffer_stats=True))
