"""Engine tests: packed-scene frame vs per-mesh golden, culling, present."""

import numpy as np

import jax
import jax.numpy as jnp

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import (
    Engine,
    camera_matrices,
    default_frame_uniforms,
    scene_vertex_shader,
)
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.ops import culling, texture as tex_ops
from softwarerenderer_tpu.ref_cpu import rasterizer as ref
from softwarerenderer_tpu import shaders
from softwarerenderer_tpu.utils import mathlib as ml

W, H = 96, 80


def make_instances():
    checker = np.asarray(tex_ops.checkerboard(16, 4)["data"])
    return [
        scene_mod.MeshInstance(primitives.plane(8.0),
                               ml.translation([0.0, -1.0, 0.0]),
                               texture=checker),
        scene_mod.MeshInstance(
            primitives.cube(1.0),
            (ml.matrix_from_yaw_pitch_roll(0.5, 0.0, 0.0)
             @ ml.translation([0.0, 0.0, -3.0])).astype(np.float32),
            texture=checker),
        scene_mod.MeshInstance(primitives.uv_sphere(0.6, rings=6, sectors=8),
                               ml.translation([1.2, 0.2, -3.5])),
    ]


def test_engine_matches_per_mesh_golden():
    """One packed-soup frame == sequential per-mesh reference renders."""
    insts = make_instances()
    sc = scene_mod.build_scene_buffers(insts)
    params = RenderParams(width=W, height=H)
    eng = Engine(sc, params, chunk=32)
    u = eng.uniforms
    u["camera_position"] = np.float32([0.0, 0.5, 2.0])
    color, depth = eng.render(u)
    color, depth = np.asarray(color), np.asarray(depth)

    view, proj = camera_matrices(u, W, H, xp=np)
    fb = ref.Framebuffer(W, H)
    fb.clear_color(u["clear_color"])
    for inst in insts:
        mu = dict(u)
        mu.update(model=np.asarray(inst.model_matrix, np.float32),
                  view=view, projection=proj)
        if inst.texture is not None:
            mu["texture"] = {"data": np.asarray(inst.texture)}
        mesh = inst.mesh
        vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                        mesh["normal"], mesh["color"])
        ref.render_mesh(fb, vin, mesh["indices"], mu,
                        shaders.default_vertex_shader,
                        shaders.default_fragment_shader,
                        near_clip=float(u["near_clip"]))

    bad = np.abs(color - fb.color).max(axis=-1) > 1e-4
    assert bad.mean() < 0.005, f"{bad.sum()} mismatched pixels"
    covered = fb.depth > np.finfo(np.float32).min
    dcov = depth > np.finfo(np.float32).min
    assert (covered != dcov).mean() < 0.005


def test_frustum_culls_offscreen_mesh():
    cube = primitives.cube(1.0)
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(cube, ml.translation([0.0, 0.0, -3.0]))])
    eng = Engine(sc, RenderParams(width=W, height=H), chunk=32)
    u = eng.uniforms
    # facing the cube: covered pixels exist
    _, d1 = eng.render(u)
    assert (np.asarray(d1) > np.finfo(np.float32).min).any()
    # looking the other way: everything culled, buffer untouched
    u2 = dict(u)
    u2["camera_rotation"] = ml.quat_from_axis_angle(
        np.float32([0, 1, 0]), np.float32(np.pi))
    _, d2 = eng.render(u2)
    assert not (np.asarray(d2) > np.finfo(np.float32).min).any()


def test_spheres_in_frustum_matches_reference_logic():
    view = ml.look_at(np.float32([0, 0, 0]), [0, 0, -1], [0, 1, 0])
    proj = ml.perspective_fov(np.deg2rad(90.0), 1.0, 0.1, 100.0)
    vp = ml.transform(view, proj)
    centers = np.float32([[0, 0, -5], [0, 0, 5], [20, 0, -5], [0, 0, -200],
                          [0, 0, -0.01]])
    radii = np.float32([1, 1, 1, 1, 1])
    mats = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    vis = culling.spheres_in_frustum(centers, radii, mats, vp)
    # in front / behind / far right / beyond far plane / straddling near
    assert vis.tolist() == [True, False, False, False, True]


def test_scaled_instance_radius_is_conservative():
    view = ml.look_at(np.float32([0, 0, 0]), [0, 0, -1], [0, 1, 0])
    proj = ml.perspective_fov(np.deg2rad(60.0), 1.0, 0.1, 100.0)
    vp = ml.transform(view, proj)
    # unit sphere at x=8, z=-5 is outside a 60° frustum, but scaled 10x the
    # world radius overlaps it
    m_small = ml.scale(1.0) @ ml.translation([8.0, 0.0, -5.0])
    m_big = ml.scale(10.0) @ ml.translation([8.0, 0.0, -5.0])
    vis = culling.spheres_in_frustum(
        np.zeros((2, 3), np.float32), np.ones(2, np.float32),
        np.stack([m_small, m_big]).astype(np.float32), vp)
    assert vis.tolist() == [False, True]


def test_present_returns_uint8_rgb():
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(primitives.cube(1.0),
                                ml.translation([0.0, 0.0, -3.0]))])
    eng = Engine(sc, RenderParams(width=W, height=H), chunk=32)
    rgb = eng.present()
    assert rgb.shape == (H, W, 3) and rgb.dtype == np.uint8


def test_uniform_tuning_does_not_recompile():
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(primitives.cube(1.0),
                                ml.translation([0.0, 0.0, -3.0]))])
    eng = Engine(sc, RenderParams(width=W, height=H), chunk=32)
    eng.render(eng.uniforms)
    traces0 = eng._frame._cache_size()
    u = dict(eng.uniforms)
    u["fov_degrees"] = np.float32(70.0)
    u["fog_color"] = np.float32([1, 0, 0, 1])
    u["camera_position"] = np.float32([0.5, 0.1, 1.0])
    eng.render(u)
    assert eng._frame._cache_size() == traces0


def test_mipmapped_sampling_selects_coarser_levels():
    """use_mipmaps: far geometry samples a coarser mip (region differs from
    mip 0), near geometry stays on mip 0, and a frame renders cleanly."""
    import functools
    from softwarerenderer_tpu.engine import render_frame
    from softwarerenderer_tpu.models.scene import MAX_MIP_LEVELS

    # high-frequency checkerboard tiled across a SUBDIVIDED floor (LOD is
    # per-triangle, so far strips legitimately pick coarser mips)
    checker = np.asarray(tex_ops.checkerboard(64, 32)["data"])
    insts = []
    for zi in range(24):
        strip = primitives.plane(16.0)
        strip["uv"] = strip["uv"] * np.float32(16.0)
        insts.append(scene_mod.MeshInstance(
            strip, ml.translation([0, -1, -8.0 - 16.0 * zi]),
            texture=checker))
    sc = scene_mod.build_scene_buffers(insts)
    assert sc["atlas_mip_offsets"].shape[1] == MAX_MIP_LEVELS
    assert int(sc["atlas_n_mips"][1]) == 7          # 64 → 1 px

    params = RenderParams(width=160, height=120, use_mipmaps=True)
    u = default_frame_uniforms(160, 120)
    u["camera_position"] = np.float32([0.0, 0.5, 0.0])
    c, d = jax.jit(functools.partial(render_frame, params=params))(sc, u)
    c = np.asarray(c)
    assert np.isfinite(c).all()

    # the far strips (near the horizon) average toward the checker mean;
    # without mips they stay high-contrast noise
    c0, d0 = jax.jit(functools.partial(
        render_frame, params=params.replace(use_mipmaps=False)))(sc, u)
    far_band = slice(61, 67)   # just under the horizon
    var_mips = float(np.var(c[far_band, :, 0]))
    var_nomips = float(np.var(np.asarray(c0)[far_band, :, 0]))
    assert var_mips < var_nomips * 0.5, (var_mips, var_nomips)


def test_ssaa_supersampling():
    """ssaa=2 renders at 2x and box-filters down: interiors match the
    non-AA render, silhouette edges gain intermediate coverage values."""
    import jax
    import numpy as np
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.models import primitives, scene as scene_mod
    from softwarerenderer_tpu.utils import mathlib as ml

    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(primitives.cube(1.0),
                                ml.translation([0, 0, -3.0]))])
    p = RenderParams(width=128, height=96, use_pallas=False)
    u = None
    e1 = Engine(sc, p)
    e2 = Engine(sc, p.replace(ssaa=2))
    c1, d1 = map(np.asarray, e1.render())
    c2, d2 = map(np.asarray, e2.render())
    assert c2.shape == c1.shape and d2.shape == d1.shape

    # Interior test: center of the cube face is far from silhouettes —
    # AA must not change it.
    h, w = 48, 64
    assert np.abs(c2[h-2:h+2, w-2:w+2] - c1[h-2:h+2, w-2:w+2]).max() < 1e-5

    # Edge test: some pixels must take values strictly between the face
    # color and the clear color (fractional coverage) that the non-AA
    # frame never produces.
    uniq1 = np.unique(c1[..., 0].round(3))
    frac = ~np.isin(c2[..., 0].round(3), uniq1)
    assert frac.sum() > 20

    # Depth is a real sample from the supersample grid.
    assert d2.dtype == d1.dtype and np.isfinite(d2[h, w])


def test_trilinear_mip_blending():
    """use_mipmaps='trilinear' + the trilinear shader blends two mip
    levels: smoother than nearest-mip at distance (no level pops) and
    bounded by the bracketing levels; unit-checks the region-bilinear
    sampler against a hand lerp."""
    import functools
    from softwarerenderer_tpu.engine import (render_frame,
                                             scene_fragment_shader_trilinear)

    # Region-bilinear unit check on a tiny 2x2 region at (0, 0) of a 4x4
    # atlas: uv (0.5, 0.5) is the texel-center cross → mean of the 4.
    atlas = np.zeros((4, 4, 4), np.float32)
    atlas[0, 0] = [1, 0, 0, 1]
    atlas[0, 1] = [0, 1, 0, 1]
    atlas[1, 0] = [0, 0, 1, 1]
    atlas[1, 1] = [1, 1, 1, 1]
    got = tex_ops.sample_atlas_region_bilinear(
        atlas, np.asarray([0]), np.asarray([0]), np.asarray([2]),
        np.asarray([2]), np.asarray([[0.5, 0.5]], np.float32), xp=np)
    np.testing.assert_allclose(got[0], atlas[:2, :2].reshape(4, 4)
                               .mean(axis=0), atol=1e-6)

    checker = np.asarray(tex_ops.checkerboard(64, 32)["data"])
    insts = []
    for zi in range(24):
        strip = primitives.plane(16.0)
        strip["uv"] = strip["uv"] * np.float32(16.0)
        insts.append(scene_mod.MeshInstance(
            strip, ml.translation([0, -1, -8.0 - 16.0 * zi]),
            texture=checker))
    sc = scene_mod.build_scene_buffers(insts)
    u = default_frame_uniforms(160, 120)
    u["camera_position"] = np.float32([0.0, 0.5, 0.0])

    params = RenderParams(width=160, height=120, use_mipmaps="trilinear")
    ct, _ = jax.jit(functools.partial(
        render_frame, params=params,
        fragment_shader=scene_fragment_shader_trilinear))(sc, u)
    ct = np.asarray(ct)
    assert np.isfinite(ct).all()

    # vs nearest-mip: the far band stays low-variance (mips engaged) …
    c0, _ = jax.jit(functools.partial(
        render_frame, params=params.replace(use_mipmaps=False)))(sc, u)
    far_band = slice(61, 67)
    assert float(np.var(ct[far_band, :, 0])) \
        < float(np.var(np.asarray(c0)[far_band, :, 0])) * 0.5
    # … and the mid-distance transition rows differ from nearest-mip
    # (fractional blending engaged, not just level snapping).
    cn, _ = jax.jit(functools.partial(
        render_frame, params=params.replace(use_mipmaps=True)))(sc, u)
    mid = slice(67, 95)
    assert np.abs(ct[mid] - np.asarray(cn)[mid]).max() > 0.02


def test_sky_panorama_compositing():
    """uniforms["sky_panorama"]: uncovered pixels sample the equirect map
    by view direction (up → top of panorama, horizon → middle); covered
    pixels keep their shaded color."""
    from softwarerenderer_tpu.engine import Engine

    pano = np.zeros((64, 128, 4), np.float32)
    pano[:21] = [1, 0, 0, 1]       # sky top: red
    pano[21:43] = [0, 1, 0, 1]     # horizon band: green
    pano[43:] = [0, 0, 1, 1]       # below horizon: blue
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(primitives.cube(1.0),
                                ml.translation([0, 0, -3.0]))])
    eng = Engine(sc, RenderParams(width=128, height=96, use_pallas=False))
    u = dict(eng.uniforms)
    u["sky_panorama"] = pano
    c, d = map(np.asarray, eng.render(u))
    # Straight ahead (horizon) around the cube: green.
    np.testing.assert_allclose(c[48, 8, :3], [0, 1, 0], atol=1e-2)
    # Cube pixels keep their shaded (non-pure-green) color.
    assert not np.allclose(c[48, 64, :3], [0, 1, 0], atol=0.2)
    # Pitch the camera up: top rows turn red.
    u["camera_rotation"] = np.asarray(
        ml.quat_from_axis_angle([1.0, 0.0, 0.0], np.pi / 3), np.float32)
    c2, _ = map(np.asarray, eng.render(u))
    np.testing.assert_allclose(c2[4, 64, :3], [1, 0, 0], atol=1e-2)
    # And SSAA composes (sky sampled at the supersampled grid).
    eng4 = Engine(sc, RenderParams(width=128, height=96, use_pallas=False,
                                   ssaa=2))
    eng4.scene = eng.scene
    c3, _ = map(np.asarray, eng4.render(u))
    np.testing.assert_allclose(c3[4, 64, :3], [1, 0, 0], atol=1e-2)


def test_ssao_darkens_creases_only():
    """SSAO: the floor-wall contact line darkens, open flat areas stay
    (nearly) untouched, sky pixels exactly untouched; depth unchanged."""
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.ops import ssao as ssao_mod
    from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR

    # linear-depth reconstruction sanity: near and far plane round-trip
    u = {"near_clip": np.float32(0.1), "far_clip": np.float32(100.0)}
    d = ssao_mod.linear_view_distance(
        np.asarray([-0.5, -1.0, DEPTH_CLEAR], np.float32), 0.1, 100.0)
    np.testing.assert_allclose(d, [0.1, 100.0, 100.0], rtol=1e-4)

    white = np.ones((8, 8, 4), np.float32)
    insts = [scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0, -1, 0]),
                                    texture=white),
             scene_mod.MeshInstance(primitives.cube(2.0),
                                    ml.translation([0, 0, -5.0]),
                                    texture=white)]
    sc = scene_mod.build_scene_buffers(insts)
    p = RenderParams(width=160, height=120, use_pallas=False)
    e0 = Engine(sc, p)
    e1 = Engine(sc, p.replace(ssao=True))
    e1.scene = e0.scene
    u = dict(e0.uniforms)
    u["camera_position"] = np.float32([0, 0.8, 0.0])
    c0, d0 = map(np.asarray, e0.render(u))
    c1, d1 = map(np.asarray, e1.render(u))
    np.testing.assert_array_equal(d0, d1)
    dark = c0[..., :3].sum(-1) - c1[..., :3].sum(-1)
    covered = d0 != DEPTH_CLEAR
    assert (dark[~covered] == 0).all()            # sky untouched
    assert dark.max() > 0.2                       # creases darken
    # darkening concentrates near depth discontinuities: most covered
    # pixels are (nearly) unchanged
    assert (dark[covered] < 0.05).mean() > 0.5


def test_bloom_spreads_bright_pixels():
    """Bloom: an emissive-bright region bleeds light past its geometry
    edge; dark frames are unchanged; depth untouched."""
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.ops import bloom as bloom_mod

    # unit check: a single hot pixel spreads into its neighborhood
    img = np.zeros((32, 32, 4), np.float32)
    img[16, 16] = [4.0, 4.0, 4.0, 1.0]
    out = bloom_mod.apply_bloom(img)
    assert out[16, 22, 0] > img[16, 22, 0]      # glow reaches +6 px
    dark = np.zeros((8, 8, 4), np.float32)
    np.testing.assert_array_equal(bloom_mod.apply_bloom(dark), dark)

    white = np.ones((8, 8, 4), np.float32) * 3.0     # overbright texture
    insts = [scene_mod.MeshInstance(primitives.cube(1.0),
                                    ml.translation([0, 0, -3.0]),
                                    texture=white)]
    sc = scene_mod.build_scene_buffers(insts)
    p = RenderParams(width=128, height=96, use_pallas=False)
    e0 = Engine(sc, p)
    e1 = Engine(sc, p.replace(bloom=True))
    e1.scene = e0.scene
    u = dict(e0.uniforms)
    u["clear_color"] = np.zeros(4, np.float32)
    u["fog_start"], u["fog_end"] = np.float32(900.0), np.float32(1000.0)
    u["light_color"] = np.float32([3.0, 3.0, 3.0, 1.0])
    u["bloom_threshold"] = np.float32(0.2)
    u["bloom_strength"] = np.float32(1.5)
    c0, d0 = map(np.asarray, e0.render(u))
    c1, d1 = map(np.asarray, e1.render(u))
    np.testing.assert_array_equal(d0, d1)
    from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR
    sky = d0 == float(DEPTH_CLEAR)
    # glow bleeds onto sky pixels adjacent to the cube
    assert (c1[sky][..., :3].max(-1) > 0.02).sum() > 20
    assert (c0[sky][..., :3].max(-1) > 0.02).sum() == 0


def test_tonemap_compresses_highlights():
    """tonemap='reinhard'/'aces': monotone, bounded in [0,1), exposure
    traced; a rendered frame's bright pixels compress while order is
    preserved; depth untouched."""
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.ops import tonemap as tm

    x = np.linspace(0, 8, 100, dtype=np.float32)
    for mode in ("reinhard", "aces"):
        y = tm._OPERATORS[mode](x)
        assert (np.diff(y) >= -1e-6).all()           # monotone
        assert y.max() <= 1.0 and y[0] <= 1e-6

    white = np.ones((8, 8, 4), np.float32)
    insts = [scene_mod.MeshInstance(primitives.cube(1.0),
                                    ml.translation([0, 0, -3.0]),
                                    texture=white)]
    sc = scene_mod.build_scene_buffers(insts)
    p = RenderParams(width=96, height=64, use_pallas=False)
    e0 = Engine(sc, p)
    e1 = Engine(sc, p.replace(tonemap="aces"))
    e1.scene = e0.scene
    u = dict(e0.uniforms)
    u["light_color"] = np.float32([4.0, 4.0, 4.0, 1.0])   # overbright
    u["exposure"] = np.float32(1.0)
    c0, d0 = map(np.asarray, e0.render(u))
    c1, d1 = map(np.asarray, e1.render(u))
    np.testing.assert_array_equal(d0, d1)
    assert c1[..., :3].max() <= 1.0
    # exposure is live (traced): lower exposure darkens without recompile
    u["exposure"] = np.float32(0.25)
    c2, _ = map(np.asarray, e1.render(u))
    assert c2[..., :3].mean() < c1[..., :3].mean()


def test_post_fx_order_is_configurable():
    """params.post_fx is the pipeline: bloom-after-tonemap differs from
    the default bloom-before-tonemap (display- vs scene-referred glow),
    while restating the default order changes nothing."""
    from softwarerenderer_tpu.engine import render_frame

    insts = make_instances()
    sc = scene_mod.build_scene_buffers(insts)
    u = default_frame_uniforms(W, H)
    u["camera_position"] = np.float32([0.0, 0.5, 2.0])
    u["exposure"] = np.float32(2.0)

    base = RenderParams(width=W, height=H, bloom=True, tonemap="aces",
                        use_pallas=False)
    c_default, _ = jax.jit(render_frame, static_argnums=2)(sc, u, base)
    c_same, _ = jax.jit(render_frame, static_argnums=2)(
        sc, u, base.replace(post_fx=("sky", "ssao", "bloom", "tonemap")))
    np.testing.assert_array_equal(np.asarray(c_default), np.asarray(c_same))

    c_swapped, _ = jax.jit(render_frame, static_argnums=2)(
        sc, u, base.replace(post_fx=("sky", "ssao", "tonemap", "bloom")))
    assert np.abs(np.asarray(c_swapped) - np.asarray(c_default)).max() > 0.01


def test_post_fx_validation():
    import pytest

    from softwarerenderer_tpu.engine import render_frame

    sc = scene_mod.build_scene_buffers(make_instances())
    u = default_frame_uniforms(W, H)
    with pytest.raises(ValueError, match="unknown post_fx"):
        render_frame(sc, u, RenderParams(width=W, height=H, bloom=True,
                                         post_fx=("bloom", "vignette")))
    with pytest.raises(ValueError, match="absent from"):
        render_frame(sc, u, RenderParams(width=W, height=H, bloom=True,
                                         post_fx=("tonemap",)))


def test_fxaa_smooths_jaggies_only():
    """FXAA post-fx (ops/fxaa.py): flat regions are bit-identical, a
    staircase silhouette loses contrast along its edge, alpha and depth
    pass through, and the effect composes through params.post_fx."""
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.ops import fxaa as fxaa_mod

    # unit: flat frames untouched (below threshold nothing blends)
    flat = np.full((16, 16, 4), 0.4, np.float32)
    np.testing.assert_array_equal(fxaa_mod.apply_fxaa(flat), flat)

    # unit: a hard staircase edge blends toward its neighbors
    img = np.zeros((24, 24, 4), np.float32)
    img[..., 3] = 1.0
    for y in range(24):
        img[y, : 8 + (y // 4), :3] = 1.0           # 4-px staircase
    out = fxaa_mod.apply_fxaa(img)
    # alpha untouched
    np.testing.assert_array_equal(out[..., 3], img[..., 3])
    # the step corners moved toward the average: fewer pure-0/1 pixels
    # in the 2-px band around the edge
    edge_band = np.abs(np.arange(24)[None, :] - (8 + np.arange(24)[:, None] // 4)) <= 1
    hard_before = ((img[..., 0] == 0) | (img[..., 0] == 1))[edge_band].mean()
    hard_after = ((out[..., 0] == 0) | (out[..., 0] == 1))[edge_band].mean()
    assert hard_after < hard_before
    # interior pixels (far from any edge) are untouched
    np.testing.assert_array_equal(out[2:6, 2:4], img[2:6, 2:4])

    # engine: sloped triangle edge softens; depth untouched; off-by-default
    tri = {
        "position": np.asarray([[-0.9, -0.8, -2.0], [0.9, -0.4, -2.0],
                                [0.0, 0.9, -2.0]], np.float32),
        "uv": np.zeros((3, 2), np.float32),
        "normal": np.tile(np.float32([0, 0, 1]), (3, 1)),
        "color": np.tile(np.float32([1, 1, 1, 1]), (3, 1)),
        "indices": np.asarray([[0, 1, 2]], np.int32),
    }
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(tri, np.eye(4, dtype=np.float32))])
    p = RenderParams(width=96, height=64, use_pallas=False, cull_mode=0)
    e0 = Engine(sc, p)
    e1 = Engine(sc, p.replace(fxaa=True))
    e1.scene = e0.scene
    u = dict(e0.uniforms)
    u["clear_color"] = np.zeros(4, np.float32)
    c0, d0 = map(np.asarray, e0.render(u))
    c1, d1 = map(np.asarray, e1.render(u))
    np.testing.assert_array_equal(d0, d1)
    # total variation along rows (the jaggy direction) drops
    tv0 = np.abs(np.diff(c0[..., 0], axis=1)).sum()
    tv1 = np.abs(np.diff(c1[..., 0], axis=1)).sum()
    assert tv1 < tv0
    # and the frames genuinely differ at the silhouette
    assert np.abs(c1 - c0).max() > 0.05


def test_post_fx_user_callable_stage():
    """params.post_fx entries may be user callables (the post-pipeline
    analog of the shader ABI): they run at their slot in the order, read
    uniforms, and may return color or (color, depth)."""
    from softwarerenderer_tpu.engine import render_frame

    sc = scene_mod.build_scene_buffers(make_instances())
    u = default_frame_uniforms(W, H)
    u["camera_position"] = np.float32([0.0, 0.5, 2.0])
    u["vignette_strength"] = np.float32(0.8)

    def vignette(color, depth, uniforms):
        h, w = color.shape[:2]
        ys = jnp.linspace(-1.0, 1.0, h)[:, None]
        xs = jnp.linspace(-1.0, 1.0, w)[None, :]
        fade = 1.0 - uniforms["vignette_strength"] * \
            jnp.clip(ys * ys + xs * xs, 0.0, 1.0)
        return color * fade[..., None]       # color-only return form

    base = RenderParams(width=W, height=H, tonemap="aces",
                        use_pallas=False)
    c_plain, d_plain = jax.jit(render_frame, static_argnums=2)(
        sc, u, base)
    c_vig, d_vig = jax.jit(render_frame, static_argnums=2)(
        sc, u, base.replace(post_fx=("sky", "ssao", "bloom", "tonemap",
                                     "fxaa", vignette)))
    c_plain, c_vig = np.asarray(c_plain), np.asarray(c_vig)
    # corners darken, the exact center is untouched, depth passes through
    assert c_vig[0, 0, :3].sum() <= c_plain[0, 0, :3].sum()
    assert np.abs(c_vig - c_plain).max() > 0.01
    np.testing.assert_array_equal(np.asarray(d_vig), np.asarray(d_plain))

    # order matters: the callable slots into the chain where written
    def half(color, depth, uniforms):
        return color * 0.5, depth

    before = base.replace(post_fx=("sky", "ssao", "bloom", half,
                                   "tonemap", "fxaa"))
    after = base.replace(post_fx=("sky", "ssao", "bloom", "tonemap",
                                  "fxaa", half))
    c_b, _ = jax.jit(render_frame, static_argnums=2)(sc, u, before)
    c_a, _ = jax.jit(render_frame, static_argnums=2)(sc, u, after)
    assert np.abs(np.asarray(c_b) - np.asarray(c_a)).max() > 0.01


def test_multiview_tiles_match_single_views():
    """render_frame_multiview: each tile is bit-identical to rendering
    that view alone at the tile resolution; invalid layouts reject."""
    import pytest as _pytest

    from softwarerenderer_tpu.engine import (default_frame_uniforms,
                                             render_frame,
                                             render_frame_multiview)
    from softwarerenderer_tpu.models import primitives, scene as scene_mod
    from softwarerenderer_tpu.ops import texture as tex_ops
    from softwarerenderer_tpu.utils import mathlib as ml

    checker = np.asarray(tex_ops.checkerboard(16, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.cube(1.0),
                                    ml.translation([0.0, 0.0, -3.0]),
                                    texture=checker),
             scene_mod.MeshInstance(primitives.plane(8.0),
                                    ml.translation([0.0, -1.0, 0.0]),
                                    texture=checker)]
    scene = scene_mod.build_scene_buffers(insts)
    params = RenderParams(width=128, height=64, tile_h=8, tile_w=64,
                          tile_group=4, chunk=16)
    u = default_frame_uniforms(params.width, params.height)
    views = (
        {"camera_position": np.float32([0.0, 0.0, 1.0])},
        {"camera_position": np.float32([2.0, 1.0, 1.0]),
         "camera_rotation": np.asarray(ml.quat_from_yaw_pitch_roll(
             0.5, -0.2, 0.0), np.float32)},
    )
    # views ride the jit as a TRACED pytree (how a real caller animates
    # cameras) — constant-folding a closed-over camera can contract FMAs
    # differently and flip borderline edge pixels vs the traced path.
    c, d = map(np.asarray, jax.jit(
        lambda s, u, v: render_frame_multiview(s, u, params, v))(
            scene, u, views))
    assert c.shape == (64, 128, 4) and d.shape == (64, 128)

    vp = params.replace(width=64)
    for i, ov in enumerate(views):
        ui = dict(u)
        ui.update(ov)
        ci, di = map(np.asarray, jax.jit(
            lambda s, u: render_frame(s, u, vp))(scene, ui))
        np.testing.assert_array_equal(c[:, i * 64:(i + 1) * 64], ci)
        np.testing.assert_array_equal(d[:, i * 64:(i + 1) * 64], di)
    # the two views actually see different things
    assert np.any(c[:, :64] != c[:, 64:])

    # vertical layout shape
    cv, dv = map(np.asarray, jax.jit(
        lambda s, u, v: render_frame_multiview(s, u, params, v,
                                               layout="v"))(
            scene, u, views))
    assert cv.shape == (64, 128, 4) and dv.shape == (64, 128)

    with _pytest.raises(ValueError):
        render_frame_multiview(scene, u, params, views + views[:1])
    with _pytest.raises(ValueError):
        render_frame_multiview(scene, u, params, views, layout="grid")


def test_render_frame_pip_inset_matches_solo():
    """The PiP inset is the solo render of the pip camera, mirrored,
    pasted over a border; the rest of the frame is the main view."""
    import jax

    from softwarerenderer_tpu.engine import render_frame_pip, render_frame

    sc = scene_mod.build_scene_buffers(make_instances())
    params = RenderParams(width=W, height=H)
    u = default_frame_uniforms(W, H)
    u["camera_position"] = np.float32([0.0, 0.5, 2.0])
    u["pip_view"] = {
        "camera_position": np.float32([1.0, 0.5, 2.0]),
        "camera_rotation": np.asarray(
            ml.quat_from_yaw_pitch_roll(np.pi, 0.0, 0.0), np.float32),
    }

    pip = jax.jit(lambda s, uu: render_frame_pip(
        s, uu, params, pip_frac=4, corner="tc", border=2, chunk=32))
    color, depth = pip(sc, u)
    color = np.asarray(color)

    pw, ph = W // 4, H // 4
    pp = params.replace(width=pw, height=ph)
    pu = dict(u)
    pu.update(u["pip_view"])
    solo = jax.jit(lambda s, uu: render_frame(s, uu, pp, chunk=32))
    sc_col, _ = solo(sc, pu)
    sc_col = np.asarray(sc_col)[:, ::-1]          # mirrored

    x0 = (W - pw) // 2
    np.testing.assert_allclose(color[2:2 + ph, x0:x0 + pw], sc_col,
                               atol=1e-6)
    # border pixels are the dark frame color
    assert (color[0, x0 - 2:x0 + pw + 2, :3] <= 0.05 + 1e-6).all()
    # main view depth untouched by the inset
    main = jax.jit(lambda s, uu: render_frame(s, uu, params, chunk=32))
    _, d_main = main(sc, u)
    np.testing.assert_array_equal(np.asarray(depth), np.asarray(d_main))
