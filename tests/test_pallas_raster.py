"""Pallas visibility-fold kernel vs the XLA binned reducer (interpret mode
on the CPU mesh; the real-TPU path is exercised by bench.py --pallas)."""

import numpy as np
import pytest

import jax

from softwarerenderer_tpu import DepthTest, RenderParams
from softwarerenderer_tpu.models import primitives
from softwarerenderer_tpu import shaders
from softwarerenderer_tpu.ops import binning, geometry, pallas_raster
from softwarerenderer_tpu.utils import mathlib as ml

W, H = 200, 150
PARAMS = RenderParams(width=W, height=H, cull_mode=0, tile_h=16,
                      tile_w=128, span_cap=6, tile_group=4, chunk=32)


def uniforms():
    return {
        "model": np.eye(4, dtype=np.float32),
        "view": ml.look_at(np.float32([0, 0, 3]), [0, 0, 0], [0, 1, 0]),
        "projection": ml.perspective_fov(np.deg2rad(60.0), W / H, 0.1, 100.0),
        "near_clip": np.float32(0.1),
    }


def run_pair(mesh):
    vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                    mesh["normal"], mesh["color"])

    def pair(vin, idx, u):
        tris = geometry.build_triangles(
            shaders.default_vertex_shader, vin, idx, u,
            width=W, height=H, cull_mode=0)
        db, ib = binning.make_binned_visibility(
            tile_h=16, tile_w=128, span_cap=6, tile_group=4)(tris, PARAMS, 32)
        dp, ip = pallas_raster.make_pallas_visibility(interpret=True)(
            tris, PARAMS, 32)
        return db, ib, dp, ip

    return map(np.asarray, jax.jit(pair)(vin, mesh["indices"], uniforms()))


@pytest.mark.parametrize("scene", ["soup", "nearclip", "global_plane"])
def test_pallas_matches_xla_binned(scene):
    if scene == "soup":
        mesh = primitives.random_triangle_soup(120, seed=4)
    elif scene == "nearclip":
        mesh = primitives.random_triangle_soup(50, seed=5,
                                               z_range=(-4.0, 1.0))
    else:
        mesh = primitives.plane(40.0, y=-1.5)   # spans > span_cap → global
    db, ib, dp, ip = run_pair(mesh)
    assert (ib == ip).mean() > 0.999
    same = ib == ip
    assert np.abs(np.where(same, db - dp, 0)).max() < 1e-6


def test_pallas_rejects_unsupported_mode():
    mesh = primitives.random_triangle_soup(8, seed=1)
    vin = shaders.make_vertex_input(mesh["position"], mesh["uv"],
                                    mesh["normal"], mesh["color"])
    tris = jax.jit(lambda v, i, u: geometry.build_triangles(
        shaders.default_vertex_shader, v, i, u, width=W, height=H,
        cull_mode=0))(vin, mesh["indices"], uniforms())
    bad = PARAMS.replace(depth_test=DepthTest.GREATER)
    with pytest.raises(NotImplementedError):
        pallas_raster.visibility_pallas(tris, bad, 32, interpret=True)



def _tile_kernel_scene():
    from softwarerenderer_tpu.models import scene as scene_mod
    from softwarerenderer_tpu.ops import texture as tex_ops

    checker = np.asarray(tex_ops.checkerboard(16, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0, -1, 0]),
                                    texture=checker),
             scene_mod.MeshInstance(primitives.cube(0.8),
                                    ml.translation([0, 0, -3]),
                                    texture=checker)]
    rng = np.random.default_rng(0)
    for _ in range(10):
        pos = rng.uniform(-4, 4, 3).astype(np.float32)
        pos[1] = rng.uniform(-0.5, 1.5)
        insts.append(scene_mod.MeshInstance(primitives.cube(0.5),
                                            ml.translation(pos),
                                            texture=checker))
    return scene_mod.build_scene_buffers(insts)


def _render_tile_vs_fused(params, glob_resident=None, monkeypatch=None):
    """Render via the single-pass tile kernel (interpret) and the XLA fused
    path on the same scene; return both frames."""
    import functools
    import jax.numpy as jnp
    from softwarerenderer_tpu.engine import (camera_matrices,
                                             default_frame_uniforms,
                                             render_frame,
                                             scene_fragment_shader,
                                             scene_vertex_shader)
    from softwarerenderer_tpu.ops import (culling, pallas_tile, raster)

    if glob_resident is not None:
        monkeypatch.setattr(pallas_tile, "GLOB_RESIDENT", glob_resident)
    sc = _tile_kernel_scene()
    w, h = params.width, params.height
    u0 = default_frame_uniforms(w, h)
    u0["camera_position"] = np.float32([0, 0.5, 3.0])

    def pt(scene, u):
        view, proj = camera_matrices(u, w, h)
        vp = ml.transform(view, proj, xp=jnp)
        visible = culling.spheres_in_frustum(
            scene["bounds_center"], scene["bounds_radius"],
            scene["mesh_matrices"], vp, xp=jnp)
        tri_mask = jnp.take(visible, scene["tri_mesh_id"])
        model_pv = jnp.take(scene["mesh_matrices"], scene["vert_mesh_id"],
                            axis=0)
        uu = dict(u)
        uu.update(model=model_pv, view=view, projection=proj,
                  atlas_data=scene["atlas_data"],
                  atlas_offsets=scene["atlas_offsets"],
                  atlas_sizes=scene["atlas_sizes"],
                  base_color=scene["base_color"])
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        tris = geometry.build_triangles(
            scene_vertex_shader, vin, scene["indices"], uu, width=w,
            height=h, near_clip=uu["near_clip"], tri_mask=tri_mask,
            keep_varyings=scene_fragment_shader.varyings)
        tid2 = jnp.repeat(scene["tri_texture_id"], 2)
        aoff = jnp.asarray(scene["atlas_offsets"], jnp.int32)
        asiz = jnp.asarray(scene["atlas_sizes"], jnp.int32)
        per_tri = {"tex_id": tid2,
                   "mesh_id": jnp.repeat(scene["tri_mesh_id"], 2),
                   "tex_oy": jnp.take(aoff[:, 0], tid2),
                   "tex_ox": jnp.take(aoff[:, 1], tid2),
                   "tex_h": jnp.take(asiz[:, 0], tid2),
                   "tex_w": jnp.take(asiz[:, 1], tid2)}
        clear = jnp.asarray(u["clear_color"], jnp.float32)
        fbc = jnp.broadcast_to(clear, (h, w, 4))
        fbd = jnp.full((h, w), raster.DEPTH_CLEAR, jnp.float32)
        return pallas_tile.render_tile_pallas(
            tris, scene_fragment_shader, uu, params, fbc, fbd,
            per_tri_extra=per_tri, interpret=True)

    cg, dg = jax.jit(pt)(sc, u0)
    xla_params = params.replace(use_pallas=False)
    cf, df = jax.jit(functools.partial(render_frame, params=xla_params))(
        sc, u0)
    return map(np.asarray, (cg, dg, cf, df))


def test_tile_kernel_matches_fused():
    """Single-pass tile kernel (interpret) must be pixel-exact vs the XLA
    fused path: same winners, same interpolation, same shading."""
    params = RenderParams(width=136, height=92, tile_h=16, tile_w=128,
                          tile_group=4, chunk=16, span_cap=6)
    cg, dg, cf, df = _render_tile_vs_fused(params)
    assert (np.abs(cg - cf).max(axis=-1) > 1e-5).mean() == 0
    assert (np.abs(dg - df) > 1e-5).mean() == 0


def test_tile_kernel_global_tail(monkeypatch):
    """Globals beyond the VMEM-resident cap stream through the DMA tail
    loop; force a tiny cap so the tail path is exercised."""
    params = RenderParams(width=136, height=92, tile_h=16, tile_w=128,
                          tile_group=4, chunk=16, span_cap=1)  # many globals
    cg, dg, cf, df = _render_tile_vs_fused(params, glob_resident=32,
                                           monkeypatch=monkeypatch)
    assert (np.abs(cg - cf).max(axis=-1) > 1e-5).mean() == 0
    assert (np.abs(dg - df) > 1e-5).mean() == 0



def test_kdeep_kernel_matches_peel():
    """The single-pass K-deep kernel (one invocation, K winners in
    scratch) must reproduce the K-pass depth-peel path bit for bit —
    both in interpret mode (VERDICT r2 #3)."""
    import functools
    import jax.numpy as jnp
    from softwarerenderer_tpu.engine import (camera_matrices,
                                             default_frame_uniforms,
                                             scene_fragment_shader,
                                             scene_vertex_shader)
    from softwarerenderer_tpu.ops import culling, pallas_tile, raster

    params = RenderParams(width=136, height=92, tile_h=16, tile_w=128,
                          tile_group=4, chunk=16, span_cap=6, kbuffer=3,
                          cull_mode=0)
    sc = _tile_kernel_scene()
    w, h = params.width, params.height
    u0 = default_frame_uniforms(w, h)
    u0["camera_position"] = np.float32([0, 0.5, 3.0])

    def both(scene, u):
        view, proj = camera_matrices(u, w, h)
        vp = ml.transform(view, proj, xp=jnp)
        visible = culling.spheres_in_frustum(
            scene["bounds_center"], scene["bounds_radius"],
            scene["mesh_matrices"], vp, xp=jnp)
        tri_mask = jnp.take(visible, scene["tri_mesh_id"])
        model_pv = jnp.take(scene["mesh_matrices"], scene["vert_mesh_id"],
                            axis=0)
        uu = dict(u)
        uu.update(model=model_pv, view=view, projection=proj,
                  atlas_data=scene["atlas_data"],
                  atlas_offsets=scene["atlas_offsets"],
                  atlas_sizes=scene["atlas_sizes"],
                  base_color=scene["base_color"])
        vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
        tris = geometry.build_triangles(
            scene_vertex_shader, vin, scene["indices"], uu, width=w,
            height=h, cull_mode=params.cull_mode,
            near_clip=uu["near_clip"], tri_mask=tri_mask,
            keep_varyings=scene_fragment_shader.varyings)
        tid2 = jnp.repeat(scene["tri_texture_id"], 2)
        aoff = jnp.asarray(scene["atlas_offsets"], jnp.int32)
        asiz = jnp.asarray(scene["atlas_sizes"], jnp.int32)
        per_tri = {"tex_oy": jnp.take(aoff[:, 0], tid2),
                   "tex_ox": jnp.take(aoff[:, 1], tid2),
                   "tex_h": jnp.take(asiz[:, 0], tid2),
                   "tex_w": jnp.take(asiz[:, 1], tid2)}
        clear = jnp.asarray(u["clear_color"], jnp.float32)
        fbc = jnp.broadcast_to(clear, (h, w, 4))
        fbd = jnp.full((h, w), raster.DEPTH_CLEAR, jnp.float32)
        c1, d1, stats = pallas_tile.render_tile_pallas_kbuffer_single(
            tris, scene_fragment_shader, uu, params, fbc, fbd,
            per_tri_extra=per_tri, interpret=True, with_stats=True)
        c2, d2 = pallas_tile.render_tile_pallas_kbuffer(
            tris, scene_fragment_shader, uu, params, fbc, fbd,
            per_tri_extra=per_tri, interpret=True)
        return c1, d1, stats, c2, d2

    c1, d1, stats, c2, d2 = jax.jit(both)(sc, u0)
    c1, d1, c2, d2 = map(np.asarray, (c1, d1, c2, d2))
    assert (np.abs(c1 - c2).max(axis=-1) > 1e-5).mean() == 0
    assert (np.abs(d1 - d2) > 1e-5).mean() == 0
    assert int(stats["kbuffer_saturated_px"]) >= 0


def test_shade_rate_contract():
    """shade_rate=2 (opt-in APPROXIMATE mode, its own contract — never a
    parity path): anchor ROWS match full-rate (depth exactly, color to
    1 ulp); other rows replicate their anchor row wherever both were
    written."""
    import functools

    from softwarerenderer_tpu.engine.renderer import (
        default_frame_uniforms,
        render_frame,
    )
    from softwarerenderer_tpu.models import scene as scene_mod
    from softwarerenderer_tpu.ops import texture as tex_ops

    checker = np.asarray(tex_ops.checkerboard(32, 4)["data"])
    insts = [scene_mod.MeshInstance(
        primitives.plane(30.0), ml.translation([0.0, -1.0, 0.0]),
        texture=checker)]
    rng = np.random.default_rng(0)
    for i in range(6):
        pos = rng.uniform(-4, 4, 3).astype(np.float32)
        pos[1] = rng.uniform(-0.5, 1.5)
        insts.append(scene_mod.MeshInstance(
            primitives.cube(0.9), ml.translation(pos), texture=checker))
    scene = scene_mod.build_scene_buffers(insts)
    params = RenderParams(width=128, height=64, tile_h=16, tile_w=128,
                          tile_group=4, chunk=16, span_cap=6,
                          pallas_interpret=True)
    u = default_frame_uniforms(params.width, params.height)
    u["camera_position"] = np.float32([0.0, 1.0, 8.0])

    full_c, full_d = map(np.asarray, jax.jit(functools.partial(
        render_frame, params=params))(scene, u))
    half_c, half_d = map(np.asarray, jax.jit(functools.partial(
        render_frame, params=params.replace(shade_rate=2)))(scene, u))

    # anchors (even, even) match depth exactly and color to 1 ulp (the
    # subsampled shader compiles with different fusion/FMA contraction —
    # the PARITY.md cross-compilation note); other positions follow
    # their anchor's write/discard decision, so only a thin silhouette
    # band may differ in depth.
    np.testing.assert_array_equal(half_d[::2, ::2], full_d[::2, ::2])
    np.testing.assert_allclose(half_c[::2, ::2], full_c[::2, ::2],
                               atol=1e-6)
    assert (half_d != full_d).mean() < 0.02
    # replication: wherever an odd row's pixel and its anchor-row pixel
    # were both written, the color is the anchor's (unwritten pixels
    # keep the clear color / previous framebuffer)
    from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR
    m = (half_d[::2] != DEPTH_CLEAR) & (half_d[1::2] != DEPTH_CLEAR)
    np.testing.assert_array_equal(half_c[1::2][m], half_c[::2][m])
    # and it is a real approximation somewhere (blocks differ from exact)
    assert (np.abs(half_c - full_c) > 1e-6).any()

    # guarded: only the Pallas opaque route implements it
    with pytest.raises(ValueError):
        render_frame(scene, u, params.replace(shade_rate=2,
                                              use_pallas=False))
