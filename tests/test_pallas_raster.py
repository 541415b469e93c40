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
