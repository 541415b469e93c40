"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Sharded rendering (fb rows × triangle shards with lexicographic winner
all-reduce) must reproduce the single-device frame.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import default_frame_uniforms, render_frame
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.ops import texture as tex_ops
from softwarerenderer_tpu.parallel import (
    make_mesh,
    render_frame_sharded,
    shard_scene_triangles,
)
from softwarerenderer_tpu.utils import mathlib as ml

W, H = 128, 96


def small_scene():
    checker = np.asarray(tex_ops.checkerboard(16, 4)["data"])
    insts = [scene_mod.MeshInstance(primitives.plane(20.0),
                                    ml.translation([0.0, -1.0, 0.0]),
                                    texture=checker)]
    rng = np.random.default_rng(3)
    for _ in range(5):
        pos = rng.uniform(-4, 4, 3).astype(np.float32)
        pos[1] = rng.uniform(-0.5, 1.0)
        pos[2] = rng.uniform(-6, -2)
        insts.append(scene_mod.MeshInstance(primitives.cube(0.8),
                                            ml.translation(pos),
                                            texture=checker))
    return scene_mod.build_scene_buffers(insts)


def uniforms():
    u = default_frame_uniforms(W, H)
    u["camera_position"] = np.float32([0.0, 0.5, 3.0])
    return u


@pytest.mark.parametrize("n_fb,n_tri", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(n_fb, n_tri):
    params = RenderParams(width=W, height=H, tile_h=8, tile_w=64,
                          tile_group=4, chunk=16)
    scene = small_scene()
    u = uniforms()

    ref_c, ref_d = jax.jit(
        lambda s, u: render_frame(s, u, params=params))(scene, u)
    ref_c, ref_d = np.asarray(ref_c), np.asarray(ref_d)

    sscene = shard_scene_triangles(scene, n_tri)
    mesh = make_mesh(n_fb, n_tri)
    with mesh:
        c, d = jax.jit(lambda s, u: render_frame_sharded(
            s, u, params, mesh))(sscene, u)
    c, d = np.asarray(c), np.asarray(d)

    # exact same winners up to float-reassociation tie flips
    cbad = (np.abs(c - ref_c).max(axis=-1) > 1e-5).mean()
    dbad = (np.abs(d - ref_d) > 1e-5).mean()
    assert cbad < 2e-3, f"{cbad:.4f} color mismatch fraction"
    assert dbad < 2e-3, f"{dbad:.4f} depth mismatch fraction"


def test_triangle_padding_is_masked():
    # shard_scene_triangles pads the triangle list; padded slots must not
    # render (tri_valid mask).
    scene = small_scene()
    n = scene["indices"].shape[0]
    sscene = shard_scene_triangles(scene, 8)
    assert sscene["indices"].shape[0] % 8 == 0
    assert sscene["tri_valid"].sum() == n


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    c, d = jax.jit(fn)(*args)
    assert c.shape == (192, 256, 4)
    assert np.isfinite(np.asarray(c)).all()


@pytest.mark.parametrize("n", [4, 8])
def test_ring_matches_single_device(n):
    from softwarerenderer_tpu.parallel import make_ring_mesh, \
        render_frame_ring
    params = RenderParams(width=W, height=H)
    scene = small_scene()
    u = uniforms()
    ref_c, ref_d = jax.jit(
        lambda s, u: render_frame(s, u, params=params))(scene, u)
    ref_c, ref_d = np.asarray(ref_c), np.asarray(ref_d)

    sscene = shard_scene_triangles(scene, n)
    mesh = make_ring_mesh(n)
    with mesh:
        c, d = jax.jit(lambda s, u: render_frame_ring(
            s, u, params, mesh))(sscene, u)
    c, d = np.asarray(c), np.asarray(d)
    cbad = (np.abs(c - ref_c).max(axis=-1) > 1e-5).mean()
    dbad = (np.abs(d - ref_d) > 1e-5).mean()
    assert cbad < 2e-3, f"{cbad:.4f} color mismatch fraction"
    assert dbad < 2e-3, f"{dbad:.4f} depth mismatch fraction"
