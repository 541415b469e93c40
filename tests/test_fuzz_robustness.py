"""Adversarial fuzz: degenerate geometry must never crash or emit NaNs,
and the fused path must agree with the brute-force oracle on random junk."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import render_frame, default_frame_uniforms
from softwarerenderer_tpu.models import scene as scene_mod
from softwarerenderer_tpu.utils import mathlib as ml

W, H = 96, 64


def junk_mesh(rng, n=40):
    """Random triangles seasoned with degenerate cases: duplicated verts
    (zero area), NaN/Inf positions, points behind / straddling the camera,
    huge coordinates."""
    pos = rng.normal(0, 3, (n * 3, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(-10, 2, n * 3)
    # zero-area triangles
    for t in rng.choice(n, 5, replace=False):
        pos[3 * t + 1] = pos[3 * t]
        pos[3 * t + 2] = pos[3 * t]
    # NaN / Inf triangles
    pos[3 * int(rng.integers(n))] = np.nan
    pos[3 * int(rng.integers(n)) + 1] = np.inf
    # gigantic triangle
    g = int(rng.integers(n))
    pos[3 * g: 3 * g + 3] *= 1e6
    colors = rng.uniform(0, 1, (n * 3, 4)).astype(np.float32)
    colors[:, 3] = 1.0
    return {
        "position": pos,
        "uv": rng.uniform(-2, 2, (n * 3, 2)).astype(np.float32),
        "normal": rng.normal(0, 1, (n * 3, 3)).astype(np.float32),
        "color": colors,
        "indices": np.arange(n * 3, dtype=np.int32).reshape(-1, 3),
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_fused_vs_brute(seed):
    rng = np.random.default_rng(seed)
    mesh = junk_mesh(rng)
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(mesh, np.eye(4, dtype=np.float32))])
    u = default_frame_uniforms(W, H)
    u["camera_position"] = np.float32([0, 0, 4])
    pf = RenderParams(width=W, height=H, cull_mode=0, tile_h=16, tile_w=32,
                      tile_group=4, chunk=16, span_cap=6)
    pb = pf.replace(binned=False)

    cf, df = jax.jit(lambda s, u: render_frame(s, u, params=pf))(sc, u)
    cb, db = jax.jit(lambda s, u: render_frame(s, u, params=pb))(sc, u)
    cf, df, cb, db = map(np.asarray, (cf, df, cb, db))
    assert np.isfinite(cf).all(), "fused path emitted non-finite colors"
    assert np.isfinite(cb).all()
    bad = (np.abs(cf - cb).max(axis=-1) > 1e-4).mean()
    assert bad < 0.01, f"{bad:.4f} fused-vs-brute mismatch on junk scene"


def test_empty_and_single_triangle_scenes():
    u = default_frame_uniforms(W, H)
    params = RenderParams(width=W, height=H, cull_mode=0, tile_h=16,
                          tile_w=32, tile_group=4, chunk=16)
    one = {
        "position": np.float32([[-1, -1, -3], [1, -1, -3], [0, 1, -3]]),
        "uv": np.zeros((3, 2), np.float32),
        "normal": np.tile(np.float32([0, 0, 1]), (3, 1)),
        "color": np.ones((3, 4), np.float32),
        "indices": np.int32([[0, 2, 1]]),
    }
    sc = scene_mod.build_scene_buffers(
        [scene_mod.MeshInstance(one, np.eye(4, dtype=np.float32))])
    c, d = jax.jit(lambda s, u: render_frame(s, u, params=params))(sc, u)
    assert np.isfinite(np.asarray(c)).all()
    assert (np.asarray(d) > np.finfo(np.float32).min).any()
