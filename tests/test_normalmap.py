"""Tangent-space normal mapping (ops/normalmap.py) — a capability the
reference's asset pipeline loads but never uses (ModelLoader.cs:221-281
extracts normal-map paths; no shader samples them)."""

import functools

import numpy as np

import jax

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.engine import default_frame_uniforms, render_frame
from softwarerenderer_tpu.models import primitives, scene as scene_mod
from softwarerenderer_tpu.ops import normalmap
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def test_compute_tangents_axis_aligned_quad():
    """A z-facing quad with uv aligned to xy must get tangent ≈ +x and
    right-handed bitangent."""
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], F32)
    uv = pos[:, :2].copy()
    nrm = np.tile(np.asarray([[0, 0, 1]], F32), (4, 1))
    idx = np.asarray([[0, 1, 2], [2, 1, 3]], np.int32)
    t4 = normalmap.compute_tangents(pos, uv, nrm, idx)
    np.testing.assert_allclose(t4[:, :3],
                               np.tile([[1, 0, 0]], (4, 1)), atol=1e-6)
    # bitangent b = cross(n, t) * w must align with +y (the uv v axis)
    b = np.cross(nrm, t4[:, :3]) * t4[:, 3:4]
    np.testing.assert_allclose(b, np.tile([[0, 1, 0]], (4, 1)), atol=1e-6)


def _two_half_normal_map():
    """Left half: neutral +z; right half: normals tilted toward +x in
    tangent space."""
    nm = np.zeros((8, 8, 4), F32)
    nm[:, :4] = [0.5, 0.5, 1.0, 1.0]
    tilt = np.asarray([np.sin(0.6), 0.0, np.cos(0.6)])
    nm[:, 4:] = list(tilt * 0.5 + 0.5) + [1.0]
    return nm


def test_normal_map_perturbs_lighting_on_flat_plane():
    """A flat floor with a split normal map: the tilted half must shade
    differently from the neutral half under a slanted light, and the
    neutral half must match the unmapped scene shader exactly."""
    from softwarerenderer_tpu.engine import scene_fragment_shader

    checker_white = np.ones((8, 8, 4), F32)
    plane = primitives.plane(4.0)
    insts = [scene_mod.MeshInstance(plane, ml.translation([0, -1, -3]),
                                    texture=checker_white,
                                    normal_texture=_two_half_normal_map())]
    sc = scene_mod.build_scene_buffers(insts)
    assert "tangent" in sc and "tri_normal_tex_id" in sc

    W, H = 128, 96
    params = RenderParams(width=W, height=H, use_pallas=False)
    u = default_frame_uniforms(W, H)
    u["camera_position"] = np.float32([0, 1.0, 0.0])
    u["camera_rotation"] = np.asarray(
        ml.quat_from_axis_angle([1.0, 0, 0], -0.5), F32)
    ld = np.float32([0.6, -1.0, 0.0])
    u["light_direction"] = ld / np.linalg.norm(ld)
    u["fog_start"], u["fog_end"] = np.float32(900.0), np.float32(1000.0)

    cn, _ = jax.jit(functools.partial(
        render_frame, params=params,
        vertex_shader=normalmap.normal_mapped_vertex_shader,
        fragment_shader=normalmap.normal_mapped_fragment_shader))(sc, u)
    cp, _ = jax.jit(functools.partial(
        render_frame, params=params,
        fragment_shader=scene_fragment_shader))(sc, u)
    cn, cp = np.asarray(cn), np.asarray(cp)

    mid = H * 2 // 3
    left = cn[mid, W // 4]
    right = cn[mid, 3 * W // 4]
    # the tilted half faces away from the light → darker
    assert right[0] < left[0] - 0.05, (left, right)
    # neutral half matches the plain scene shader up to the u8
    # quantization of the 0.5 neutral texel (128/255 → ~0.004 tilt)
    np.testing.assert_allclose(cn[mid, : W // 3], cp[mid, : W // 3],
                               atol=0.01)
