"""Native C++ kernel tests (vs the NumPy fallbacks they must match)."""

import numpy as np
import pytest

from softwarerenderer_tpu.native import (
    accessor_to_f32,
    bake_normals,
    bake_positions,
    bounding_sphere_native,
    is_available,
    scale_pcm16,
)
from softwarerenderer_tpu.native.build import build
from softwarerenderer_tpu.models.scene import bounding_sphere
from softwarerenderer_tpu.utils import mathlib as ml


def test_library_builds():
    assert build(), "g++ is in the image; the native library must build"
    assert is_available()


def test_bake_positions_matches_numpy():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(100, 3)).astype(np.float32)
    m = (ml.matrix_from_yaw_pitch_roll(0.4, 0.2, 0.1)
         @ ml.translation([1, 2, 3])).astype(np.float32)
    expect = (pos @ m[:3, :3] + m[3, :3]).astype(np.float32)
    np.testing.assert_allclose(bake_positions(pos, m), expect, atol=1e-6)


def test_bake_normals_normalized():
    rng = np.random.default_rng(1)
    nrm = rng.normal(size=(50, 3)).astype(np.float32)
    m = ml.matrix_from_yaw_pitch_roll(0.7, -0.3, 0.2).astype(np.float32)
    out = bake_normals(nrm, m)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    expect = nrm @ m[:3, :3]
    expect /= np.linalg.norm(expect, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_accessor_decode_strided_normalized():
    if not is_available():
        pytest.skip("native library unavailable")
    # 3 VEC2 uint16-normalized entries with 8-byte stride (4 bytes padding)
    vals = np.array([[0, 65535], [32767, 0], [65535, 32767]], np.uint16)
    raw = b"".join(v.tobytes() + b"\x00\x00\x00\x00" for v in vals)
    out = accessor_to_f32(raw, 3, 2, 5123, 8, True)
    np.testing.assert_allclose(out, vals.astype(np.float32) / 65535.0,
                               atol=1e-6)


def test_scale_pcm16_clamps():
    s = np.array([100, -100, 30000, -30000], np.int16)
    out = scale_pcm16(s, 2.0)
    assert out.tolist() == [200, -200, 32767, -32768]
    half = scale_pcm16(s, 0.5)
    assert half.tolist() == [50, -50, 15000, -15000]


def test_native_bounding_sphere_contains_all_points():
    if not is_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(200, 3)).astype(np.float32) * [3, 1, 2]
    c, r = bounding_sphere_native(pos)
    d = np.linalg.norm(pos - c, axis=-1)
    assert (d <= r + 1e-4).all()
    # agrees with the Python implementation's result closely
    c2, r2 = bounding_sphere(pos)
    assert abs(r - r2) < 0.3
