"""Property-based fuzzing (hypothesis) over math/texture/binning invariants
(ROADMAP #13).  All properties run through fixed-shape functions so jitted
paths compile once across examples."""

import functools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

import jax
import jax.numpy as jnp

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.ops import binning, texture as tex_ops
from softwarerenderer_tpu.utils import mathlib as ml

finite_f32 = functools.partial(st.floats, allow_nan=False,
                               allow_infinity=False, width=32)


@settings(max_examples=60, deadline=None)
@given(hnp.arrays(np.float32, (7, 2),
                  elements=finite_f32(min_value=-1e5, max_value=1e5)))
def test_wrap_uv_in_unit_interval(uv):
    """Texture.cs:45-48 wrap: result is always in [0, 1) for finite uv."""
    w = tex_ops._wrap_uv(uv, np)
    assert (w >= 0).all() and (w < 1.0 + 1e-6).all()


@settings(max_examples=60, deadline=None)
@given(hnp.arrays(np.float32, (5, 3, 4),
                  elements=finite_f32(min_value=-2.0, max_value=3.0)))
def test_rgba8_roundtrip_matches_quantize(data):
    """unpack(pack(x)) must equal quantize_u8_grid(clip(x)) bit-exactly —
    the CPU-oracle / device-atlas agreement contract."""
    clipped = np.clip(data, 0.0, 1.0)
    packed = tex_ops.pack_rgba8(clipped)
    assert packed.dtype == np.uint8
    got = tex_ops.unpack_rgba8(packed, np)
    want = tex_ops.quantize_u8_grid(clipped)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(st.tuples(finite_f32(min_value=-3.140625, max_value=3.140625),
                 finite_f32(min_value=-1.375, max_value=1.375),
                 finite_f32(min_value=-3.140625, max_value=3.140625)),
       hnp.arrays(np.float32, (3,),
                  elements=finite_f32(min_value=-10, max_value=10)))
def test_quat_rotation_preserves_length(ypr, v):
    q = ml.quat_from_yaw_pitch_roll(*np.float32(ypr))
    out = ml.quat_rotate(v, np.asarray(q, np.float32))
    np.testing.assert_allclose(np.linalg.norm(out), np.linalg.norm(v),
                               rtol=1e-4, atol=1e-4)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_binning_covers_every_overlap(seed):
    """Every (tile, triangle) whose clamped bbox overlaps the tile is
    either in that tile's segment or on the global list — the no-dropped-
    coverage invariant behind the sort-middle design (SURVEY.md §7)."""
    rng = np.random.default_rng(seed)
    n = 24
    W, H, th, tw, cap = 256, 128, 16, 64, 3
    params = RenderParams(width=W, height=H, tile_h=th, tile_w=tw,
                          span_cap=cap)
    x = rng.integers(0, W, (n, 2)).astype(np.int32)
    y = rng.integers(0, H, (n, 2)).astype(np.int32)
    bbox = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
    valid = rng.random(n) > 0.2
    tris = {"bbox": jnp.asarray(bbox), "valid": jnp.asarray(valid)}
    bins = _run_bins(tris, params)
    starts = np.asarray(bins["starts"])
    counts = np.asarray(bins["counts"])
    sorted_tri = np.asarray(bins["sorted_tri"])
    order = np.asarray(bins["order"])
    n_global = int(np.asarray(bins["n_global"]))
    globals_set = set(order[:n_global].tolist())
    ntx = bins["ntx"]

    for t in range(n):
        if not valid[t]:
            continue
        if t in globals_set:
            continue
        tx0, ty0 = bbox[t, 0] // tw, bbox[t, 1] // th
        tx1, ty1 = bbox[t, 2] // tw, bbox[t, 3] // th
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                tid = ty * ntx + tx
                seg = sorted_tri[starts[tid]:starts[tid] + counts[tid]]
                assert t in seg.tolist(), (t, tid)


@functools.partial(jax.jit, static_argnames=("params",))
def _run_bins(tris, params):
    return binning.bin_triangles(tris, params, params.tile_h,
                                 params.tile_w, params.span_cap)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_no_cracks_on_shared_edges(seed):
    """Watertightness, SURVEY §4(c): a quad split into two triangles along
    its diagonal leaves NO uncovered pixels strictly inside the quad (the
    reference's inclusive both-winding inside test double-covers shared
    edges rather than cracking — the fold then resolves the tie)."""
    rng = np.random.default_rng(seed)
    W, H = 64, 64
    # random convex quad strictly inside the viewport
    cx, cy = rng.uniform(20, 44, 2)
    angs = np.sort(rng.uniform(0, 2 * np.pi, 4))
    if np.min(np.diff(angs, append=angs[0] + 2 * np.pi)) < 0.3:
        return  # too degenerate to say anything
    r = rng.uniform(8, 18, 4)
    pts = np.stack([cx + r * np.cos(angs), cy + r * np.sin(angs)],
                   axis=1).astype(np.float32)

    def covered(tris_pts):
        px, py = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        cov = np.zeros((H, W), bool)
        for (a, b, c) in tris_pts:
            w0 = ((b[1] - c[1]) * (px - b[0]) + (c[0] - b[0]) * (py - b[1]))
            w1 = ((c[1] - a[1]) * (px - c[0]) + (a[0] - c[0]) * (py - c[1]))
            w2 = ((a[1] - b[1]) * (px - a[0]) + (b[0] - a[0]) * (py - a[1]))
            inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) \
                | ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
            cov |= inside
        return cov

    both = covered([(pts[0], pts[1], pts[2]), (pts[0], pts[2], pts[3])])

    # strictly-interior pixels (≥0.5 px from every quad edge) — boundary
    # pixels are legitimately float-ambiguous, interior ones never are
    px, py = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    interior = np.ones((H, W), bool)
    P = pts.astype(np.float64)
    # ensure CCW orientation so inside = positive edge functions
    area2 = 0.0
    for i in range(4):
        a, b = P[i], P[(i + 1) % 4]
        area2 += a[0] * b[1] - b[0] * a[1]
    if area2 < 0:
        P = P[::-1]
    for i in range(4):
        a, b = P[i], P[(i + 1) % 4]
        e = (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])
        n = np.hypot(b[0] - a[0], b[1] - a[1])
        interior &= (e / max(n, 1e-9)) > 0.5
    # the two-triangle split leaves no crack among interior pixels
    assert not (interior & ~both).any()


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_clipper_invariants(seed):
    """Sutherland-Hodgman near-plane clip (ROADMAP #10):
    * clipped output vertices lie on or in front of the plane z >= near·w
      (when any vertex had w <= 0 — the reference's clip trigger);
    * triangles with all w > 0 pass through bit-identically in slot 2t;
    * all-w<=0 triangles are dropped;
    * clipped vertices are convex combinations of the parent's (bounded
      by its clip-space bbox)."""
    from softwarerenderer_tpu.ops.geometry import clip_triangles

    rng = np.random.default_rng(seed)
    T = 16
    near = np.float32(0.1)
    clip = rng.normal(0, 3, (T, 3, 4)).astype(np.float32)
    attrs = {"clip_position": jnp.asarray(clip)}
    out, valid = jax.jit(
        lambda a: clip_triangles(a, near))(attrs)
    out = np.asarray(out["clip_position"])
    valid = np.asarray(valid)

    w_nonpos = clip[..., 3] <= 0
    any_out = w_nonpos.any(axis=-1)
    all_out = w_nonpos.all(axis=-1)
    for t in range(T):
        s0, s1 = out[2 * t], out[2 * t + 1]
        if all_out[t]:
            assert not valid[2 * t] and not valid[2 * t + 1]
            continue
        if not any_out[t]:
            # pass-through identity, fan slot invalid
            assert valid[2 * t] and not valid[2 * t + 1]
            np.testing.assert_array_equal(s0, clip[t])
            continue
        lo = clip[t].min(axis=0) - 1e-3
        hi = clip[t].max(axis=0) + 1e-3
        for slot, v in ((2 * t, s0), (2 * t + 1, s1)):
            if not valid[slot]:
                continue
            z, w = v[:, 2], v[:, 3]
            assert (z >= near * w - 5e-4 * np.abs(w) - 1e-4).all(), \
                (t, z - near * w)
            assert (v >= lo).all() and (v <= hi).all(), (t, v)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_random_skin_device_matches_host(seed):
    """Random skeleton/weights/tracks: the jitted skinning path equals
    the numpy reference at arbitrary times (ops/skinning.py)."""
    import jax.numpy as jnp
    from softwarerenderer_tpu.models.scene import (MeshInstance, Skin,
                                                   build_scene_buffers)
    from softwarerenderer_tpu.ops import skinning

    rng = np.random.default_rng(seed)
    J = int(rng.integers(1, 6))
    V = int(rng.integers(3, 12))
    F = int(rng.integers(1, 5))
    parent = np.asarray([-1] + [int(rng.integers(0, j))
                                for j in range(1, J)], np.int32)
    joints = rng.integers(0, J, (V, 4)).astype(np.int32)
    w = rng.random((V, 4)).astype(np.float32) + 1e-3
    w /= w.sum(1, keepdims=True)
    q = rng.normal(size=(F, J, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    inv_bind = np.broadcast_to(np.eye(4, dtype=np.float32),
                               (J, 4, 4)).copy()
    skin = Skin(joints=joints, weights=w, parent=parent,
                inverse_bind=inv_bind,
                trans=rng.normal(size=(F, J, 3)).astype(np.float32),
                rot=q,
                scale=rng.uniform(0.5, 2.0, (F, J, 3)).astype(np.float32),
                rate=float(rng.uniform(1.0, 60.0)))
    mesh = {
        "position": rng.normal(size=(V, 3)).astype(np.float32),
        "uv": np.zeros((V, 2), np.float32),
        "normal": np.tile(np.float32([[0, 0, 1]]), (V, 1)),
        "color": np.ones((V, 4), np.float32),
        "indices": np.asarray([[0, 1, 2]], np.int32),
    }
    scene = build_scene_buffers([MeshInstance(mesh, skin=skin)])
    vin = {k: jnp.asarray(scene[k])
           for k in ("position", "uv", "normal", "color")}
    t = float(rng.uniform(0.0, 5.0))
    got = np.asarray(skinning.apply_skinning(
        vin, {k: jnp.asarray(v) for k, v in scene.items()
              if k.startswith(("skin_", "joint_"))},
        {"anim_time": np.float32(t)}, xp=jnp)["position"])
    ref = skinning.skinned_positions_np(skin, mesh["position"],
                                        t * skin.rate)
    # rtol matters: chained random scales (up to 2× per joint, ≤5 joints)
    # put positions at O(5), where host-vs-XLA FMA reassociation leaves
    # a few-e-4 absolute wobble (hypothesis found seed 59749 at 2.8e-4
    # over a 5.9 coordinate — 5e-5 relative).
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=2e-4)
