"""Skeletal skinning: hand-computed two-bone arm + device/host parity +
engine integration (beyond the reference, whose only animation is the
flip-book swap — ModelLoader.cs:331-348)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softwarerenderer_tpu import RenderParams
from softwarerenderer_tpu.models import primitives
from softwarerenderer_tpu.models.scene import (MeshInstance, Skin,
                                               build_scene_buffers)
from softwarerenderer_tpu.ops import skinning
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def two_bone_skin(positions):
    """Root joint at the origin, child at x=1 rotating 90° about z over
    one second (2 keyframes @ 1 fps).  Hard-bound: x<1 → root, else
    child."""
    child = (positions[:, 0] >= 1.0).astype(np.int32)
    joints = np.stack([child, np.zeros_like(child),
                       np.zeros_like(child), np.zeros_like(child)], -1)
    weights = np.zeros(joints.shape, F32)
    weights[:, 0] = 1.0
    qid = np.array([0, 0, 0, 1], F32)
    q90 = np.asarray(ml.quat_from_axis_angle([0, 0, 1], np.pi / 2), F32)
    rot = np.stack([np.stack([qid, qid]),            # root: static
                    np.stack([qid, q90])], axis=1)   # child: 0° → 90°
    trans = np.zeros((2, 2, 3), F32)
    trans[:, 1, 0] = 1.0                             # child local +1 x
    scale = np.ones((2, 2, 3), F32)
    inv_bind = np.stack([np.eye(4, dtype=F32),
                         np.asarray(ml.translation([-1, 0, 0]), F32)])
    return Skin(joints=joints, weights=weights,
                parent=np.asarray([-1, 0], np.int32),
                inverse_bind=inv_bind, trans=trans, rot=rot, scale=scale,
                rate=1.0)


def arm_mesh():
    """A 4-vertex 'arm' strip from x=0 to x=2 (two triangles)."""
    m = primitives.plane(1.0)
    pos = np.asarray([[0, 0, 0], [2, 0, 0], [0, 1, 0], [2, 1, 0]], F32)
    return {
        "position": pos,
        "uv": np.zeros((4, 2), F32),
        "normal": np.tile(np.asarray([[0, 0, 1]], F32), (4, 1)),
        "color": np.ones((4, 4), F32),
        "indices": np.asarray([[0, 1, 2], [2, 1, 3]], np.int32),
    }


def test_two_bone_hand_computed():
    mesh = arm_mesh()
    skin = two_bone_skin(mesh["position"])
    # Rest frame: identity.
    p0 = skinning.skinned_positions_np(skin, mesh["position"], 0.0)
    np.testing.assert_allclose(p0, mesh["position"], atol=1e-6)
    # Frame 1: points bound to the child pivot 90° about (1, 0, 0):
    # (2,0,0) → (1,1,0); (2,1,0) → T(-1)=(1,1,0) @Rz90=(-1,1,0) @T(1)=(0,1,0).
    p1 = skinning.skinned_positions_np(skin, mesh["position"], 1.0)
    np.testing.assert_allclose(p1[1], [1, 1, 0], atol=1e-5)
    np.testing.assert_allclose(p1[3], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(p1[0], [0, 0, 0], atol=1e-6)   # root-bound
    # Halfway: nlerp of a 90° arc ≈ 45° rotation of the offset (1, 0, 0).
    ph = skinning.skinned_positions_np(skin, mesh["position"], 0.5)
    r = np.hypot(ph[1, 0] - 1.0, ph[1, 1])
    assert abs(r - 1.0) < 1e-5
    assert abs(np.degrees(np.arctan2(ph[1, 1], ph[1, 0] - 1.0)) - 45) < 0.5


def test_device_matches_host_reference():
    mesh = arm_mesh()
    skin = two_bone_skin(mesh["position"])
    scene = build_scene_buffers([MeshInstance(mesh, skin=skin)])
    vin = {k: jnp.asarray(scene[k])
           for k in ("position", "uv", "normal", "color")}

    @jax.jit
    def dev(t):
        return skinning.apply_skinning(
            vin, {k: jnp.asarray(v) for k, v in scene.items()
                  if k.startswith(("skin_", "joint_"))},
            {"anim_time": t}, xp=jnp)["position"]

    for t in (0.0, 0.25, 1.0, 1.75):
        ref = skinning.skinned_positions_np(skin, mesh["position"],
                                            t * skin.rate)
        np.testing.assert_allclose(np.asarray(dev(F32(t))), ref, atol=1e-5)


def test_engine_renders_skinned_scene():
    """A skinned arm sweeps 90°: the rendered silhouette must move
    between anim_time 0 and 1 inside the same jitted program."""
    from softwarerenderer_tpu.engine import Engine

    mesh = arm_mesh()
    skin = two_bone_skin(mesh["position"])
    scene = build_scene_buffers([
        MeshInstance(mesh, ml.translation([-1.0, -0.5, -4.0]), skin=skin)])
    eng = Engine(scene, RenderParams(width=96, height=64, cull_mode=0,
                                     use_pallas=False))
    u = dict(eng.uniforms)
    u["anim_time"] = F32(0.0)
    c0 = np.asarray(eng.render(u)[0])
    u["anim_time"] = F32(1.0)
    c1 = np.asarray(eng.render(u)[0])
    assert (np.abs(c0 - c1).max(axis=-1) > 0.05).sum() > 50
    # Conservative culling bounds cover every pose: the arm is visible in
    # both frames (some non-clear pixels differ from the clear color).
    clear = np.asarray(eng.uniforms["clear_color"])
    assert (np.abs(c0 - clear).max(axis=-1) > 0.05).any()
    assert (np.abs(c1 - clear).max(axis=-1) > 0.05).any()


def test_build_rejects_unordered_joints():
    mesh = arm_mesh()
    skin = two_bone_skin(mesh["position"])
    skin.parent = np.asarray([1, -1], np.int32)       # child before parent
    with pytest.raises(ValueError):
        build_scene_buffers([MeshInstance(mesh, skin=skin)])


def _simple_skin_gltf(tmp_path):
    """Handcrafted minimal skinned glTF: a 6-vertex strip bound to two
    joints (root + child at y=1), child animated 0° → 90° → 0° about z
    over 2 s (loop-authored: end pose == start pose, so the importer's
    endpoint-drop resampling keeps every authored key an exact interior
    row).  Matrices/quats use glTF's column-major / xyzw conventions."""
    import base64
    import json

    pos = np.asarray([[-0.5, 0, 0], [0.5, 0, 0], [-0.5, 1, 0],
                      [0.5, 1, 0], [-0.5, 2, 0], [0.5, 2, 0]], np.float32)
    idx = np.asarray([0, 1, 2, 2, 1, 3, 2, 3, 4, 4, 3, 5], np.uint16)
    joints = np.zeros((6, 4), np.uint8)
    joints[4:, 0] = 1                      # top row fully on the child
    weights = np.zeros((6, 4), np.float32)
    weights[:, 0] = 1.0
    weights[2:4] = [0.5, 0.5, 0, 0]        # middle row blended
    joints[2:4, 1] = 1
    ibm = np.zeros((2, 16), np.float32)    # column-major mat4s
    ibm[0] = np.eye(4, dtype=np.float32).reshape(-1)
    ibm[1] = np.eye(4, dtype=np.float32).reshape(-1)
    ibm[1, 13] = -1.0                      # translation y = -1 (col-major)
    times = np.asarray([0.0, 1.0, 2.0], np.float32)
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    quats = np.asarray([[0, 0, 0, 1], [0, 0, s, c], [0, 0, 0, 1]],
                       np.float32)

    blob = b"".join(a.tobytes() for a in
                    (pos, idx, joints, weights, ibm, times, quats))
    off = {}
    o = 0
    for name, a in (("pos", pos), ("idx", idx), ("joints", joints),
                    ("weights", weights), ("ibm", ibm), ("times", times),
                    ("quats", quats)):
        off[name] = o
        o += a.nbytes

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "skin": 0},
            {"children": [2]},
            {"translation": [0, 1, 0]},
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 2, "WEIGHTS_0": 3},
            "indices": 1}]}],
        "animations": [{
            "channels": [{"sampler": 0,
                          "target": {"node": 2, "path": "rotation"}}],
            "samplers": [{"input": 5, "output": 6,
                          "interpolation": "LINEAR"}],
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 6,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 12,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5121, "count": 6,
             "type": "VEC4"},
            {"bufferView": 3, "componentType": 5126, "count": 6,
             "type": "VEC4"},
            {"bufferView": 4, "componentType": 5126, "count": 2,
             "type": "MAT4"},
            {"bufferView": 5, "componentType": 5126, "count": 3,
             "type": "SCALAR", "min": [0.0], "max": [2.0]},
            {"bufferView": 6, "componentType": 5126, "count": 3,
             "type": "VEC4"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": off[n], "byteLength": a.nbytes}
            for n, a in (("pos", pos), ("idx", idx), ("joints", joints),
                         ("weights", weights), ("ibm", ibm),
                         ("times", times), ("quats", quats))
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }],
    }
    p = tmp_path / "simple_skin.gltf"
    p.write_text(json.dumps(doc))
    return str(p), pos


def test_gltf_skin_import(tmp_path):
    from softwarerenderer_tpu.io_host import gltf

    path, pos = _simple_skin_gltf(tmp_path)
    doc = gltf.load_gltf(path)
    (mesh,) = doc["meshes"]
    skin = mesh["skin"]
    assert list(skin.parent) == [-1, 0]
    np.testing.assert_allclose(mesh["position"], pos)      # NOT baked

    # Rest pose reproduces the bind pose exactly.
    p0 = skinning.skinned_positions_np(skin, mesh["position"], 0.0)
    np.testing.assert_allclose(p0, pos, atol=1e-5)

    # The loop period equals the authored duration (2 s): sampling at
    # exactly t=2 s wraps to the start pose (ADVICE r2: wrapping modulo
    # the endpoint-inclusive ROW count would stretch the loop one frame
    # interval and hold the duplicated end pose).
    assert skin.trans.shape[0] == int(round(skin.rate * 2.0))
    ploop = skinning.skinned_positions_np(skin, mesh["position"],
                                          skin.rate * 2.0)
    np.testing.assert_allclose(ploop, p0, atol=1e-5)

    # t=1 s (an interior authored key, exactly resampled): the child
    # joint is rotated 90° about z; the fully-bound top vertex (0.5, 2, 0)
    # pivots about (0, 1, 0) → (-1, 1.5, 0).
    p1 = skinning.skinned_positions_np(skin, mesh["position"],
                                       skin.rate * 1.0)
    np.testing.assert_allclose(p1[5], [-1.0, 1.5, 0.0], atol=1e-4)
    np.testing.assert_allclose(p1[0], pos[0], atol=1e-5)   # root-bound
    # Blended middle vertex (0.5, 1, 0): child map = invbind → (0.5,0,0),
    # Rz90 → (0,0.5,0), +T(0,1,0) → (0,1.5,0); 0.5/0.5 blend with the
    # root map (rest position) → (0.25, 1.25, 0).
    np.testing.assert_allclose(p1[3], [0.25, 1.25, 0.0], atol=1e-4)


def test_gltf_skin_renders_through_model_loader(tmp_path):
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.io_host import model_loader

    path, _pos = _simple_skin_gltf(tmp_path)
    model = model_loader.load_model(path)
    insts = model_loader.model_instances(
        model, ml.translation([0.0, -1.0, -4.0]))
    assert insts[0].skin is not None
    scene = build_scene_buffers(insts)
    eng = Engine(scene, RenderParams(width=96, height=64, cull_mode=0,
                                     use_pallas=False))
    u = dict(eng.uniforms)
    u["anim_time"] = F32(0.0)
    c0 = np.asarray(eng.render(u)[0])
    u["anim_time"] = F32(1.0)
    c1 = np.asarray(eng.render(u)[0])
    assert (np.abs(c0 - c1).max(axis=-1) > 0.05).sum() > 30


def test_decompose_trs_row_roundtrip():
    """TRS → matrix → decompose recovers the components (the matrix-node
    and ancestor-fold paths in the importer rely on this)."""
    from softwarerenderer_tpu.io_host.gltf import _decompose_trs_row

    rng = np.random.default_rng(7)
    for _ in range(50):
        t = rng.uniform(-5, 5, 3).astype(F32)
        q = rng.normal(size=4).astype(F32)
        q /= np.linalg.norm(q)
        s = rng.uniform(0.2, 3.0, 3).astype(F32)
        m = skinning.compose_trs(t, q, s, xp=np)
        t2, q2, s2 = _decompose_trs_row(m)
        np.testing.assert_allclose(t2, t, atol=1e-5)
        np.testing.assert_allclose(s2, s, atol=1e-5)
        if np.dot(q2, q) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-5)


def test_resample_channel_modes():
    from softwarerenderer_tpu.io_host.gltf import _resample_channel

    times = np.asarray([0.0, 1.0, 2.0])
    vals = np.asarray([[0.0], [10.0], [20.0]])
    grid = np.asarray([0.0, 0.5, 1.0, 1.5, 2.0])
    lin = _resample_channel(times, vals, grid, "LINEAR", False)
    np.testing.assert_allclose(lin[:, 0], [0, 5, 10, 15, 20], atol=1e-6)
    stp = _resample_channel(times, vals, grid, "STEP", False)
    np.testing.assert_allclose(stp[:, 0], [0, 0, 10, 10, 20], atol=1e-6)
    # CUBICSPLINE stores (in-tangent, value, out-tangent) triplets; the
    # value thirds are taken and treated linearly.
    cs_vals = np.zeros((3, 3))
    cs_vals[:, 1] = [0.0, 10.0, 20.0]
    cub = _resample_channel(times, cs_vals.reshape(3, 3), grid,
                            "CUBICSPLINE", False)
    np.testing.assert_allclose(cub[:, 0], [0, 5, 10, 15, 20], atol=1e-6)
    # Quats hemisphere-align before interpolation: lerping q and -q must
    # not pass through zero.
    qt = np.asarray([0.0, 1.0])
    qv = np.asarray([[0, 0, 0, 1.0], [0, 0, 0, -1.0]])
    qq = _resample_channel(qt, qv, np.asarray([0.5]), "LINEAR", True)
    np.testing.assert_allclose(np.abs(qq[0, 3]), 1.0, atol=1e-6)


def test_multiple_skins_pack_and_animate_independently():
    """Three skinned instances with separate skeletons: global joint ids
    offset correctly and a PER-SKIN anim_time vector drives each clip
    independently (the crowd pattern)."""
    meshes = [arm_mesh() for _ in range(3)]
    skins = [two_bone_skin(m["position"]) for m in meshes]
    scene = build_scene_buffers(
        [MeshInstance(m, skin=s) for m, s in zip(meshes, skins)])
    assert scene["joint_parent"].tolist() == [-1, 0, -1, 2, -1, 4]
    assert scene["skin_n_frames"].tolist() == [2, 2, 2]

    vin = {k: jnp.asarray(scene[k])
           for k in ("position", "uv", "normal", "color")}
    times = np.asarray([0.0, 0.5, 1.0], np.float32)   # per-skin clocks

    out = skinning.apply_skinning(
        vin, {k: jnp.asarray(v) for k, v in scene.items()
              if k.startswith(("skin_", "joint_"))},
        {"anim_time": times}, xp=jnp)["position"]
    out = np.asarray(out)
    for i, (m, s) in enumerate(zip(meshes, skins)):
        ref = skinning.skinned_positions_np(s, m["position"],
                                            float(times[i]) * s.rate)
        np.testing.assert_allclose(out[i * 4:(i + 1) * 4], ref, atol=1e-5)


def test_level_schedule_packs_by_depth():
    """joint_level_ids groups joints by topological depth: 3 two-bone
    skins -> 2 levels x 3 wide (all roots, then all children) -- the
    crowd costs the DEPTH of one skeleton, not N*J sequential steps."""
    meshes = [arm_mesh() for _ in range(3)]
    scene = build_scene_buffers(
        [MeshInstance(m, skin=two_bone_skin(m["position"]))
         for m in meshes])
    lv = scene["joint_level_ids"]
    assert lv.shape == (2, 3)
    assert sorted(lv[0].tolist()) == [0, 2, 4]        # roots
    assert sorted(lv[1].tolist()) == [1, 3, 5]        # children


def test_level_fk_matches_sequential_fk():
    """forward_kinematics_levels computes exactly the sequential FK on a
    random branched skeleton (chain + forks), both np and jnp paths."""
    rng = np.random.default_rng(7)
    J = 17
    parent = np.full(J, -1, np.int32)
    for j in range(1, J):
        parent[j] = rng.integers(-1, j)               # topo-ordered
    local = np.asarray(rng.normal(size=(J, 4, 4)), F32)
    local[:, :, 3] = [0, 0, 0, 1]

    depth = np.zeros(J, np.int32)
    for j in range(J):
        if parent[j] >= 0:
            depth[j] = depth[parent[j]] + 1
    width = max(int((depth == d).sum()) for d in range(depth.max() + 1))
    levels = np.full((int(depth.max()) + 1, width), J, np.int32)
    for d in range(levels.shape[0]):
        ids = np.nonzero(depth == d)[0].astype(np.int32)
        levels[d, :ids.shape[0]] = ids

    ref = skinning.forward_kinematics(local, parent, xp=np)
    got = jax.jit(lambda l: skinning.forward_kinematics_levels(
        l, jnp.asarray(parent), jnp.asarray(levels), xp=jnp))(local)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
    # np path falls back to the sequential reference implementation.
    np.testing.assert_allclose(
        skinning.forward_kinematics_levels(local, parent, levels, xp=np),
        ref, atol=0)


@pytest.mark.parametrize("ext", ["gltf", "glb"])
def test_gltf_writer_skin_roundtrip(ext, tmp_path):
    """write_gltf exports skins + animation; the reloaded skeleton poses
    identically (joint slots may permute — compare skinned positions).

    The fixture's rate (1 fps) sits below the loader's 30 fps floor, so
    this also exercises the documented re-resample path: time t maps to
    frame t·rate on each side."""
    from softwarerenderer_tpu.io_host import gltf as gltf_mod

    mesh = arm_mesh()
    skin = two_bone_skin(mesh["position"])
    rec = dict(mesh, skin=skin)
    path = str(tmp_path / f"skinned.{ext}")
    gltf_mod.write_gltf(path, [rec])
    doc = gltf_mod.load_gltf(path)
    (back,) = doc["meshes"]
    assert "skin" in back, "skin did not survive the round trip"
    # skinned vertices stay authored-space: exact
    np.testing.assert_array_equal(back["position"], mesh["position"])
    bskin = back["skin"]
    assert bskin.parent.shape[0] == 2
    for t in (0.0, 0.25, 0.5, 1.0):
        want = skinning.skinned_positions_np(
            skin, mesh["position"], t * skin.rate)
        got = skinning.skinned_positions_np(
            bskin, np.asarray(back["position"]), t * bskin.rate)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_gltf_writer_skin_rate_preserving_roundtrip(tmp_path):
    """At rates ≥ the loader's floor the keyframe grid round-trips: same
    frame count, same rate, near-exact tracks."""
    from softwarerenderer_tpu.io_host import gltf as gltf_mod
    from softwarerenderer_tpu.models.scene import Skin

    rng = np.random.default_rng(3)
    J, F, rate = 3, 13, 30.0
    rot = rng.normal(size=(F, J, 4))
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    # sign-align consecutive keys (what the importer produces)
    for f in range(1, F):
        flip = (rot[f] * rot[f - 1]).sum(-1) < 0
        rot[f, flip] = -rot[f, flip]
    skin = Skin(
        joints=np.zeros((4, 4), np.int32),
        weights=np.tile(np.asarray([1, 0, 0, 0], F32), (4, 1)),
        parent=np.asarray([-1, 0, 1], np.int32),
        inverse_bind=np.tile(np.eye(4, dtype=F32), (J, 1, 1)),
        trans=rng.normal(size=(F, J, 3)).astype(F32),
        rot=rot.astype(F32),
        scale=(0.5 + rng.random((F, J, 3))).astype(F32),
        rate=rate)
    mesh = arm_mesh()
    path = str(tmp_path / "skin30.glb")
    gltf_mod.write_gltf(path, [dict(mesh, skin=skin)])
    (back,) = gltf_mod.load_gltf(path)["meshes"]
    bskin = back["skin"]
    assert bskin.trans.shape[0] == F
    assert abs(bskin.rate - rate) < 1e-3
    # chain parent[j]=j-1 has strictly increasing depth → no permutation
    np.testing.assert_array_equal(bskin.parent, skin.parent)
    np.testing.assert_allclose(bskin.trans, skin.trans, atol=1e-5)
    np.testing.assert_allclose(bskin.scale, skin.scale, atol=1e-5)
    # quats may come back sign-flipped; compare up to sign
    dots = np.sum(bskin.rot * skin.rot, axis=-1)
    np.testing.assert_allclose(np.abs(dots), 1.0, atol=1e-5)
    np.testing.assert_allclose(bskin.inverse_bind, skin.inverse_bind,
                               atol=1e-6)


def _rigid_anim_gltf(tmp_path):
    """A plain (non-skinned) quad on a node that spins 0°→90°→180°→
    270°→360° about z over 2 s, under a parent translated (0, 0, -2).
    Loop-authored at 2 fps (re-resampled to the importer's 30 fps
    floor)."""
    import base64
    import json

    pos = np.asarray([[1, 0, 0], [2, 0, 0], [1, 1, 0], [2, 1, 0]],
                     np.float32)
    idx = np.asarray([0, 1, 2, 2, 1, 3], np.uint16)
    times = np.asarray([0.0, 0.5, 1.0, 1.5, 2.0], np.float32)
    ang = np.asarray([0, 0.5, 1.0, 1.5, 2.0]) * np.pi / 2
    quats = np.stack([np.zeros(5), np.zeros(5),
                      np.sin(ang / 2), np.cos(ang / 2)], -1) \
        .astype(np.float32)
    blob = pos.tobytes() + idx.tobytes() + times.tobytes() + quats.tobytes()
    o_i, o_t, o_q = pos.nbytes, pos.nbytes + idx.nbytes, \
        pos.nbytes + idx.nbytes + times.nbytes
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"translation": [0, 0, -2], "children": [1]},
                  {"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1}]}],
        "animations": [{
            "channels": [{"sampler": 0,
                          "target": {"node": 1, "path": "rotation"}}],
            "samplers": [{"input": 2, "output": 3,
                          "interpolation": "LINEAR"}],
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 5,
             "type": "SCALAR", "min": [0.0], "max": [2.0]},
            {"bufferView": 3, "componentType": 5126, "count": 5,
             "type": "VEC4"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": o_i, "byteLength": idx.nbytes},
            {"buffer": 0, "byteOffset": o_t, "byteLength": times.nbytes},
            {"buffer": 0, "byteOffset": o_q, "byteLength": quats.nbytes},
        ],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
    }
    path = str(tmp_path / "rigid.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    return path, pos


def test_rigid_node_animation_imports_as_one_joint_skin(tmp_path):
    """Node-TRS animations on non-skinned meshes (rigid-body animation —
    ignored before this round) evaluate on device via a synthesized
    1-joint skin: at time t the quad is rotated by the authored angle and
    carried by the static parent translation."""
    from softwarerenderer_tpu.io_host import gltf as gltf_mod

    path, pos = _rigid_anim_gltf(tmp_path)
    (mesh,) = gltf_mod.load_gltf(path)["meshes"]
    assert "skin" in mesh
    sk = mesh["skin"]
    assert sk.parent.shape[0] == 1 and abs(sk.rate - 30.0) < 1e-6
    assert sk.trans.shape[0] == 60          # 2 s @ 30 fps, endpoint dropped
    np.testing.assert_array_equal(mesh["position"], pos)  # authored-local

    for t in (0.0, 0.25, 0.5, 1.0, 1.75):
        got = skinning.skinned_positions_np(sk, pos, t * sk.rate)
        a = t * np.pi / 2                   # 90°/s about z
        rotm = np.asarray([[np.cos(a), np.sin(a), 0],
                           [-np.sin(a), np.cos(a), 0],
                           [0, 0, 1]], np.float32)
        want = pos @ rotm + np.float32([0, 0, -2])
        np.testing.assert_allclose(got, want, atol=2e-3)

    # opt-out restores the round-2 static bake (rest pose, transform baked)
    (static,) = gltf_mod.load_gltf(path, rigid_animation=False)["meshes"]
    assert "skin" not in static
    np.testing.assert_allclose(static["position"],
                               pos + np.float32([0, 0, -2]), atol=1e-6)


def test_rigid_node_animation_renders_and_moves(tmp_path):
    """Engine integration: the spinning quad's silhouette moves with the
    traced anim_time clock inside one jitted program."""
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.io_host import gltf as gltf_mod
    from softwarerenderer_tpu.models.scene import MeshInstance

    path, _pos = _rigid_anim_gltf(tmp_path)
    (mesh,) = gltf_mod.load_gltf(path)["meshes"]
    inst = MeshInstance({k: mesh[k] for k in
                         ("position", "uv", "normal", "color", "indices")},
                        skin=mesh["skin"])
    scene = build_scene_buffers([inst])
    eng = Engine(scene, RenderParams(width=96, height=72))
    u = dict(eng.uniforms)
    u["camera_position"] = np.float32([1.0, 0.5, 3.0])

    def frame(t):
        u["anim_time"] = np.float32(t)
        c, d = map(np.asarray, eng.render(u))
        return d > -1e30

    f0, f1 = frame(0.0), frame(1.0)         # 0° vs 90°
    assert f0.sum() > 40 and f1.sum() > 40
    assert np.any(f0 != f1), "quad did not move with anim_time"


def test_load_model_threads_rigid_animation_flag(tmp_path):
    """model_loader.load_model(rigid_animation=False) statically bakes
    animated nodes (for collision/hitscan consumers of PACKED positions)
    and caches the two variants separately."""
    from softwarerenderer_tpu.io_host import model_loader
    from tests.test_skinning import _rigid_anim_gltf  # self-import ok

    path, pos = _rigid_anim_gltf(tmp_path)
    model_loader.clear_caches()
    animated = model_loader.load_model(path)
    static = model_loader.load_model(path, rigid_animation=False)
    assert "skin" in animated.meshes[0]
    assert "skin" not in static.meshes[0]
    np.testing.assert_allclose(static.meshes[0]["position"],
                               pos + np.float32([0, 0, -2]), atol=1e-6)
    # distinct cache entries: same objects on repeat loads
    assert model_loader.load_model(path) is animated
    assert model_loader.load_model(path, rigid_animation=False) is static
