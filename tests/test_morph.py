"""Morph targets (blend shapes): packing, device blend, glTF round trip
(beyond the reference, which ignores glTF `targets` entirely —
ModelLoader.cs:137-326)."""

import base64
import json
import os

import numpy as np
import pytest

from softwarerenderer_tpu.models.scene import MeshInstance, \
    build_scene_buffers
from softwarerenderer_tpu.ops import morph as morph_mod

F32 = np.float32


def quad_mesh():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], F32)
    return {
        "position": pos,
        "uv": np.zeros((4, 2), F32),
        "normal": np.tile(np.asarray([[0, 0, 1]], F32), (4, 1)),
        "color": np.ones((4, 4), F32),
        "indices": np.asarray([[0, 1, 2], [2, 1, 3]], np.int32),
    }


def two_target_morph(weight_track=None, rate=30.0):
    """Target 0 lifts +z per vertex index; target 1 shifts +x uniformly."""
    dp = np.zeros((2, 4, 3), F32)
    dp[0, :, 2] = [0.0, 1.0, 2.0, 3.0]
    dp[1, :, 0] = 1.0
    return {"pos": dp, "nrm": None, "weights": np.asarray([0.25, 0.5], F32),
            "weight_track": weight_track, "rate": rate}


def test_pack_and_apply_defaults():
    mesh = quad_mesh()
    mo = two_target_morph()
    scene = build_scene_buffers([MeshInstance(mesh, morph=mo)])
    assert scene["morph_deltas_pos"].shape == (4, 2, 3)
    vin = {"position": scene["position"], "normal": scene["normal"]}
    out = morph_mod.apply_morphs(vin, scene, {}, xp=np)
    want = morph_mod.morphed_positions_np(mo, mesh["position"],
                                          mo["weights"])
    np.testing.assert_allclose(out["position"], want, atol=1e-6)
    # uniform override wins
    out2 = morph_mod.apply_morphs(
        vin, scene, {"morph_weights": np.asarray([[1.0, 0.0]], F32)},
        xp=np)
    np.testing.assert_allclose(
        out2["position"],
        morph_mod.morphed_positions_np(mo, mesh["position"], [1.0, 0.0]),
        atol=1e-6)


def test_weight_track_sampling():
    """An animated track lerps between keys on the anim_time clock and
    wraps modulo its frame count."""
    track = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], F32)  # 3 keys
    mo = two_target_morph(weight_track=track, rate=1.0)
    mesh = quad_mesh()
    scene = build_scene_buffers([MeshInstance(mesh, morph=mo)])
    vin = {"position": scene["position"], "normal": scene["normal"]}

    def at(t):
        return morph_mod.apply_morphs(
            vin, scene, {"anim_time": np.float32(t)}, xp=np)["position"]

    np.testing.assert_allclose(
        at(0.0), morph_mod.morphed_positions_np(mo, mesh["position"],
                                                [0.0, 0.0]), atol=1e-6)
    np.testing.assert_allclose(
        at(0.5), morph_mod.morphed_positions_np(mo, mesh["position"],
                                                [0.5, 0.0]), atol=1e-6)
    np.testing.assert_allclose(
        at(1.5), morph_mod.morphed_positions_np(mo, mesh["position"],
                                                [0.5, 0.5]), atol=1e-6)
    # frame 2.5 wraps toward frame 0: lerp([0,1], [0,0], 0.5)
    np.testing.assert_allclose(
        at(2.5), morph_mod.morphed_positions_np(mo, mesh["position"],
                                                [0.0, 0.5]), atol=1e-6)


def test_mixed_scene_padding():
    """Meshes with different K pack together; the padded slots never
    displace (zero delta, zero weight)."""
    m1, m2 = quad_mesh(), quad_mesh()
    mo1 = two_target_morph()                      # K = 2
    dp = np.zeros((1, 4, 3), F32)
    dp[0, :, 1] = 2.0
    mo2 = {"pos": dp, "nrm": None, "weights": np.asarray([1.0], F32),
           "weight_track": None, "rate": 30.0}    # K = 1
    scene = build_scene_buffers([
        MeshInstance(m1, morph=mo1),
        MeshInstance(m2, np.eye(4, dtype=F32), morph=mo2)])
    assert scene["morph_deltas_pos"].shape == (8, 2, 3)
    vin = {"position": scene["position"], "normal": scene["normal"]}
    out = morph_mod.apply_morphs(vin, scene, {}, xp=np)
    np.testing.assert_allclose(
        out["position"][:4],
        morph_mod.morphed_positions_np(mo1, m1["position"],
                                       mo1["weights"]), atol=1e-6)
    np.testing.assert_allclose(
        out["position"][4:],
        morph_mod.morphed_positions_np(mo2, m2["position"], [1.0]),
        atol=1e-6)


def _morph_gltf(tmp_path, animate=True):
    """Handcrafted glTF: the quad with two morph targets, default weights
    (0.25, 0.5), optionally weights animated (0,0)→(1,0)→(0,1) over 2 s,
    under a node translated (0, 0, -1) (deltas must rotate, not
    translate, with the bake)."""
    mesh = quad_mesh()
    pos = mesh["position"]
    idx = np.asarray(mesh["indices"], np.uint16).reshape(-1)
    dp0 = np.zeros((4, 3), F32)
    dp0[:, 2] = [0, 1, 2, 3]
    dp1 = np.zeros((4, 3), F32)
    dp1[:, 0] = 1.0
    times = np.asarray([0.0, 1.0, 2.0], F32)
    wvals = np.asarray([0, 0, 1, 0, 0, 1], F32)   # (T*K,) scalars
    blob = b"".join(a.tobytes() for a in (pos, idx, dp0, dp1, times, wvals))
    off = np.cumsum([0, pos.nbytes, idx.nbytes, dp0.nbytes, dp1.nbytes,
                     times.nbytes])
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0, 0, -1]}],
        "meshes": [{"weights": [0.25, 0.5], "primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1,
            "targets": [{"POSITION": 2}, {"POSITION": 3}]}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 3, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 4, "componentType": 5126, "count": 3,
             "type": "SCALAR", "min": [0.0], "max": [2.0]},
            {"bufferView": 5, "componentType": 5126, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": int(off[i]),
             "byteLength": int(n)}
            for i, n in enumerate((pos.nbytes, idx.nbytes, dp0.nbytes,
                                   dp1.nbytes, times.nbytes,
                                   wvals.nbytes))
        ],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
    }
    if animate:
        doc["animations"] = [{
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "weights"}}],
            "samplers": [{"input": 4, "output": 5,
                          "interpolation": "LINEAR"}],
        }]
    path = str(tmp_path / "morph.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def test_gltf_morph_import(tmp_path):
    from softwarerenderer_tpu.io_host import gltf as gltf_mod

    (mesh,) = gltf_mod.load_gltf(_morph_gltf(tmp_path))["meshes"]
    assert "morph" in mesh and "skin" not in mesh   # weights-only anim
    mo = mesh["morph"]
    assert mo["pos"].shape == (2, 4, 3)
    np.testing.assert_allclose(mo["weights"], [0.25, 0.5], atol=1e-6)
    # translation baked into positions, NOT into the deltas
    np.testing.assert_allclose(mesh["position"][:, 2], -1.0, atol=1e-6)
    np.testing.assert_allclose(mo["pos"][0][:, 2], [0, 1, 2, 3],
                               atol=1e-6)
    # animated weights resampled to the 30 fps floor, endpoint dropped
    assert mo["weight_track"].shape == (60, 2)
    np.testing.assert_allclose(mo["weight_track"][15], [0.5, 0.0],
                               atol=1e-5)     # t = 0.5: (0,0) → (1,0)
    np.testing.assert_allclose(mo["weight_track"][30], [1.0, 0.0],
                               atol=1e-5)     # t = 1.0: key 1
    np.testing.assert_allclose(mo["weight_track"][45], [0.5, 0.5],
                               atol=1e-5)     # t = 1.5: (1,0) → (0,1)


def test_gltf_morph_writer_roundtrip(tmp_path):
    from softwarerenderer_tpu.io_host import gltf as gltf_mod

    (mesh,) = gltf_mod.load_gltf(_morph_gltf(tmp_path))["meshes"]
    out = str(tmp_path / "rt.glb")
    gltf_mod.write_gltf(out, [mesh])
    (back,) = gltf_mod.load_gltf(out)["meshes"]
    assert "morph" in back
    np.testing.assert_array_equal(back["morph"]["pos"], mesh["morph"]["pos"])
    np.testing.assert_allclose(back["morph"]["weights"],
                               mesh["morph"]["weights"], atol=1e-6)
    np.testing.assert_allclose(back["morph"]["weight_track"],
                               mesh["morph"]["weight_track"], atol=1e-4)
    assert abs(back["morph"]["rate"] - mesh["morph"]["rate"]) < 1e-3


def test_morph_renders_and_animates(tmp_path):
    """Engine integration: the morphing quad's silhouette moves with
    anim_time inside one jitted program (through model_instances)."""
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import Engine
    from softwarerenderer_tpu.io_host import model_loader

    model_loader.clear_caches()
    model = model_loader.load_model(_morph_gltf(tmp_path))
    insts = model_loader.model_instances(model)
    assert insts[0].morph is not None
    scene = build_scene_buffers(insts)
    eng = Engine(scene, RenderParams(width=96, height=72))
    u = dict(eng.uniforms)
    u["camera_position"] = np.float32([0.5, 0.5, 3.0])

    def covered(t):
        u["anim_time"] = np.float32(t)
        _c, d = map(np.asarray, eng.render(u))
        return d > -1e30

    f0, f1 = covered(0.0), covered(1.0)
    assert f0.sum() > 40 and f1.sum() > 40
    assert np.any(f0 != f1), "morph weights did not move the quad"


def test_morph_clock_with_per_skin_anim_time_vector():
    """Regression: a per-SKIN anim_time clock vector (ops/skinning) in a
    scene that also has morph weight tracks must not break the morph
    clock — morph slots fall back to the vector's first element, and
    uniforms['morph_time'] gives per-slot morph clocks."""
    track = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], F32)
    mo = two_target_morph(weight_track=track, rate=1.0)
    mesh = quad_mesh()
    scene = build_scene_buffers([MeshInstance(mesh, morph=mo)])
    vin = {"position": scene["position"], "normal": scene["normal"]}

    # 3-entry per-skin vector vs 1 morph slot: no crash, first element
    out = morph_mod.apply_morphs(
        vin, scene, {"anim_time": np.float32([0.5, 9.0, 9.0])}, xp=np)
    want = morph_mod.morphed_positions_np(mo, mesh["position"],
                                          [0.5, 0.0])
    np.testing.assert_allclose(out["position"], want, atol=1e-6)
    # morph_time overrides anim_time for the morph clock
    out2 = morph_mod.apply_morphs(
        vin, scene, {"anim_time": np.float32([9.0, 9.0]),
                     "morph_time": np.float32(1.5)}, xp=np)
    np.testing.assert_allclose(
        out2["position"],
        morph_mod.morphed_positions_np(mo, mesh["position"], [0.5, 0.5]),
        atol=1e-6)


def test_sparse_accessor_morph_targets(tmp_path):
    """Regression: Blender's default morph export uses SPARSE accessors
    for target deltas — they must decode (not abort the import)."""
    from softwarerenderer_tpu.io_host import gltf as gltf_mod

    mesh = quad_mesh()
    pos = mesh["position"]
    idx = np.asarray(mesh["indices"], np.uint16).reshape(-1)
    sp_idx = np.asarray([1, 3], np.uint16)          # verts 1 and 3 move
    sp_val = np.asarray([[0, 0, 2], [0, 0, 4]], F32)
    blob = pos.tobytes() + idx.tobytes() + sp_idx.tobytes() \
        + sp_val.tobytes()
    o = np.cumsum([0, pos.nbytes, idx.nbytes, sp_idx.nbytes])
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1,
            "targets": [{"POSITION": 2}]}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"componentType": 5126, "count": 4, "type": "VEC3",
             "sparse": {"count": 2,
                        "indices": {"bufferView": 2,
                                    "componentType": 5123},
                        "values": {"bufferView": 3}}},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": int(o[0]),
             "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": int(o[1]),
             "byteLength": idx.nbytes},
            {"buffer": 0, "byteOffset": int(o[2]),
             "byteLength": sp_idx.nbytes},
            {"buffer": 0, "byteOffset": int(o[3]),
             "byteLength": sp_val.nbytes},
        ],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + __import__("base64").b64encode(blob)
                            .decode()}],
    }
    path = str(tmp_path / "sparse.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    (back,) = gltf_mod.load_gltf(path)["meshes"]
    dp = back["morph"]["pos"][0]
    np.testing.assert_allclose(dp[1], [0, 0, 2], atol=1e-6)
    np.testing.assert_allclose(dp[3], [0, 0, 4], atol=1e-6)
    np.testing.assert_allclose(dp[[0, 2]], 0.0, atol=1e-6)
