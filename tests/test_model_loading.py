"""Asset pipeline tests: glTF importer, OBJ parser, caches, animation."""

import base64
import json
import os
import struct

import numpy as np
import pytest

from softwarerenderer_tpu.io_host import gltf, model_loader
from softwarerenderer_tpu.models import primitives

REF_ASSETS = "/root/reference/OutputAssets/Assets"


def write_min_gltf(path, translation=None, matrix=None, color4=False):
    """A one-triangle glTF with an embedded base64 buffer."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    nrm = np.tile(np.float32([0, 0, 1]), (3, 1))
    idx = np.array([0, 1, 2], np.uint16)
    col = np.ones((3, 4 if color4 else 3), np.float32) * 0.5
    blob = (pos.tobytes() + uv.tobytes() + nrm.tobytes() + col.tobytes()
            + idx.tobytes())
    node = {"mesh": 0}
    if translation:
        node["translation"] = translation
    if matrix:
        node["matrix"] = matrix
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1, "NORMAL": 2,
                           "COLOR_0": 3},
            "indices": 4, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1, 0, 0, 1], "metallicFactor": 0.25,
            "roughnessFactor": 0.75}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 3, "componentType": 5126, "count": 3,
             "type": "VEC4" if color4 else "VEC3"},
            {"bufferView": 4, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 24},
            {"buffer": 0, "byteOffset": 60, "byteLength": 36},
            {"buffer": 0, "byteOffset": 96,
             "byteLength": col.nbytes},
            {"buffer": 0, "byteOffset": 96 + col.nbytes, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode()}],
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def test_min_gltf_roundtrip(tmp_path):
    p = str(tmp_path / "tri.gltf")
    write_min_gltf(p)
    doc = gltf.load_gltf(p)
    assert len(doc["meshes"]) == 1
    m = doc["meshes"][0]
    np.testing.assert_allclose(m["position"],
                               [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    # UV V-flip (Assimp FlipUVs, ModelLoader.cs:148)
    np.testing.assert_allclose(m["uv"], [[0, 1], [1, 1], [0, 0]])
    np.testing.assert_allclose(m["color"][:, :3], 0.5)
    assert m["indices"].shape == (1, 3)
    assert m["material"].base_color == (1, 0, 0, 1)
    assert m["material"].metallic == 0.25


def test_node_transform_baked(tmp_path):
    p = str(tmp_path / "moved.gltf")
    write_min_gltf(p, translation=[5.0, 0.0, 0.0])
    m = gltf.load_gltf(p)["meshes"][0]
    np.testing.assert_allclose(m["position"][0], [5, 0, 0], atol=1e-6)


def test_vec3_color_padded_to_rgba(tmp_path):
    p = str(tmp_path / "c3.gltf")
    write_min_gltf(p, color4=False)
    m = gltf.load_gltf(p)["meshes"][0]
    assert m["color"].shape == (3, 4)
    np.testing.assert_allclose(m["color"][:, 3], 1.0)


@pytest.mark.skipif(not os.path.exists(REF_ASSETS),
                    reason="reference assets unavailable")
def test_reference_assets_load_with_expected_counts():
    d = model_loader.load_model(os.path.join(REF_ASSETS, "dust2",
                                             "scene.gltf"))
    assert len(d.meshes) == 11
    assert sum(m["indices"].shape[0] for m in d.meshes) == 9061
    g = model_loader.load_model(os.path.join(REF_ASSETS, "Gun",
                                             "scene.gltf"))
    assert sum(m["indices"].shape[0] for m in g.meshes) == 3910
    p = model_loader.load_model(os.path.join(REF_ASSETS, "gordon_freeman",
                                             "scene.gltf"))
    assert sum(m["indices"].shape[0] for m in p.meshes) == 639
    # texture paths resolve against the model dir
    tex = g.meshes[0]["material"].texture_path("diffuse")
    assert tex and os.path.exists(tex)


def test_model_cache_returns_same_object(tmp_path):
    p = str(tmp_path / "tri.gltf")
    write_min_gltf(p)
    a = model_loader.load_model(p)
    b = model_loader.load_model(p)
    assert a is b


def test_directory_is_flipbook_animation(tmp_path):
    for i in range(3):
        write_min_gltf(str(tmp_path / f"frame{i}.gltf"),
                       translation=[float(i), 0.0, 0.0])
    model = model_loader.load_model(str(tmp_path))
    assert len(model.animation_frames) == 3
    # frames sorted by name; meshes default to frame 0
    np.testing.assert_allclose(model.meshes[0]["position"][0], [0, 0, 0])
    seen = []
    # PlayAnimation advances at fixed FPS (ModelLoader.cs:331-348)
    for _ in range(4):
        model.play_animation(lambda f: seen.append(
            float(f.meshes[0]["position"][0, 0])), 1.0 / 30.0, fps=30)
    assert seen == [1.0, 2.0, 0.0, 1.0]


def test_obj_parser(tmp_path):
    p = str(tmp_path / "quad.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
                "vn 0 0 1\n"
                "f 1/1/1 2/2/1 3/3/1 4/4/1\n")
    doc = model_loader.load_obj(p)
    m = doc["meshes"][0]
    assert m["indices"].shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_allclose(m["normal"][0], [0, 0, 1])
    # OBJ vt V-flip
    np.testing.assert_allclose(m["uv"][0], [0, 1])
