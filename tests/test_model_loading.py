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


def test_flipbook_animation_on_device():
    """Frame-indexed vertex stacks animate inside the jitted frame
    (ModelLoader.cs:331-348 → anim_frame uniform): frame f must render
    frame-f geometry, with no recompile between frames."""
    import functools
    import jax
    import jax.numpy as jnp
    from softwarerenderer_tpu import RenderParams
    from softwarerenderer_tpu.engine import default_frame_uniforms, \
        render_frame
    from softwarerenderer_tpu.models import primitives, scene as scene_mod
    from softwarerenderer_tpu.utils import mathlib as ml

    base = primitives.cube(0.5)
    # 3 frames: the cube at x = -1, 0, +1
    stacks = np.stack([base["position"] + np.float32([dx, 0, 0])
                       for dx in (-1.0, 0.0, 1.0)])
    inst = scene_mod.MeshInstance(base, ml.translation([0, 0, -5]),
                                  animation_positions=stacks)
    sc = scene_mod.build_scene_buffers([inst])
    assert sc["anim_positions"].shape == (3, base["position"].shape[0], 3)

    params = RenderParams(width=96, height=64)
    frame = jax.jit(functools.partial(render_frame, params=params))
    u = default_frame_uniforms(96, 64)

    from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR
    covered = []
    for f in range(4):
        u["anim_frame"] = np.int32(f)
        c, d = frame(sc, u)
        cov = np.asarray(d) != np.float32(DEPTH_CLEAR)
        xs = np.nonzero(cov.any(axis=0))[0]
        covered.append((xs.min(), xs.max()))
    # frame 0 leftmost, frame 1 centered, frame 2 rightmost; frame 3 wraps
    assert covered[0][0] < covered[1][0] < covered[2][0]
    assert covered[3] == covered[0]          # modulo n_frames wrap
    # no recompile between frames: the jitted fn was traced once
    assert frame._cache_size() == 1


def test_flipbook_clock_matches_reference_timing():
    """advance_animation accumulates at fixed FPS exactly like
    PlayAnimation (ModelLoader.cs:331-348)."""
    from softwarerenderer_tpu.io_host.model_loader import Model
    m = Model(animation_frames=[Model(), Model(), Model()])
    assert m.advance_animation(1.0 / 60.0, fps=30) == 0   # half a frame
    assert m.advance_animation(1.0 / 60.0, fps=30) == 1   # full frame
    assert m.advance_animation(2.0 / 30.0, fps=30) == 0   # +2 wraps (3 total)


# ---------------------------------------------------------------------------
# STL / PLY first-party importers (the reference reaches these formats
# through Assimp, ModelLoader.cs:144-150)
# ---------------------------------------------------------------------------

def _tetra_verts():
    return np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                      np.float32)


def test_load_stl_binary(tmp_path):
    import struct
    from softwarerenderer_tpu.io_host.model_loader import load_stl
    v = _tetra_verts()
    tris = [(v[0], v[1], v[2]), (v[0], v[1], v[3])]
    path = tmp_path / "t.stl"
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for a, b, c in tris:
            f.write(struct.pack("<3f", 0, 0, 0))      # zero normal: recompute
            for p in (a, b, c):
                f.write(struct.pack("<3f", *p))
            f.write(struct.pack("<H", 0))
    doc = load_stl(str(path))
    m = doc["meshes"][0]
    assert m["position"].shape == (6, 3)
    assert m["indices"].shape == (2, 3)
    # zero facet normals recomputed from winding: first tri is the z=0
    # plane with CCW winding → +z
    n0 = m["normal"][0]
    np.testing.assert_allclose(np.abs(n0), [0, 0, 1], atol=1e-6)
    assert np.isfinite(m["bounds_radius"]) and m["bounds_radius"] > 0


def test_load_stl_ascii(tmp_path):
    from softwarerenderer_tpu.io_host.model_loader import load_stl
    path = tmp_path / "t.stl"
    path.write_text("""solid tri
facet normal 0 0 1
  outer loop
    vertex 0 0 0
    vertex 1 0 0
    vertex 0 1 0
  endloop
endfacet
endsolid tri
""")
    doc = load_stl(str(path))
    m = doc["meshes"][0]
    assert m["position"].shape == (3, 3)
    np.testing.assert_allclose(m["normal"][0], [0, 0, 1])


def test_load_ply_ascii(tmp_path):
    from softwarerenderer_tpu.io_host.model_loader import load_ply
    path = tmp_path / "t.ply"
    path.write_text("""ply
format ascii 1.0
comment quad with colors and uv
element vertex 4
property float x
property float y
property float z
property float s
property float t
property uchar red
property uchar green
property uchar blue
element face 1
property list uchar int vertex_indices
end_header
0 0 0 0 0 255 0 0
1 0 0 1 0 0 255 0
1 1 0 1 1 0 0 255
0 1 0 0 1 255 255 255
4 0 1 2 3
""")
    doc = load_ply(str(path))
    m = doc["meshes"][0]
    assert m["position"].shape == (4, 3)
    assert m["indices"].shape == (2, 3)           # quad fan-triangulated
    np.testing.assert_allclose(m["color"][0], [1, 0, 0, 1])
    np.testing.assert_allclose(m["color"][1], [0, 1, 0, 1])
    # FlipUVs: t=1 maps to v=0
    np.testing.assert_allclose(m["uv"][2], [1, 0])


def test_load_ply_binary(tmp_path):
    import struct
    from softwarerenderer_tpu.io_host.model_loader import load_ply
    path = tmp_path / "t.ply"
    header = b"""ply
format binary_little_endian 1.0
element vertex 3
property float x
property float y
property float z
property float nx
property float ny
property float nz
element face 1
property list uchar int vertex_indices
end_header
"""
    body = b""
    for p, n in [((0, 0, 0), (0, 0, 1)), ((1, 0, 0), (0, 0, 1)),
                 ((0, 1, 0), (0, 0, 1))]:
        body += struct.pack("<6f", *p, *n)
    body += struct.pack("<B3i", 3, 0, 1, 2)
    path.write_bytes(header + body)
    doc = load_ply(str(path))
    m = doc["meshes"][0]
    assert m["position"].shape == (3, 3)
    np.testing.assert_allclose(m["normal"], [[0, 0, 1]] * 3)
    assert m["indices"].tolist() == [[0, 1, 2]]


def test_load_model_dispatches_stl_ply(tmp_path):
    from softwarerenderer_tpu.io_host import model_loader
    model_loader.clear_caches()
    path = tmp_path / "d.stl"
    import struct
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", 1))
        f.write(struct.pack("<3f", 0, 0, 1))
        for p in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
            f.write(struct.pack("<3f", *p))
        f.write(struct.pack("<H", 0))
    model = model_loader.load_model(str(path))
    assert len(model.meshes) == 1
    assert model.meshes[0]["indices"].shape == (1, 3)
