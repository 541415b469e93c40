"""First-party glTF 2.0 (+ GLB) importer with the reference's semantics.

Replaces the reference's native Assimp import path (ModelLoader.cs:137-326,
consumed via AssimpNet P/Invoke — SURVEY.md §2).  Matches its behavior:

  * node hierarchy flattened with GLOBAL transforms baked into vertex
    positions; normals transformed by the rotation-only upper 3×3 (NOT the
    inverse-transpose — faithful to ModelLoader.cs:164-200) and normalized
  * triangles only (glTF primitive mode 4; other modes skipped, matching
    Assimp's Triangulate post-process + the IndexCount!=3 skip at :180)
  * UV V-flip (Assimp's FlipUVs flag, ModelLoader.cs:148)
  * missing normals → zero vector, missing UVs → (0,0), missing vertex
    colors → white (ModelLoader.cs:188-194)
  * per-mesh material: baseColor, metallic (default 0), roughness (default
    0.5), emissive, texture paths resolved against the model directory
    (ModelLoader.cs:221-281)
  * KHR_lights_punctual → Light records (ModelLoader.cs:305-322)
  * int32 indices (the reference's ushort/65k-vertex limit is lifted —
    SURVEY.md §7 step 2)

Pure Python + numpy; images decode through PIL with the reference's
≤2048px downscale (Texture.cs:70-84).
"""

from __future__ import annotations

import base64
import json
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from softwarerenderer_tpu.models.scene import (
    Light,
    LightType,
    Material,
    bounding_sphere,
)

F32 = np.float32

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT2": 4, "MAT3": 9, "MAT4": 16}
_LIGHT_TYPES = {"directional": LightType.DIRECTIONAL,
                "point": LightType.POINT, "spot": LightType.SPOT}

MAX_TEXTURE_SIZE = 2048  # Texture.cs:70


class GltfError(ValueError):
    pass


def _read_glb(data: bytes) -> Tuple[dict, Optional[bytes]]:
    magic, version, _length = struct.unpack_from("<III", data, 0)
    if magic != 0x46546C67:
        raise GltfError("not a GLB file")
    offset = 12
    gltf_json, bin_chunk = None, None
    while offset < len(data):
        chunk_len, chunk_type = struct.unpack_from("<II", data, offset)
        chunk = data[offset + 8: offset + 8 + chunk_len]
        if chunk_type == 0x4E4F534A:  # JSON
            gltf_json = json.loads(chunk)
        elif chunk_type == 0x004E4942:  # BIN
            bin_chunk = chunk
        offset += 8 + chunk_len
    if gltf_json is None:
        raise GltfError("GLB missing JSON chunk")
    return gltf_json, bin_chunk


def _load_buffers(doc: dict, base_dir: str,
                  glb_bin: Optional[bytes]) -> List[bytes]:
    out = []
    for i, buf in enumerate(doc.get("buffers", [])):
        uri = buf.get("uri")
        if uri is None:
            if glb_bin is None:
                raise GltfError(f"buffer {i} has no uri and no GLB chunk")
            out.append(glb_bin)
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                out.append(f.read())
    return out


def _read_accessor(doc: dict, buffers: List[bytes], idx: int) -> np.ndarray:
    acc = doc["accessors"][idx]
    if "sparse" in acc:
        raise GltfError("sparse accessors not supported")
    n_comp = _TYPE_COUNTS[acc["type"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    count = acc["count"]
    if "bufferView" not in acc:
        return np.zeros((count, n_comp), dtype=dtype)
    view = doc["bufferViews"][acc["bufferView"]]
    data = buffers[view["buffer"]]
    start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    itemsize = np.dtype(dtype).itemsize
    elem_size = itemsize * n_comp
    stride = view.get("byteStride") or elem_size
    if stride == elem_size:
        arr = np.frombuffer(data, dtype=dtype, count=count * n_comp,
                            offset=start).reshape(count, n_comp)
    else:
        raw = np.frombuffer(data, dtype=np.uint8,
                            count=stride * (count - 1) + elem_size,
                            offset=start)
        strided = np.lib.stride_tricks.as_strided(
            raw, shape=(count, elem_size), strides=(stride, 1))
        arr = strided.reshape(-1).view(dtype).reshape(count, n_comp)
    if acc.get("normalized") and np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        arr = arr.astype(F32) / F32(max(abs(info.min), info.max))
    return np.array(arr)  # copy out of the buffer


def _node_matrix_row(node: dict) -> np.ndarray:
    """Node transform as a ROW-vector matrix (glTF stores column-vector,
    column-major — the flat list transposes directly into our layout)."""
    if "matrix" in node:
        # column-major storage read row-by-row == transpose == row-vector form
        return np.asarray(node["matrix"], dtype=F32).reshape(4, 4)
    m = np.eye(4, dtype=F32)
    s = node.get("scale")
    r = node.get("rotation")
    t = node.get("translation")
    if s is not None:
        sm = np.diag(np.asarray(list(s) + [1.0], dtype=F32))
        m = m @ sm
    if r is not None:
        from softwarerenderer_tpu.utils import mathlib as ml
        m = m @ ml.matrix_from_quaternion(np.asarray(r, dtype=F32))
    if t is not None:
        tm = np.eye(4, dtype=F32)
        tm[3, :3] = np.asarray(t, dtype=F32)
        m = m @ tm
    return m


def _extract_material(doc: dict, base_dir: str, mi: Optional[int]) -> Material:
    if mi is None:
        return Material()
    mat = doc.get("materials", [])[mi]
    pbr = mat.get("pbrMetallicRoughness", {})
    base = tuple(pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0]))
    metallic = float(pbr.get("metallicFactor", 0.0))
    roughness = float(pbr.get("roughnessFactor", 0.5))
    emissive = tuple(mat.get("emissiveFactor", [0.0, 0.0, 0.0]))
    paths = []
    def tex_path(info, slot):
        if not info:
            return
        tex = doc["textures"][info["index"]]
        img_idx = tex.get("source")
        if img_idx is None:
            return
        uri = doc["images"][img_idx].get("uri")
        if uri and not uri.startswith("data:"):
            paths.append((slot, os.path.join(base_dir, uri)))
    tex_path(pbr.get("baseColorTexture"), "diffuse")
    tex_path(mat.get("normalTexture"), "normals")
    tex_path(mat.get("emissiveTexture"), "emissive")
    return Material(base_color=base, metallic=metallic, roughness=roughness,
                    emissive=emissive, texture_paths=tuple(paths))


def load_gltf(path: str, flip_uv: bool = True) -> Dict:
    """Parse a .gltf/.glb file into {"meshes": [...], "lights": [...]}.

    Each mesh dict: position/uv/normal/color (V, K) float32 arrays with the
    node's world transform baked in, indices (T, 3) int32, material
    (models.scene.Material), bounds_center (3,), bounds_radius float.
    """
    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] == b"glTF":
        doc, glb_bin = _read_glb(data)
    else:
        doc, glb_bin = json.loads(data), None
    buffers = _load_buffers(doc, base_dir, glb_bin)

    meshes: List[Dict] = []

    def process_node(node_idx: int, parent: np.ndarray):
        node = doc["nodes"][node_idx]
        global_m = _node_matrix_row(node) @ parent
        rot_only = global_m.copy()
        rot_only[3, :] = [0, 0, 0, 1]
        rot_only[:, 3] = [0, 0, 0, 1]
        if "mesh" in node:
            gmesh = doc["meshes"][node["mesh"]]
            for prim in gmesh.get("primitives", []):
                if prim.get("mode", 4) != 4:
                    continue  # non-triangles skipped (ModelLoader.cs:180)
                attrs = prim["attributes"]
                pos = _read_accessor(doc, buffers, attrs["POSITION"]) \
                    .astype(F32)
                v = pos.shape[0]
                normal = (_read_accessor(doc, buffers, attrs["NORMAL"])
                          .astype(F32) if "NORMAL" in attrs
                          else np.zeros((v, 3), dtype=F32))
                uv = (_read_accessor(doc, buffers, attrs["TEXCOORD_0"])
                      .astype(F32)[:, :2] if "TEXCOORD_0" in attrs
                      else np.zeros((v, 2), dtype=F32))
                if "COLOR_0" in attrs:
                    col = _read_accessor(doc, buffers,
                                         attrs["COLOR_0"]).astype(F32)
                    if col.shape[1] == 3:
                        col = np.concatenate(
                            [col, np.ones((v, 1), dtype=F32)], axis=1)
                else:
                    col = np.ones((v, 4), dtype=F32)
                if flip_uv:
                    uv = uv.copy()
                    uv[:, 1] = F32(1.0) - uv[:, 1]
                if "indices" in prim:
                    idx = _read_accessor(
                        doc, buffers, prim["indices"]).reshape(-1)
                else:
                    idx = np.arange(v, dtype=np.uint32)
                idx = idx.astype(np.int32)
                if idx.shape[0] % 3:
                    idx = idx[: idx.shape[0] - idx.shape[0] % 3]

                # Bake world transform (ModelLoader.cs:196-200) — native
                # C++ kernels when built, NumPy otherwise.
                from softwarerenderer_tpu.native import (bake_normals,
                                                         bake_positions)
                wpos = bake_positions(pos, global_m)
                wn = bake_normals(normal, rot_only)

                center, radius = bounding_sphere(wpos)
                meshes.append({
                    "position": wpos,
                    "uv": uv.astype(F32),
                    "normal": wn,
                    "color": col,
                    "indices": idx.reshape(-1, 3),
                    "material": _extract_material(
                        doc, base_dir, prim.get("material")),
                    "bounds_center": center,
                    "bounds_radius": radius,
                })
        for child in node.get("children", []):
            process_node(child, global_m)

    scene_idx = doc.get("scene", 0)
    scenes = doc.get("scenes", [{"nodes": list(range(len(doc.get("nodes",
                                                                 []))))}])
    roots = scenes[scene_idx].get("nodes", [])
    for r in roots:
        process_node(r, np.eye(4, dtype=F32))

    lights: List[Light] = []
    ext = doc.get("extensions", {}).get("KHR_lights_punctual", {})
    for l in ext.get("lights", []):
        lights.append(Light(
            color=tuple(l.get("color", [1.0, 1.0, 1.0])),
            light_type=_LIGHT_TYPES.get(l.get("type"), LightType.POINT),
            spot_inner=float(l.get("spot", {}).get("innerConeAngle", 0.0)),
            spot_outer=float(l.get("spot", {}).get("outerConeAngle", 0.0)),
        ))
    return {"meshes": meshes, "lights": lights}


def load_image(path: str) -> Optional[np.ndarray]:
    """Decode an image to (H, W, 4) float32 in [0,1], downscaled to fit
    MAX_TEXTURE_SIZE preserving aspect (Texture.cs:70-94).  Returns None on
    failure (the reference logs and continues, Texture.cs:89-93)."""
    try:
        from PIL import Image
        with Image.open(path) as im:
            im = im.convert("RGBA")
            w, h = im.size
            if w > MAX_TEXTURE_SIZE or h > MAX_TEXTURE_SIZE:
                s = min(MAX_TEXTURE_SIZE / w, MAX_TEXTURE_SIZE / h)
                im = im.resize((max(1, int(w * s)), max(1, int(h * s))))
            return np.asarray(im, dtype=np.uint8).astype(F32) / F32(255.0)
    except Exception:
        return None
