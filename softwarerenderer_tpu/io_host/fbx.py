"""First-party binary FBX importer (+ a minimal writer).

The reference reaches FBX through Assimp (/root/reference/ModelLoader.cs:
144-150); this module reads the common binary FBX 7.x subset directly:

  * the node-record container format (7.0-7.4 u32 offsets, ≥7.5 u64),
    typed properties incl. zlib-deflated arrays
  * Objects/Geometry: Vertices, PolygonVertexIndex (negative-terminated
    polygons), LayerElementNormal / LayerElementUV with
    ByPolygonVertex/ByControlPoint mapping and Direct/IndexToDirect
    reference modes
  * Objects/Model: Lcl Translation / Lcl Rotation (XYZ euler degrees) /
    Lcl Scaling from Properties70, composed through the Connections
    ("OO" child→parent) hierarchy
  * Objects/Material: DiffuseColor; texture chains
    (Texture --OP--> Material, Video/RelativeFilename)
  * GlobalSettings UnitScaleFactor (FBX native units are centimeters:
    positions scale by UnitScaleFactor/100 into meters, matching
    Assimp's FbxConverter)

Output matches io_host.gltf.load_gltf ({"meshes": [...], "lights": []});
transforms bake through the same native bake_positions / rotation-only
bake_normals pipeline, so an FBX asset and its glTF twin produce
identical scene buffers.  Corner attributes are expanded per polygon
vertex (no dedup — the same choice as the STL path).

The writer (`write_fbx`) emits a minimal well-formed binary FBX 7.4
document (geometry + transform + material color) — enough for fixtures
and interchange smoke tests with this importer and Assimp-based tools.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from softwarerenderer_tpu.models.scene import Material, bounding_sphere

F32 = np.float32

_MAGIC = b"Kaydara FBX Binary  \x00\x1a\x00"

_ARRAY_TYPES = {
    b"f": ("<f4", 4), b"d": ("<f8", 8), b"l": ("<i8", 8),
    b"i": ("<i4", 4), b"b": ("<i1", 1),
}
_SCALAR_FMT = {b"Y": "<h", b"C": "<b", b"I": "<i", b"F": "<f",
               b"D": "<d", b"L": "<q"}


class FbxNode:
    __slots__ = ("name", "props", "children")

    def __init__(self, name: str, props, children):
        self.name = name
        self.props = props
        self.children = children

    def find(self, name: str) -> Optional["FbxNode"]:
        for c in self.children:
            if c.name == name:
                return c
        return None

    def find_all(self, name: str) -> List["FbxNode"]:
        return [c for c in self.children if c.name == name]


def _read_props(data: bytes, off: int, count: int):
    props = []
    for _ in range(count):
        t = data[off:off + 1]
        off += 1
        if t in _SCALAR_FMT:
            fmt = _SCALAR_FMT[t]
            size = struct.calcsize(fmt)
            props.append(struct.unpack_from(fmt, data, off)[0])
            off += size
        elif t in _ARRAY_TYPES:
            dt, _ = _ARRAY_TYPES[t]
            n, enc, clen = struct.unpack_from("<III", data, off)
            off += 12
            if enc == 1:
                raw = zlib.decompress(data[off:off + clen])
                off += clen
            else:
                raw = data[off:off + clen]
                off += clen
            props.append(np.frombuffer(raw, dt, n))
        elif t == b"S" or t == b"R":
            n = struct.unpack_from("<I", data, off)[0]
            off += 4
            raw = data[off:off + n]
            off += n
            props.append(raw.decode("utf-8", "replace") if t == b"S"
                         else raw)
        else:
            raise ValueError(f"FBX: unknown property type {t!r}")
    return props, off


def parse_fbx(data: bytes) -> Tuple[FbxNode, int]:
    """Parse the binary container into a root FbxNode; returns
    (root, version)."""
    if not data.startswith(_MAGIC[:21]):
        raise ValueError("not a binary FBX file")
    version = struct.unpack_from("<I", data, 23)[0]
    long_offsets = version >= 7500
    off = 27
    roots = []

    def read2(off):
        if long_offsets:
            end, n_props, _plen = struct.unpack_from("<QQQ", data, off)
            hdr = 24
        else:
            end, n_props, _plen = struct.unpack_from("<III", data, off)
            hdr = 12
        p = off + hdr
        name_len = data[p]
        p += 1
        if end == 0 and n_props == 0 and name_len == 0:
            return None, p
        name = data[p:p + name_len].decode("utf-8", "replace")
        p += name_len
        props, p = _read_props(data, p, n_props)
        children = []
        while p < end:
            child, p = read2(p)
            if child is None:
                break
            children.append(child)
        return FbxNode(name, props, children), end

    while off < len(data):
        node, off = read2(off)
        if node is None:
            break
        roots.append(node)
    return FbxNode("", [], roots), version


def _props70(node: FbxNode) -> Dict[str, tuple]:
    out = {}
    p70 = node.find("Properties70")
    if p70 is None:
        return out
    for p in p70.find_all("P"):
        if p.props:
            out[p.props[0]] = tuple(p.props[4:])
    return out


def _euler_xyz_row(rx, ry, rz) -> np.ndarray:
    """FBX Lcl Rotation (XYZ order, degrees) → row-vector rotation:
    v' = v @ Rx @ Ry @ Rz (X applied first)."""
    def rot(axis, deg):
        a = np.deg2rad(deg)
        c, s = np.cos(a), np.sin(a)
        m = np.eye(4)
        i, j = {"x": (1, 2), "y": (2, 0), "z": (0, 1)}[axis]
        # standard column-vector axis rotation (+θ right-handed),
        # transposed to row-vector form
        m[i, i] = c; m[j, j] = c
        m[i, j] = -s; m[j, i] = s
        return m.T
    return rot("x", rx) @ rot("y", ry) @ rot("z", rz)


def _model_local_row(model: FbxNode) -> np.ndarray:
    p = _props70(model)
    t = p.get("Lcl Translation", (0.0, 0.0, 0.0))[-3:]
    r = p.get("Lcl Rotation", (0.0, 0.0, 0.0))[-3:]
    s = p.get("Lcl Scaling", (1.0, 1.0, 1.0))[-3:]
    sm = np.diag([s[0], s[1], s[2], 1.0])
    rm = _euler_xyz_row(*r)
    tm = np.eye(4)
    tm[3, :3] = t
    return sm @ rm @ tm                        # row-vector S·R·T


def _layer_values(geom: FbxNode, layer_name: str, value_name: str,
                  index_name: str, pv_index: np.ndarray,
                  n_corners: int, width: int) -> Optional[np.ndarray]:
    """Per-corner attribute from a LayerElement (mapping + reference)."""
    layer = geom.find(layer_name)
    if layer is None:
        return None
    vals_node = layer.find(value_name)
    if vals_node is None or not vals_node.props:
        return None
    vals = np.asarray(vals_node.props[0], np.float64).reshape(-1, width)
    mapping = "ByPolygonVertex"
    ref = "Direct"
    m = layer.find("MappingInformationType")
    if m is not None and m.props:
        mapping = m.props[0]
    r = layer.find("ReferenceInformationType")
    if r is not None and r.props:
        ref = r.props[0]
    idx_node = layer.find(index_name)
    if ref == "IndexToDirect" and idx_node is not None and idx_node.props:
        idx = np.asarray(idx_node.props[0], np.int64)
        # -1 entries mean "no value" (e.g. unmapped polygon corners in a
        # partially UV-mapped mesh): zero them rather than aliasing
        # element 0
        vals = vals[np.clip(idx, 0, vals.shape[0] - 1)]
        vals = np.where((idx >= 0)[:, None], vals, 0.0)
    if mapping == "ByPolygonVertex":
        return vals[:n_corners]
    if mapping in ("ByVertex", "ByVertice", "ByControlPoint"):
        return vals[pv_index]
    if mapping == "AllSame":
        return np.broadcast_to(vals[:1], (n_corners, width))
    return None


def load_fbx(path: str, flip_uv: bool = False) -> Dict:
    """Parse a binary .fbx file into {"meshes": [...], "lights": []}.

    UV origin: FBX authors V bottom-left — already this repo's in-memory
    convention (see io_host.collada.load_dae) — so no flip by default."""
    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path, "rb") as f:
        data = f.read()
    root, _version = parse_fbx(data)

    objects = root.find("Objects")
    conns = root.find("Connections")
    if objects is None:
        return {"meshes": [], "lights": []}

    # unit scale: FBX native cm → meters
    scale = 1.0
    gs = root.find("GlobalSettings")
    if gs is not None:
        usf = _props70(gs).get("UnitScaleFactor")
        if usf:
            scale = float(usf[-1]) / 100.0

    by_id: Dict[int, FbxNode] = {}
    for obj in objects.children:
        if obj.props and isinstance(obj.props[0], int):
            by_id[obj.props[0]] = obj

    parents: Dict[int, List[int]] = {}         # child id → parent ids
    op_links: Dict[int, List[tuple]] = {}      # (child, prop) OP links
    if conns is not None:
        for c in conns.find_all("C"):
            if len(c.props) >= 3 and c.props[0] == "OO":
                parents.setdefault(c.props[1], []).append(c.props[2])
            elif len(c.props) >= 4 and c.props[0] == "OP":
                op_links.setdefault(c.props[2], []).append(
                    (c.props[1], c.props[3]))

    def model_world_row(mid: int, depth=0) -> np.ndarray:
        node = by_id.get(mid)
        if node is None or node.name != "Model" or depth > 64:
            return np.eye(4)
        local = _model_local_row(node)
        for pid in parents.get(mid, []):
            if pid == 0:
                return local
            p = by_id.get(pid)
            if p is not None and p.name == "Model":
                return local @ model_world_row(pid, depth + 1)
        return local

    # model id → Material, built ONCE (a per-geometry object scan would
    # make import O(#geometries × #objects))
    mat_of_model: Dict[int, Material] = {}
    for cid, node in by_id.items():
        if node.name != "Material":
            continue
        p = _props70(node)
        dc = p.get("DiffuseColor", (1.0, 1.0, 1.0))[-3:]
        tex_path = None
        for tid, _prop in op_links.get(cid, []):
            tnode = by_id.get(tid)
            if tnode is not None and tnode.name == "Texture":
                fn = tnode.find("RelativeFilename") \
                    or tnode.find("FileName")
                if fn is not None and fn.props:
                    tex_path = os.path.normpath(os.path.join(
                        base_dir, str(fn.props[0]).replace("\\", "/")))
        mat = Material(
            base_color=(float(dc[0]), float(dc[1]), float(dc[2]), 1.0),
            texture_paths=(("diffuse", tex_path),) if tex_path else ())
        for mid in parents.get(cid, []):
            mat_of_model.setdefault(mid, mat)

    from softwarerenderer_tpu.native import bake_normals, bake_positions

    meshes: List[Dict] = []
    for gid, geom in by_id.items():
        if geom.name != "Geometry":
            continue
        v_node = geom.find("Vertices")
        i_node = geom.find("PolygonVertexIndex")
        if v_node is None or i_node is None or not v_node.props:
            continue
        verts = np.asarray(v_node.props[0], np.float64).reshape(-1, 3)
        pvi = np.asarray(i_node.props[0], np.int64)

        # negative-terminated polygons → fan triangulation over CORNER
        # positions (preserving per-corner layer order)
        corner_vert = np.where(pvi < 0, ~pvi, pvi)
        poly_ends = np.nonzero(pvi < 0)[0]
        tri_corners = []
        start = 0
        for e in poly_ends:
            for i in range(start + 1, e):
                tri_corners.extend((start, i, i + 1))
            start = e + 1
        tri_corners = np.asarray(tri_corners, np.int64)
        n_corners = corner_vert.shape[0]

        nrm = _layer_values(geom, "LayerElementNormal", "Normals",
                            "NormalsIndex", corner_vert, n_corners, 3)
        uv = _layer_values(geom, "LayerElementUV", "UV", "UVIndex",
                           corner_vert, n_corners, 2)
        if nrm is None:
            nrm = np.zeros((n_corners, 3))
        if uv is None:
            uv = np.zeros((n_corners, 2))

        # world transform from the owning Model (first OO parent chain)
        world = np.eye(4)
        mat = Material()
        for pid in parents.get(gid, []):
            p = by_id.get(pid)
            if p is not None and p.name == "Model":
                world = model_world_row(pid)
                mat = mat_of_model.get(pid, Material())
                break
        world = world @ np.diag([scale, scale, scale, 1.0])
        rot_only = world.copy()
        rot_only[3, :] = [0, 0, 0, 1]
        rot_only[:, 3] = [0, 0, 0, 1]

        cpos = verts[corner_vert][tri_corners]
        cnrm = np.asarray(nrm, np.float64)[tri_corners]
        cuv = np.asarray(uv, np.float64)[tri_corners][:, :2]
        if flip_uv:
            cuv = cuv.copy()
            cuv[:, 1] = 1.0 - cuv[:, 1]
        wpos = bake_positions(cpos.astype(F32), world.astype(F32))
        wn = bake_normals(cnrm.astype(F32), rot_only.astype(F32))
        idx = np.arange(tri_corners.shape[0],
                        dtype=np.int32).reshape(-1, 3)
        center, radius = bounding_sphere(wpos)
        meshes.append({
            "position": wpos,
            "uv": cuv.astype(F32),
            "normal": wn,
            "color": np.ones((wpos.shape[0], 4), F32),
            "indices": idx,
            "material": mat,
            "bounds_center": center,
            "bounds_radius": radius,
        })
    return {"meshes": meshes, "lights": []}


# ---------------------------------------------------------------------------
# Minimal binary FBX writer (fixtures + interchange smoke tests)
# ---------------------------------------------------------------------------

def _w_props(props) -> bytes:
    out = b""
    for p in props:
        if isinstance(p, bool):
            out += b"C" + struct.pack("<b", 1 if p else 0)
        elif isinstance(p, int):
            out += b"L" + struct.pack("<q", p)
        elif isinstance(p, float):
            out += b"D" + struct.pack("<d", p)
        elif isinstance(p, str):
            raw = p.encode()
            out += b"S" + struct.pack("<I", len(raw)) + raw
        elif isinstance(p, np.ndarray):
            if p.dtype == np.float64:
                t, dt = b"d", "<f8"
            elif p.dtype == np.int32:
                t, dt = b"i", "<i4"
            elif p.dtype == np.int64:
                t, dt = b"l", "<i8"
            else:
                raise ValueError(f"unsupported array dtype {p.dtype}")
            raw = np.ascontiguousarray(p.reshape(-1), dt).tobytes()
            out += t + struct.pack("<III", p.size, 0, len(raw)) + raw
        else:
            raise ValueError(f"unsupported property {type(p)}")
    return out


def _w_node(name: str, props=(), children=(), base=0) -> bytes:
    pbytes = _w_props(props)
    body = name.encode()
    inner = b""
    cursor = base + 13 + len(body) + len(pbytes)
    for c in children:
        cb = _w_node(*c, base=cursor)
        inner += cb
        cursor += len(cb)
    if children:
        inner += b"\x00" * 13                  # null terminator record
        cursor += 13
    end = cursor
    return (struct.pack("<III", end, len(props), len(pbytes))
            + bytes([len(body)]) + body + pbytes + inner)


def write_fbx(path: str, positions: np.ndarray, indices: np.ndarray,
              normals: Optional[np.ndarray] = None,
              uvs: Optional[np.ndarray] = None,
              translation=(0.0, 0.0, 0.0),
              rotation_deg=(0.0, 0.0, 0.0),
              scaling=(1.0, 1.0, 1.0),
              diffuse_color=(1.0, 1.0, 1.0)) -> None:
    """Write a single-mesh binary FBX 7.4 file.

    positions (V, 3); indices (T, 3) int; normals/uvs per VERTEX
    (ByControlPoint mapping) — enough for this importer, Assimp and
    Blender to read the geometry back.
    """
    positions = np.asarray(positions, np.float64).reshape(-1, 3)
    indices = np.asarray(indices, np.int64).reshape(-1, 3)
    pvi = indices.copy()
    pvi[:, 2] = ~pvi[:, 2]                     # negative-terminate tris

    geo_children = [
        ("Vertices", (positions.reshape(-1),), ()),
        ("PolygonVertexIndex", (pvi.reshape(-1),), ()),
        ("GeometryVersion", (124,), ()),
    ]
    if normals is not None:
        normals = np.asarray(normals, np.float64).reshape(-1, 3)
        geo_children.append(("LayerElementNormal", (0,), (
            ("Version", (101,), ()),
            ("Name", ("",), ()),
            ("MappingInformationType", ("ByControlPoint",), ()),
            ("ReferenceInformationType", ("Direct",), ()),
            ("Normals", (normals.reshape(-1),), ()),
        )))
    if uvs is not None:
        uvs = np.asarray(uvs, np.float64).reshape(-1, 2)
        geo_children.append(("LayerElementUV", (0,), (
            ("Version", (101,), ()),
            ("Name", ("",), ()),
            ("MappingInformationType", ("ByControlPoint",), ()),
            ("ReferenceInformationType", ("Direct",), ()),
            ("UV", (uvs.reshape(-1),), ()),
        )))

    GEO_ID, MODEL_ID, MAT_ID = 1000001, 2000001, 3000001
    p70_model = ("Properties70", (), (
        ("P", ("Lcl Translation", "Lcl Translation", "", "A",
               float(translation[0]), float(translation[1]),
               float(translation[2])), ()),
        ("P", ("Lcl Rotation", "Lcl Rotation", "", "A",
               float(rotation_deg[0]), float(rotation_deg[1]),
               float(rotation_deg[2])), ()),
        ("P", ("Lcl Scaling", "Lcl Scaling", "", "A",
               float(scaling[0]), float(scaling[1]),
               float(scaling[2])), ()),
    ))
    p70_mat = ("Properties70", (), (
        ("P", ("DiffuseColor", "Color", "", "A",
               float(diffuse_color[0]), float(diffuse_color[1]),
               float(diffuse_color[2])), ()),
    ))
    p70_gs = ("Properties70", (), (
        ("P", ("UnitScaleFactor", "double", "Number", "", 100.0), ()),
        ("P", ("UpAxis", "int", "Integer", "", 1), ()),
    ))

    top = [
        ("FBXHeaderExtension", (), (
            ("FBXHeaderVersion", (1003,), ()),
            ("FBXVersion", (7400,), ()),
        )),
        ("GlobalSettings", (), (("Version", (1000,), ()), p70_gs)),
        ("Objects", (), (
            ("Geometry", (GEO_ID, "Geometry::mesh", "Mesh"),
             tuple(geo_children)),
            ("Model", (MODEL_ID, "Model::mesh", "Mesh"), (
                ("Version", (232,), ()), p70_model)),
            ("Material", (MAT_ID, "Material::mat", ""), (
                ("Version", (102,), ()),
                ("ShadingModel", ("lambert",), ()), p70_mat)),
        )),
        ("Connections", (), (
            ("C", ("OO", GEO_ID, MODEL_ID), ()),
            ("C", ("OO", MODEL_ID, 0), ()),
            ("C", ("OO", MAT_ID, MODEL_ID), ()),
        )),
    ]

    out = _MAGIC + struct.pack("<I", 7400)
    cursor = len(out)
    for name, props, children in top:
        nb = _w_node(name, props, children, base=cursor)
        out += nb
        cursor += len(nb)
    out += b"\x00" * 13                        # top-level terminator
    # standard-ish footer padding (readers don't require the magic tail)
    out += b"\x00" * 120
    with open(path, "wb") as f:
        f.write(out)
