"""First-party COLLADA (.dae) importer.

The reference loads DAE through Assimp (/root/reference/ModelLoader.cs:
144-150 — any Assimp format); this is the native equivalent for the most
common interchange subset: `library_geometries` triangles/polylist
primitives with POSITION/NORMAL/TEXCOORD inputs, the `library_visual_
scenes` node hierarchy (matrix / translate / rotate / scale elements in
document order), instance_geometry + bind_material, lambert/phong/blinn
diffuse (color or texture through the sampler→surface→image chain),
`up_axis` conversion and the `unit` meter scale.

Output matches io_host.gltf.load_gltf: {"meshes": [...], "lights": []}
with node transforms BAKED into vertices through the same native
bake_positions / rotation-only bake_normals pipeline, so a DAE asset and
its glTF twin produce identical scene buffers.

Conventions: COLLADA matrices are written row-major for column vectors
(v' = M·v); this repo uses the .NET row-vector convention (v' = v·M,
utils/mathlib.py), so every matrix is transposed on read and composition
follows the glTF importer's `global = local @ parent` pattern.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from softwarerenderer_tpu.models.scene import Light, LightType, Material, \
    bounding_sphere

F32 = np.float32


def _local(tag: str) -> str:
    return tag.split("}")[-1]


def _children(el, name):
    return [c for c in el if _local(c.tag) == name]


def _find(el, *path):
    cur = [el]
    for name in path:
        nxt = []
        for e in cur:
            nxt.extend(_children(e, name))
        cur = nxt
    return cur


def _floats(text: Optional[str]) -> np.ndarray:
    return np.asarray([float(x) for x in (text or "").split()], np.float64)


def _ints(text: Optional[str]) -> np.ndarray:
    return np.asarray([int(x) for x in (text or "").split()], np.int64)


def _node_matrix_row(node) -> np.ndarray:
    """Compose the node's transform elements (document order) into one
    row-vector matrix."""
    m = np.eye(4, dtype=np.float64)           # column-vector accumulator
    for el in node:
        t = _local(el.tag)
        if t == "matrix":
            v = _floats(el.text)
            if v.size == 16:
                m = m @ v.reshape(4, 4)       # row-major text = col-vec M
        elif t == "translate":
            v = _floats(el.text)
            tm = np.eye(4)
            tm[:3, 3] = v[:3]
            m = m @ tm
        elif t == "rotate":
            v = _floats(el.text)
            if v.size == 4:
                axis = v[:3]
                ln = np.linalg.norm(axis)
                if ln > 0:
                    axis = axis / ln
                    a = np.deg2rad(v[3])
                    x, y, z = axis
                    c, s = np.cos(a), np.sin(a)
                    C = 1 - c
                    rm = np.eye(4)
                    rm[:3, :3] = [
                        [c + x * x * C, x * y * C - z * s, x * z * C + y * s],
                        [y * x * C + z * s, c + y * y * C, y * z * C - x * s],
                        [z * x * C - y * s, z * y * C + x * s, c + z * z * C],
                    ]
                    m = m @ rm
        elif t == "scale":
            v = _floats(el.text)
            sm = np.diag([v[0], v[1], v[2], 1.0])
            m = m @ sm
    return m.T.astype(F32)                    # col-vec → row-vec


def _build_sources(mesh_el) -> Dict[str, np.ndarray]:
    """source id → (N, stride) float array."""
    out = {}
    for src in _children(mesh_el, "source"):
        sid = src.get("id")
        arrs = _children(src, "float_array")
        if not arrs:
            continue
        data = _floats(arrs[0].text)
        stride = 3
        for acc in _find(src, "technique_common", "accessor"):
            stride = int(acc.get("stride", 3))
        out[sid] = data.reshape(-1, stride)
    return out


def _resolve_vertices(mesh_el, sources) -> Dict[str, str]:
    """vertices id → {semantic: source id} (the POSITION indirection)."""
    out = {}
    for v in _children(mesh_el, "vertices"):
        sem = {}
        for inp in _children(v, "input"):
            sem[inp.get("semantic")] = inp.get("source", "").lstrip("#")
        out[v.get("id")] = sem
    return out


def _material_index(root, base_dir: str) -> Dict[str, Material]:
    """material id → Material (diffuse color / texture path)."""
    images = {}
    for img in _find(root, "library_images", "image"):
        for init in _children(img, "init_from"):
            # 1.4: text; 1.5: nested <ref>
            refs = _children(init, "ref")
            path = (refs[0].text if refs else init.text) or ""
            images[img.get("id")] = path.strip()
    effects = {}
    for eff in _find(root, "library_effects", "effect"):
        diffuse_color = (1.0, 1.0, 1.0, 1.0)
        tex_path = None
        # sampler → surface → image indirection inside profile_COMMON
        newparams = {}
        for np_el in _find(eff, "profile_COMMON", "newparam"):
            sid = np_el.get("sid")
            for srf in _children(np_el, "surface"):
                for init in _children(srf, "init_from"):
                    newparams[sid] = ("surface", (init.text or "").strip())
            for smp in _children(np_el, "sampler2D"):
                for src in _children(smp, "source"):
                    newparams[sid] = ("sampler", (src.text or "").strip())
        for shader in ("lambert", "phong", "blinn", "constant"):
            for sh in _find(eff, "profile_COMMON", "technique", shader):
                for dif in _children(sh, "diffuse"):
                    for col in _children(dif, "color"):
                        v = _floats(col.text)
                        if v.size >= 3:
                            diffuse_color = (float(v[0]), float(v[1]),
                                             float(v[2]),
                                             float(v[3]) if v.size > 3
                                             else 1.0)
                    for tex in _children(dif, "texture"):
                        ref = tex.get("texture", "")
                        # walk sampler → surface → image (or direct image)
                        seen = set()
                        while ref in newparams and ref not in seen:
                            seen.add(ref)
                            ref = newparams[ref][1]
                        path = images.get(ref, ref)
                        if path:
                            tex_path = os.path.normpath(
                                os.path.join(base_dir, path))
        effects[eff.get("id")] = (diffuse_color, tex_path)
    mats = {}
    for mat in _find(root, "library_materials", "material"):
        for inst in _children(mat, "instance_effect"):
            eid = inst.get("url", "").lstrip("#")
            color, tex = effects.get(eid, ((1, 1, 1, 1), None))
            mats[mat.get("id")] = Material(
                base_color=tuple(color),
                texture_paths=(("diffuse", tex),) if tex else ())
    return mats


def _triangulate_prim(prim, sources, vertices_map):
    """One <triangles>/<polylist> → corner-expanded (pos, uv, nrm, idx)."""
    inputs = []                    # (offset, semantic, set, source_id)
    max_off = 0
    for inp in _children(prim, "input"):
        off = int(inp.get("offset", 0))
        max_off = max(max_off, off)
        inputs.append((off, inp.get("semantic"), int(inp.get("set", 0)),
                       inp.get("source", "").lstrip("#")))
    stride = max_off + 1
    p_els = _children(prim, "p")
    if not p_els:
        return None
    p = np.concatenate([_ints(el.text) for el in p_els])
    if p.size % stride:
        p = p[: p.size - p.size % stride]
    p = p.reshape(-1, stride)      # (corners, stride)

    kind = _local(prim.tag)
    if kind == "polylist":
        vcounts = _ints(_children(prim, "vcount")[0].text)
    elif kind == "triangles":
        vcounts = np.full(p.shape[0] // 3, 3, np.int64)
    else:
        return None

    # Fan-triangulate: corner rows per polygon → triangle corner rows.
    tri_rows = []
    c = 0
    for vc in vcounts:
        for i in range(1, vc - 1):
            tri_rows.extend((c, c + i, c + i + 1))
        c += vc
    rows = p[np.asarray(tri_rows, np.int64)]   # (3T, stride)

    n = rows.shape[0]
    pos = np.zeros((n, 3), np.float64)
    nrm = np.zeros((n, 3), np.float64)
    uv = np.zeros((n, 2), np.float64)
    # Take the LOWEST-numbered TEXCOORD set present — some exporters
    # (3ds Max, certain Maya configs) emit set="1" as the only UV
    # channel, and requiring exactly set 0 would silently zero all UVs.
    uv_sets = sorted(set_i for _, sem, set_i, src in inputs
                     if sem == "TEXCOORD" and src in sources)
    uv_set = uv_sets[0] if uv_sets else 0
    for off, sem, set_i, src in inputs:
        idx = rows[:, off]
        if sem == "VERTEX":
            sem_map = vertices_map.get(src, {})
            for vsem, vsrc in sem_map.items():
                arr = sources.get(vsrc)
                if arr is None:
                    continue
                if vsem == "POSITION":
                    pos = arr[idx, :3]
                elif vsem == "NORMAL":
                    nrm = arr[idx, :3]
                elif vsem == "TEXCOORD":
                    uv = arr[idx, :2]
        elif sem == "NORMAL" and src in sources:
            nrm = sources[src][idx, :3]
        elif sem == "TEXCOORD" and set_i == uv_set and src in sources:
            uv = sources[src][idx, :2]
    indices = np.arange(n, dtype=np.int32).reshape(-1, 3)
    return pos, uv, nrm, indices, prim.get("material")


def load_dae(path: str, flip_uv: bool = False) -> Dict:
    """Parse a .dae file into {"meshes": [...], "lights": [...]} (same
    contract as gltf.load_gltf: transforms baked, rotation-only normal
    baking).

    UV origin: COLLADA authors V with a bottom-left origin — which IS
    this repo's in-memory convention (the glTF importer's flip converts
    glTF's top-left origin to it) — so no flip happens by default; a DAE
    asset and its glTF twin land on identical UVs."""
    base_dir = os.path.dirname(os.path.abspath(path))
    root = ET.parse(path).getroot()

    # up-axis + unit conversion as a root transform (column-vector), like
    # Assimp's MakeLeftHanded-free default import.
    unit = 1.0
    up = "Y_UP"
    for asset in _children(root, "asset"):
        for u in _children(asset, "unit"):
            unit = float(u.get("meter", 1.0))
        for ua in _children(asset, "up_axis"):
            up = (ua.text or "Y_UP").strip()
    root_m = np.eye(4, dtype=np.float64)
    if up == "Z_UP":
        # (x, y, z)_zup → (x, z, -y)_yup
        root_m[:3, :3] = [[1, 0, 0], [0, 0, 1], [0, -1, 0]]
    elif up == "X_UP":
        root_m[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    root_m[:3, :3] *= unit
    root_row = root_m.T.astype(F32)

    # geometry id → list of primitive tuples
    geoms: Dict[str, List] = {}
    for geo in _find(root, "library_geometries", "geometry"):
        prims = []
        for mesh_el in _children(geo, "mesh"):
            sources = _build_sources(mesh_el)
            vmap = _resolve_vertices(mesh_el, sources)
            for prim in mesh_el:
                if _local(prim.tag) in ("triangles", "polylist"):
                    tri = _triangulate_prim(prim, sources, vmap)
                    if tri is not None:
                        prims.append(tri)
        geoms[geo.get("id")] = prims

    materials = _material_index(root, base_dir)
    from softwarerenderer_tpu.native import bake_normals, bake_positions

    meshes: List[Dict] = []

    def process_node(node, parent_row):
        global_m = _node_matrix_row(node) @ parent_row
        rot_only = global_m.copy()
        rot_only[3, :] = [0, 0, 0, 1]
        rot_only[:, 3] = [0, 0, 0, 1]
        for inst in _children(node, "instance_geometry"):
            gid = inst.get("url", "").lstrip("#")
            # bind_material: symbol → material id
            sym_map = {}
            for im in _find(inst, "bind_material", "technique_common",
                            "instance_material"):
                sym_map[im.get("symbol")] = im.get("target",
                                                   "").lstrip("#")
            for pos, uv, nrm, idx, mat_sym in geoms.get(gid, []):
                wpos = bake_positions(pos.astype(F32), global_m)
                wn = bake_normals(nrm.astype(F32), rot_only)
                uv2 = uv.astype(F32)
                if flip_uv:
                    uv2 = uv2.copy()
                    uv2[:, 1] = F32(1.0) - uv2[:, 1]
                center, radius = bounding_sphere(wpos)
                mat = materials.get(sym_map.get(mat_sym, mat_sym),
                                    Material())
                meshes.append({
                    "position": wpos,
                    "uv": uv2,
                    "normal": wn,
                    "color": np.ones((wpos.shape[0], 4), F32),
                    "indices": idx,
                    "material": mat,
                    "bounds_center": center,
                    "bounds_radius": radius,
                })
        for child in _children(node, "node"):
            process_node(child, global_m)

    for vs in _find(root, "library_visual_scenes", "visual_scene"):
        for node in _children(vs, "node"):
            process_node(node, root_row)

    lights: List[Light] = []
    for lt in _find(root, "library_lights", "light"):
        for tc in _children(lt, "technique_common"):
            for kind in tc:
                k = _local(kind.tag)
                color = (1.0, 1.0, 1.0)
                for col in _children(kind, "color"):
                    v = _floats(col.text)
                    if v.size >= 3:
                        color = (float(v[0]), float(v[1]), float(v[2]))
                type_map = {"directional": LightType.DIRECTIONAL,
                            "point": LightType.POINT,
                            "spot": LightType.SPOT,
                            "ambient": LightType.AMBIENT}
                if k in type_map:
                    lights.append(Light(color=color,
                                        light_type=type_map[k]))
    return {"meshes": meshes, "lights": lights}
