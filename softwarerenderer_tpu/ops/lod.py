"""Mesh LOD: screen-size-driven index-set selection (ROADMAP r3).

The geometry analog of the mip machinery: each mesh may carry decimated
index sets over the SAME vertex buffer; the packed scene concatenates
every level's triangles (static shapes) and the jitted frame selects one
level per mesh from the traced camera — distant instances rasterize a
fraction of the triangles with zero recompiles or re-uploads.  The
reference scales geometry only by whole-mesh frustum culling
(/root/reference/FrustumCuller.cs:201).

Pipeline:
  * `decimate_indices` (host, pack time) — vertex-clustering decimation:
    snap vertices to a `cells`³ grid over the mesh bbox, collapse each
    cell to its first vertex, drop degenerate triangles.  Index-only:
    the vertex buffer is shared by all levels.
  * `add_lods` (host) — attach levels + pixel thresholds to a mesh dict;
    models.scene.build_scene_buffers packs `tri_lod_level` and the
    per-mesh `mesh_lod_px` threshold table.
  * `lod_tri_mask` (device, traced) — per-mesh projected bounding-sphere
    radius in pixels → level = #thresholds above it → triangle mask.
    ANDed with the frustum cull mask by every render path (engine,
    sharded, ring), so binning work drops with distance.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def decimate_indices(positions: np.ndarray, indices: np.ndarray,
                     cells: int = 8) -> np.ndarray:
    """Vertex-clustering decimation: a reduced (T', 3) index set over the
    same vertex buffer.  `cells` is the grid resolution per axis —
    smaller = coarser."""
    pos = np.asarray(positions, np.float64).reshape(-1, 3)
    idx = np.asarray(indices, np.int64).reshape(-1, 3)
    mn = pos.min(axis=0)
    ext = float((pos.max(axis=0) - mn).max())
    if ext <= 0:
        return np.asarray(indices, np.int32).reshape(-1, 3)
    cell = np.clip((pos - mn) / ext * cells, 0, cells - 1e-9).astype(
        np.int64)
    cell_id = cell[:, 0] + cells * (cell[:, 1] + cells * cell[:, 2])
    # representative = first vertex (in index order) of each cell —
    # stays on the original surface
    order = np.argsort(cell_id, kind="stable")
    sorted_ids = cell_id[order]
    first_of_cell = order[np.searchsorted(sorted_ids, cell_id)]
    tri = first_of_cell[idx]
    keep = (tri[:, 0] != tri[:, 1]) & (tri[:, 1] != tri[:, 2]) \
        & (tri[:, 0] != tri[:, 2])
    return tri[keep].astype(np.int32)


def add_lods(mesh: Dict, cells: Sequence[int] = (6, 3),
             px: Sequence[float] = (60.0, 24.0)) -> Dict:
    """Attach decimated LOD levels to a mesh dict (returns a copy).

    Level i+1 activates when the mesh's projected bounding-sphere radius
    drops below px[i] pixels (px must be descending).  Level 0 is the
    authored mesh — the near view is bit-identical to a LOD-less scene.
    """
    if len(cells) != len(px):
        raise ValueError("cells and px must have equal length")
    if any(px[i] <= px[i + 1] for i in range(len(px) - 1)):
        raise ValueError("px thresholds must be strictly descending")
    out = dict(mesh)
    out["lod_indices"] = [decimate_indices(mesh["position"],
                                           mesh["indices"], c)
                          for c in cells]
    out["lod_px"] = [float(p) for p in px]
    return out


def suggested_active_cap(scene: Dict) -> int:
    """Static bound on a frame's VALID triangle-slot count — the always-
    exact value for RenderParams.active_cap (geometry.compact_triangles).

    Per mesh exactly ONE LOD level is active in any frame (lod_tri_mask
    is an equality test), so the selected input triangles are bounded by
    sum_m max_l tris(m, l); ×2 covers both clip-fan slots per input
    triangle.  Frustum culling and clipping only shrink further, so a
    frame can never overflow this cap.  Host-side (pack-time) helper —
    call it on build_scene_buffers output, not under jit.
    """
    mesh_id = np.asarray(scene["tri_mesh_id"])
    if "tri_lod_level" not in scene:
        return int(2 * mesh_id.shape[0])
    lvl = np.asarray(scene["tri_lod_level"])
    m = int(mesh_id.max()) + 1 if mesh_id.size else 0
    nl = int(lvl.max()) + 1 if lvl.size else 1
    counts = np.zeros((m, nl), np.int64)
    np.add.at(counts, (mesh_id, lvl), 1)
    return int(2 * counts.max(axis=1).sum())


def suggested_geom_cap(scene: Dict) -> int:
    """Static bound on a frame's masked-in INPUT triangle count — the
    always-exact value for RenderParams.geom_cap (pre-geometry
    compaction in engine.render_frame).

    Same argument as suggested_active_cap at input-triangle granularity
    (no ×2 — the clip fan happens after the pre-compaction): one LOD
    level per mesh, so sum_m max_l tris(m, l) bounds the mask.  Frustum
    culling only shrinks further.  Host-side (pack-time) helper.
    """
    return suggested_active_cap(scene) // 2


def lod_tri_mask(scene: Dict, uniforms: Dict, height: int, xp=np):
    """(T,) bool — triangles of each mesh's ACTIVE LOD level.

    Projected radius: conservative world-space bounding sphere (same
    max-row-norm scale bound as culling) over distance to the camera,
    scaled by the vertical resolution and FOV.  Thresholds of -inf
    (padding for meshes with fewer levels) never activate.
    """
    mm = xp.asarray(scene["mesh_matrices"], xp.float32)
    wc = ml.transform_point(xp.asarray(scene["bounds_center"], xp.float32),
                            mm, xp=xp)
    row_norms = xp.sqrt(xp.sum(mm[:, :3, :3] ** 2, axis=-1))
    wr = xp.asarray(scene["bounds_radius"], xp.float32) \
        * xp.max(row_norms, axis=-1)
    cam = xp.asarray(uniforms["camera_position"], xp.float32)
    dist = xp.sqrt(xp.maximum(xp.sum((wc - cam) ** 2, axis=-1),
                              F32(1e-12)))
    dist = xp.maximum(dist, xp.asarray(uniforms["near_clip"], xp.float32))
    fov = xp.asarray(uniforms["fov_degrees"], xp.float32) \
        * F32(np.pi / 180.0)
    px_r = wr / dist * F32(height * 0.5) / xp.tan(fov * F32(0.5))
    thresh = xp.asarray(scene["mesh_lod_px"], xp.float32)   # (M, L)
    level = xp.sum((px_r[:, None] < thresh).astype(np.int32), axis=1)
    if xp is not np and "tri_seg_starts" in scene:
        from softwarerenderer_tpu.ops import culling
        lvl_per_tri = culling.segment_broadcast(
            level, scene["tri_seg_starts"],
            int(scene["tri_mesh_id"].shape[0]), xp=xp)
    else:
        lvl_per_tri = xp.take(level, scene["tri_mesh_id"])
    return lvl_per_tri == xp.asarray(scene["tri_lod_level"], np.int32)
