"""Frustum culling on device — Gribb–Hartmann planes + sphere tests.

Re-designs FrustumCuller (/root/reference/FrustumCuller.cs:153-224) as
batched array ops: one plane extraction per frame and ONE vectorized
sphere-vs-6-planes test over all meshes (the reference tests per mesh under
Parallel.ForEach, Renderer.cs:444-446).  Works under numpy and jax.numpy
(xp arg) so the host and the jitted frame share one implementation.

Plane convention matches the reference exactly: for the row-vector
viewProjection = view·projection, plane k coefficients are
(M[0,3]±M[0,k], M[1,3]±M[1,k], M[2,3]±M[2,k], M[3,3]±M[3,k]) normalized by
the xyz magnitude; a sphere is visible when signed distance > -radius
against all six planes (FrustumCuller.cs:201-224).
"""

from __future__ import annotations

import numpy as np

from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def frustum_planes(view_projection, xp=np):
    """(6, 4) normalized planes [normal_xyz, d]: near, far, left, right,
    top, bottom — the reference's extraction order (FrustumCuller.cs:153-187).
    For the row-vector convention the k-th clip coordinate is v·M[:, k], so
    plane coefficients come from matrix COLUMNS."""
    m = xp.asarray(view_projection, dtype=xp.float32)
    col = lambda k: m[:, k]
    w = col(3)
    raw = xp.stack([
        w + col(2),   # near  (clip z >= 0 for the 0..1 depth projection)
        w - col(2),   # far
        w + col(0),   # left
        w - col(0),   # right
        w + col(1),   # top    (reference's "top" = w + col1, FrustumCuller.cs:177)
        w - col(1),   # bottom
    ])                                           # (6, 4): x,y,z,d
    mag = xp.sqrt(raw[:, 0] ** 2 + raw[:, 1] ** 2 + raw[:, 2] ** 2)
    return raw / mag[:, None]


def spheres_in_frustum(centers, radii, model_matrices, view_projection,
                       xp=np):
    """Vectorized IsSphereInFrustum (FrustumCuller.cs:201-218).

    centers: (M, 3) local-space sphere centers; radii: (M,);
    model_matrices: (M, 4, 4).  Returns (M,) bool visibility.
    World radius scales by the max row-norm of the model matrix's upper 3x3
    (the reference's conservative max-scale).
    """
    centers = xp.asarray(centers, dtype=xp.float32)
    radii = xp.asarray(radii, dtype=xp.float32)
    mm = xp.asarray(model_matrices, dtype=xp.float32)

    world_center = ml.transform_point(centers, mm, xp=xp)      # (M, 3)
    row_norms = xp.sqrt(xp.sum(mm[:, :3, :3] ** 2, axis=-1))   # (M, 3)
    world_radius = radii * xp.max(row_norms, axis=-1)

    planes = frustum_planes(view_projection, xp=xp)            # (6, 4)
    # distance(center) = n·c + d for every (mesh, plane) pair
    dist = (world_center @ planes[:, :3].T) + planes[None, :, 3]
    return xp.all(dist > -world_radius[:, None], axis=-1)


def segment_broadcast(values, seg_starts, n: int, element_ids=None, xp=np):
    """Expand per-mesh `values` (M,) to per-element (n,) over CONTIGUOUS
    segments — element i belongs to the last segment whose start <= i.

    The TPU-friendly form of `xp.take(values, element_ids)` for sorted
    `element_ids` (tri_mesh_id / vert_mesh_id, models/scene.py): scatter
    first-order deltas at the segment starts, one integer cumsum
    propagates them across each segment.  XLA lowers big takes to serial
    per-element gathers (~5 ms for 584k ids on v5e, the same trap as the
    clip-table take_along_axis, BENCHMARKS.md); the scatter+cumsum form
    measures ~2 ms and is EXACT for bool/int values (integer arithmetic
    throughout — float values would accumulate rounding, so they are
    routed to take).

    Empty segments collapse correctly (coincident starts sum their
    deltas).  On the numpy path (golden/host) this is a plain take via
    `element_ids` (required there).
    """
    values = xp.asarray(values)
    exact = values.dtype == bool or xp.issubdtype(values.dtype, xp.integer)
    if xp is np or not exact:
        if element_ids is None:
            raise ValueError("segment_broadcast needs element_ids for "
                             "the take fallback")
        return xp.take(values, element_ids)
    as_bool = values.dtype == bool
    v = values.astype(xp.int32)
    deltas = xp.concatenate([v[:1], v[1:] - v[:-1]])
    out = xp.cumsum(xp.zeros((n,), xp.int32).at[seg_starts].add(deltas))
    return out > 0 if as_bool else out
