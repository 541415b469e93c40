"""Ray-tracing acceleration: Morton-clustered triangles + conservative
ray-BUNDLE culling — a TPU-native answer to "the ray tracer needs a BVH".

Classic BVHs are per-ray pointer chases: data-dependent traversal, tiny
irregular reads — the exact shape a TPU cannot execute well.  The
observation that fits the hardware instead: the renderer's rays arrive
in COHERENT chunks (a pixel tile's primary rays share a camera frustum;
a tile's shadow rays march toward one light; see ops/raytrace.py), so
culling can happen once per CHUNK against clustered geometry, and the
surviving work stays a dense rays × triangles Möller–Trumbore block:

  1. Build (inside the jitted frame — world matrices are traced):
     triangles sort by the Morton code of their world centroid, so each
     run of `group` consecutive slots is spatially tight; per-cluster
     AABBs are one reshape + min/max.  (`build_rt_accel`)
  2. Per chunk: a conservative interval slab test asks, per cluster,
     "could ANY ray with origin in the chunk's origin-AABB and direction
     in its direction-AABB hit this cluster's AABB?"  — O(clusters)
     elementwise work, no per-ray traversal.  (`_bundle_hits_aabb`)
  3. Surviving clusters stable-compact to a static `cap` (the same
     cumsum-rank partition idiom as ops/binning.py); their triangle
     slots gather once; Möller–Trumbore runs dense on (rays, cap·group).
  4. Exactness is UNCONDITIONAL: if more than `cap` clusters survive,
     a `lax.cond` falls back to the brute-force raycast for that chunk —
     the cap is a performance knob, never a correctness knob (the same
     contract as RenderParams.active_cap's overflow counters).

Winner semantics match sim/raycast.raycast_batch exactly: nearest hit,
ties to the LOWEST GLOBAL triangle index (the Morton permutation is
invisible — the tie reduction runs on global ids), identical epsilon and
face-mask rules (Physics.cs:136-179 faithful).  Tests assert the winner
identity (hit, tri) is IDENTICAL to brute force; derived floats
(t/point/normal) agree to fp tolerance — the formulas are the same
elementwise ops, but XLA contracts mul-adds to FMAs differently in the
two program shapes, so the last ulp can drift (the same
cross-compilation caveat as PARITY.md's constant-folded camera note).

The reference has no analog (its Physics.cs is brute force per mesh);
this accelerates the beyond-reference ray-traced render mode
(ops/raytrace.py) and any bulk raycast workload with coherent batches.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

import importlib

from softwarerenderer_tpu.utils import mathlib as ml

# sim/__init__ re-exports the `raycast` FUNCTION under the submodule's
# name, so a plain `from ...sim import raycast` binds the function.
rc_mod = importlib.import_module("softwarerenderer_tpu.sim.raycast")

F32 = jnp.float32
I32 = jnp.int32
BIG = jnp.finfo(jnp.float32).max
EPSILON = rc_mod.EPSILON


def _morton3(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave three 10-bit integer coordinates (N, 3) -> (N,) i32
    Morton codes (x bit i -> code bit 3i, y -> 3i+1, z -> 3i+2)."""
    def spread(x):
        # classic bit-spreading: 10 bits -> every 3rd bit of 30
        x = (x | (x << 16)) & jnp.int32(0x030000FF)
        x = (x | (x << 8)) & jnp.int32(0x0300F00F)
        x = (x | (x << 4)) & jnp.int32(0x030C30C3)
        x = (x | (x << 2)) & jnp.int32(0x09249249)
        return x
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def build_rt_accel(world: Dict, group: int = 64) -> Dict:
    """Cluster the collision world's triangles for bundle culling.

    `world` is sim/raycast.build_collision_world output (v0/v1/v2 world-
    space corners).  Returns a dict of device arrays — everything traced,
    so moving meshes just rebuild it each frame (one argsort over T plus
    reductions; ~micro-seconds at game scale):

      perm      (Tp,)  i32  slot -> global triangle id (pad slots -> 0)
      slot_ok   (Tp,)  bool pad mask
      v0/e1/e2  (Tp, 3) f32 permuted corners / edge vectors
      cl_lo/hi  (NC, 3) f32 cluster AABBs (pad slots excluded)
      group, n_clusters  (static ints)
    """
    v0, v1, v2 = world["v0"], world["v1"], world["v2"]
    T = v0.shape[0]
    Tp = -(-T // group) * group

    cent = (v0 + v1 + v2) * F32(1.0 / 3.0)
    lo = jnp.min(cent, axis=0)
    hi = jnp.max(cent, axis=0)
    span = jnp.maximum(hi - lo, F32(1e-20))
    q = jnp.clip(((cent - lo) / span * F32(1023.0)).astype(I32), 0, 1023)
    code = _morton3(q)
    perm = jnp.argsort(code).astype(I32)                       # (T,)

    pad = Tp - T
    perm = jnp.pad(perm, (0, pad))                             # pad -> tri 0
    slot_ok = jnp.pad(jnp.ones((T,), bool), (0, pad))

    pv0 = jnp.take(v0, perm, axis=0)
    pv1 = jnp.take(v1, perm, axis=0)
    pv2 = jnp.take(v2, perm, axis=0)

    nc = Tp // group
    corners = jnp.stack([pv0, pv1, pv2], axis=1)               # (Tp, 3, 3)
    corners = corners.reshape(nc, group, 3, 3)
    okc = slot_ok.reshape(nc, group, 1, 1)
    cl_lo = jnp.min(jnp.where(okc, corners, BIG), axis=(1, 2))
    cl_hi = jnp.max(jnp.where(okc, corners, -BIG), axis=(1, 2))

    return {
        "perm": perm, "slot_ok": slot_ok,
        "v0": pv0, "e1": pv1 - pv0, "e2": pv2 - pv0,
        "cl_lo": cl_lo, "cl_hi": cl_hi,
        "group": group, "n_clusters": nc,
    }


def _reach_ge(x0, x1, s0, s1, c):
    """t-interval [t0, t1] on which  max over the bundle of (x + t*s)
    can be >= c, for origin interval [x0, x1] and slope interval
    [s0, s1], t >= 0.  The max trajectory is x1 + t*s1.  Conservative
    (never culls a reachable cluster).  All args broadcast."""
    up = s1 > 0
    dn = s1 < 0
    at0 = x1 >= c
    tc = (c - x1) / jnp.where(s1 == 0, F32(1), s1)
    t0 = jnp.where(at0, F32(0.0), jnp.where(up, tc, BIG))
    t1 = jnp.where(at0 & dn, tc, jnp.where(at0 | up, BIG, -BIG))
    return t0, t1


def _reach_le(x0, x1, s0, s1, c):
    """t-interval on which  min over the bundle of (x + t*s) can be
    <= c.  The min trajectory is x0 + t*s0.  (Mirror of _reach_ge.)"""
    t0, t1 = _reach_ge(-x1, -x0, -s1, -s0, -c)
    return t0, t1


def _bundle_hits_aabb(olo, ohi, dlo, dhi, cl_lo, cl_hi) -> jnp.ndarray:
    """(NC,) bool: could any ray with origin in [olo, ohi] and direction
    in [dlo, dhi] enter cluster AABB [cl_lo, cl_hi] at some t >= 0?

    Per axis the reachable-coordinate envelope over the bundle is
    [olo + t*dlo, ohi + t*dhi]; the slab [lo, hi] is touchable at time t
    iff envelope_max >= lo AND envelope_min <= hi.  Each condition is an
    interval in t; the cluster survives iff the intersection over the
    six conditions (and t >= 0) is nonempty.  Interval arithmetic makes
    this conservative — it can admit extra clusters, never drop one."""
    t0 = jnp.zeros(cl_lo.shape[0], F32)
    t1 = jnp.full((cl_lo.shape[0],), BIG, F32)
    for a in range(3):
        g0, g1 = _reach_ge(olo[a], ohi[a], dlo[a], dhi[a], cl_lo[:, a])
        l0, l1 = _reach_le(olo[a], ohi[a], dlo[a], dhi[a], cl_hi[:, a])
        t0 = jnp.maximum(t0, jnp.maximum(g0, l0))
        t1 = jnp.minimum(t1, jnp.minimum(g1, l1))
    return t0 <= t1


def raycast_bundle_culled(origins, directions, world: Dict, accel: Dict,
                          cap,
                          face_mask: int = rc_mod.FACE_MASK_IGNORE_BACKFACES,
                          tri_mask=None) -> Dict:
    """Drop-in raycast_batch with bundle culling: R rays vs the clusters
    their bundle can reach; identical winners (see module docstring),
    including the lowest-global-index tie rule.

    `cap` is an int or an ascending tuple of ints — a LADDER of static
    cluster capacities.  Each chunk dispatches (lax.switch) to the
    smallest rung that holds its survivor count, so cheap chunks pay a
    small dense block while rare busy chunks climb rungs; a chunk
    exceeding the top rung falls back to raycast_batch.  Exact for ANY
    ladder — rungs are perf knobs; size them from measured survivor
    percentiles (bundle_survivor_count), the way active_cap is sized
    from active_cap_stats.  Inside lax.map/scan chunk loops the switch
    executes only the chosen rung per chunk (the same dynamic-skip
    economics as the K-buffer opaque short-circuit).
    """
    caps = (cap,) if isinstance(cap, int) else tuple(cap)
    o = jnp.asarray(origins, F32)
    d = ml.safe_normalize(jnp.asarray(directions, F32), xp=jnp)
    G = accel["group"]
    nc = accel["n_clusters"]
    caps = tuple(sorted({min(c, nc) for c in caps}))
    max_cap = caps[-1]

    olo = jnp.min(o, axis=0)
    ohi = jnp.max(o, axis=0)
    dlo = jnp.min(d, axis=0)
    dhi = jnp.max(d, axis=0)
    alive = _bundle_hits_aabb(olo, ohi, dlo, dhi,
                              accel["cl_lo"], accel["cl_hi"])

    # Cluster-level visibility: a cluster none of whose triangles pass
    # tri_mask (or that is all padding) can be culled before the dense
    # block — mesh_visible folds into geometry, not just slot masking.
    slot_mask = accel["slot_ok"]
    if tri_mask is not None:
        slot_mask = slot_mask & jnp.take(jnp.asarray(tri_mask, bool),
                                         accel["perm"])
    alive = alive & jnp.any(slot_mask.reshape(nc, G), axis=1)

    n_alive = jnp.sum(alive.astype(I32))

    # Stable compaction of surviving cluster ids to a static prefix (NC
    # is small — tens to hundreds — so a stable bool argsort is cheap
    # and keeps Morton order among survivors).
    sel = jnp.argsort(jnp.logical_not(alive), stable=True
                      ).astype(I32)[:max_cap]
    taken = jnp.arange(max_cap, dtype=I32) < jnp.minimum(n_alive, max_cap)

    def make_rung(cap):
        return lambda _: _culled_mt(o, d, origins, world, accel, slot_mask,
                                    sel[:cap], taken[:cap], face_mask)

    def brute_path(_):
        return rc_mod.raycast_batch(o, d, world, face_mask=face_mask,
                                    tri_mask=tri_mask)

    if len(caps) == 1:
        return jax.lax.cond(n_alive > max_cap, brute_path,
                            make_rung(caps[0]), None)
    # Rung index: first cap >= n_alive, else the brute branch.
    bounds = jnp.asarray(caps, I32)
    idx = jnp.sum((n_alive > bounds).astype(I32))
    branches = [make_rung(c) for c in caps] + [brute_path]
    return jax.lax.switch(idx, branches, None)


def _culled_mt(o, d, origins, world, accel, slot_mask, sel, taken,
               face_mask):
    """The dense Möller–Trumbore block over one rung's selected clusters
    (see raycast_bundle_culled)."""
    G = accel["group"]

    rows = (sel[:, None] * G
            + jnp.arange(G, dtype=I32)[None]).reshape(-1)   # (cap*G,)
    sv0 = jnp.take(accel["v0"], rows, axis=0)
    se1 = jnp.take(accel["e1"], rows, axis=0)
    se2 = jnp.take(accel["e2"], rows, axis=0)
    sgid = jnp.take(accel["perm"], rows)
    sok = jnp.take(slot_mask, rows) & jnp.repeat(taken, G)

    pvec = ml.cross(d[:, None, :], se2[None], xp=jnp)       # (R, K, 3)
    det = ml.dot(se1[None], pvec, xp=jnp)
    ok = jnp.abs(det) >= EPSILON
    if face_mask & rc_mod.FACE_MASK_IGNORE_BACKFACES:
        ok &= det >= EPSILON
    if face_mask & rc_mod.FACE_MASK_IGNORE_FRONTFACES:
        ok &= det <= -EPSILON
    inv_det = F32(1.0) / jnp.where(det == 0, F32(1), det)
    tvec = o[:, None, :] - sv0[None]
    u = ml.dot(tvec, pvec, xp=jnp) * inv_det
    ok &= (u >= 0) & (u <= 1)
    qvec = ml.cross(tvec, se1[None], xp=jnp)
    v = ml.dot(d[:, None, :], qvec, xp=jnp) * inv_det
    ok &= (v >= 0) & (u + v <= 1)
    t = ml.dot(se2[None], qvec, xp=jnp) * inv_det
    ok &= (t >= 0) & sok[None, :]

    t_masked = jnp.where(ok, t, BIG)
    tbest = jnp.min(t_masked, axis=1)                       # (R,)
    # Tie rule: lowest GLOBAL id among hits at tbest (raycast_batch's
    # argmin over the unpermuted axis picks the first == lowest id).
    at_best = ok & (t_masked == tbest[:, None])
    gid_or_big = jnp.where(at_best, sgid[None, :], jnp.int32(2**30))
    wtri = jnp.min(gid_or_big, axis=1)                      # (R,)
    hit = wtri < 2**30
    wtri = jnp.where(hit, wtri, 0).astype(I32)
    # Winner slot (for u/v): first slot matching (tbest, wtri).
    wslot = jnp.argmax(at_best & (gid_or_big == wtri[:, None]), axis=1)
    ub = jnp.take_along_axis(u, wslot[:, None], axis=1)[:, 0]
    vb = jnp.take_along_axis(v, wslot[:, None], axis=1)[:, 0]
    dist = jnp.where(hit, tbest, BIG)

    wb = F32(1.0) - ub - vb
    n0 = jnp.take(world["n0"], wtri, axis=0)
    n1 = jnp.take(world["n1"], wtri, axis=0)
    n2 = jnp.take(world["n2"], wtri, axis=0)
    normal = ml.safe_normalize(
        n0 * wb[:, None] + n1 * ub[:, None] + n2 * vb[:, None], xp=jnp)
    point = jnp.asarray(origins, F32) + d * jnp.where(hit, dist,
                                                      F32(0))[:, None]
    return {
        "hit": hit,
        "distance": dist,
        "point": jnp.where(hit[:, None], point, jnp.zeros_like(point)),
        "normal": jnp.where(hit[:, None], normal,
                            jnp.zeros_like(normal)),
        "tri": wtri,
    }


def bundle_survivor_count(origins, directions, world: Dict, accel: Dict,
                          tri_mask=None) -> jnp.ndarray:
    """Diagnostic: how many clusters this bundle keeps alive (size caps
    from this, the way active_cap sizes from active_cap_stats)."""
    o = jnp.asarray(origins, F32)
    d = ml.safe_normalize(jnp.asarray(directions, F32), xp=jnp)
    alive = _bundle_hits_aabb(jnp.min(o, axis=0), jnp.max(o, axis=0),
                              jnp.min(d, axis=0), jnp.max(d, axis=0),
                              accel["cl_lo"], accel["cl_hi"])
    if tri_mask is not None:
        sm = accel["slot_ok"] & jnp.take(jnp.asarray(tri_mask, bool),
                                         accel["perm"])
        alive = alive & jnp.any(
            sm.reshape(accel["n_clusters"], accel["group"]), axis=1)
    return jnp.sum(alive.astype(I32))
