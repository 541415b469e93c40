"""Pallas bundle-sweep kernel: the ray tracer's hot loop without gathers.

Round-4 finding (BENCHMARKS.md): the XLA pair-table sweep
(ops/rt_accel._pair_sweep) is GATHER-bound, not FLOP-bound — every chunk
gathers its pairs' cluster triangles (C·G·9 elements) and bundle rays
(C·R·3), and TPU gathers charge ~2.5 ns per ELEMENT regardless of
locality (the same model as the 4K texel analysis).  At 640×400 dust2
that is ~40M gathered elements ≈ 100 ms/frame with the Möller–Trumbore
math itself worth <10 ms.

This kernel removes every gather: one grid step per BUNDLE, the bundle's
rays arrive as a regular pipelined block, and its surviving clusters'
triangle blocks arrive by double-buffered DMA at dynamic offsets
(cluster id × G — contiguous rows, bandwidth-priced, not element-priced).
The in-kernel fold keeps the running lexicographic (nearest t, lowest
global id) winner per ray, so the XLA segment reduction disappears too.

Layouts (built by the wrapper):
  tri stream  (16, NC·G) f32 — rows 0-2 v0.xyz, 3-5 e1.xyz, 6-8 e2.xyz,
              row 9 global id (f32 — ids are exact below 2^24; the
              wrapper asserts), row 10 live flag; G = 128 so DMA lane
              slices stay 128-aligned.
  rays        (B, 8, R) f32 — rows 0-2 origin xyz, 3-5 direction xyz
              (normalized by the wrapper); R must be a 128 multiple.
  lists       (B·CAPB,) i32 scalar prefetch — each bundle's surviving
              cluster ids (ops/rt_accel._bundles_alive order).
  counts      (B,) i32 scalar prefetch.

Winner semantics match sim/raycast.raycast_batch exactly (the rt_accel
contract): nearest t, ties to the LOWEST global triangle id.  A bundle
whose survivor count exceeds CAPB makes the wrapper lax.cond-fall back
to the brute raycast for the whole call — capacity is a performance
knob, never a correctness knob.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from softwarerenderer_tpu.ops import rt_accel
import importlib

rc_mod = importlib.import_module("softwarerenderer_tpu.sim.raycast")
from softwarerenderer_tpu.utils import mathlib as ml

F32 = jnp.float32
I32 = jnp.int32
BIG = jnp.finfo(jnp.float32).max
NOTRI = rt_accel.NOTRI
GROUP = 128          # cluster size: DMA lane slices must be 128-aligned


def _kernel(R, G, capb, capb_p, any_hit, face_mask,
            lists_ref, counts_ref,            # scalar prefetch (SMEM)
            rays_ref, t0_ref, tri_ref,        # inputs
            outt_ref, outg_ref,               # outputs
            buf_ref, sem_ref, acc_ref, st_ref):   # scratch
    i = pl.program_id(0)
    count = counts_ref[i]
    base = i * capb
    eps = F32(rc_mod.EPSILON)

    rays = rays_ref[0]                        # (8, R)
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]

    def get_dma(slot, j):
        cl = lists_ref[base + j]
        return pltpu.make_async_copy(
            tri_ref.at[:, pl.ds(cl * G, G)],
            buf_ref.at[slot], sem_ref.at[slot])

    @pl.when(count > 0)
    def _():
        get_dma(0, 0).start()

    def _mt_ok_t(blk):
        """(ok, t, gid) over one (16, G) cluster block vs this bundle's
        rays — (G, R) broadcasting, the same elementwise formulas as
        sim/raycast.raycast_batch."""
        col = lambda k: blk[k, :][:, None]    # (G, 1)
        v0x, v0y, v0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        gid = blk[9, :][:, None]              # (G, 1) f32 global ids
        live = blk[10, :][:, None] > 0
        pvx = dy * e2z - dz * e2y             # (G, R)
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) >= eps
        if face_mask & rc_mod.FACE_MASK_IGNORE_BACKFACES:
            ok &= det >= eps
        if face_mask & rc_mod.FACE_MASK_IGNORE_FRONTFACES:
            ok &= det <= -eps
        inv_det = F32(1.0) / jnp.where(det == 0, F32(1), det)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        ok &= (u >= 0) & (u <= 1)
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        ok &= (v >= 0) & (u + v <= 1)
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok &= (t >= 0) & live
        return ok, t, gid

    if any_hit:
        # Predicated fori with an SMEM done flag: survivors arrive
        # front-to-back (wrapper sort), so once every ray is occluded
        # the remaining iterations skip both DMA and compute.  st_ref
        # (SMEM): [0] done, [1] DMAs started, [2] DMAs waited — the
        # early exit can strand ONE in-flight prefetch, which the tail
        # wait drains to keep semaphore parity across grid steps.
        acc_ref[0:1, :] = jnp.zeros((1, R), F32)
        st_ref[0] = 0
        st_ref[1] = jnp.where(count > 0, 1, 0)
        st_ref[2] = 0

        def body_ah(j, carry):
            @pl.when(st_ref[0] == 0)
            def _():
                get_dma(j % 2, j).wait()
                st_ref[2] = j + 1

                @pl.when(j + 1 < count)
                def _():
                    get_dma((j + 1) % 2, j + 1).start()
                    st_ref[1] = j + 2
                ok, _t, _gid = _mt_ok_t(buf_ref[j % 2])
                acc = jnp.maximum(
                    acc_ref[0:1, :],
                    jnp.max(jnp.where(ok, F32(1.0), F32(0.0)), axis=0,
                            keepdims=True))
                acc_ref[0:1, :] = acc
                st_ref[0] = jnp.where(jnp.sum(acc) >= F32(R), 1, 0)
            return carry

        jax.lax.fori_loop(0, count, body_ah, 0)

        @pl.when(st_ref[1] > st_ref[2])
        def _():
            get_dma((st_ref[1] - 1) % 2, st_ref[1] - 1).wait()
        outt_ref[...] = jnp.zeros((1, 1, R), F32)
        outg_ref[...] = (acc_ref[0:1, :] > 0).astype(I32).reshape(1, 1, R)
        return

    # Nearest fold with the SAME front-to-back early exit (r5): the
    # wrapper sorts survivors by conservative entry time t0 and ships
    # t0 quantized (×64, floor) as a per-bundle VMEM row; once even the
    # FARTHEST ray's winner strictly precedes the next cluster's entry
    # (btmax·64 < t0q[j+1] ⇒ btmax < t0[j+1] ≤ every later entry), no
    # remaining cluster can produce a nearer hit — nor an equal-t/lower
    # -gid tie (equality would contradict the strict inequality) — so
    # the remaining iterations skip both DMA and compute.  Winner
    # identity is bit-exact vs the full sweep.  bt/bg live in VMEM
    # scratch rows (a vector fori carry cannot combine with pl.when —
    # the any-hit idiom above); the per-step t0 scalar comes from an
    # iota-select over the VMEM row (vector ops only — no SMEM scalar
    # bit/shift arithmetic).
    acc_ref[0:1, :] = jnp.full((1, R), BIG, F32)
    acc_ref[1:2, :] = jnp.full((1, R), F32(NOTRI), F32)
    st_ref[0] = 0
    st_ref[1] = jnp.where(count > 0, 1, 0)
    st_ref[2] = 0

    def body(j, carry):
        @pl.when(st_ref[0] == 0)
        def _():
            get_dma(j % 2, j).wait()
            st_ref[2] = j + 1

            @pl.when(j + 1 < count)
            def _():
                get_dma((j + 1) % 2, j + 1).start()
                st_ref[1] = j + 2
            ok, t, gid = _mt_ok_t(buf_ref[j % 2])
            bt = acc_ref[0:1, :]
            bg = acc_ref[1:2, :]
            tm = jnp.where(ok, t, BIG)
            tbj = jnp.min(tm, axis=0, keepdims=True)      # (1, R)
            at = ok & (tm == tbj)
            gidj = jnp.min(jnp.where(at, gid, F32(NOTRI)), axis=0,
                           keepdims=True)                 # (1, R)
            take = (tbj < bt) | ((tbj == bt) & (gidj < bg))
            bt = jnp.where(take, tbj, bt)
            acc_ref[0:1, :] = bt
            acc_ref[1:2, :] = jnp.where(take, gidj, bg)
            btmax = jnp.max(bt)                           # scalar
            lane = jax.lax.broadcasted_iota(I32, (1, capb_p), 1)
            nxt = jnp.sum(jnp.where(lane == j + 1, t0_ref[0], 0))
            st_ref[0] = jnp.where(
                (j + 1 < count)
                & (btmax * F32(64.0) < nxt.astype(F32)), 1, 0)
        return carry

    jax.lax.fori_loop(0, count, body, 0)

    @pl.when(st_ref[1] > st_ref[2])
    def _():
        get_dma((st_ref[1] - 1) % 2, st_ref[1] - 1).wait()
    outt_ref[...] = acc_ref[0:1, :].reshape(1, 1, R)
    outg_ref[...] = acc_ref[1:2, :].astype(I32).reshape(1, 1, R)


def _sweep_pl(rays_packed, tri_stream, lists, counts, t0q, B, R, capb,
              any_hit: bool, face_mask: int, interpret: bool):
    capb_p = t0q.shape[-1]
    kernel = functools.partial(_kernel, R, GROUP, capb, capb_p, any_hit,
                               face_mask)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, R), lambda i, *_: (i, 0, 0)),
            # (B, 1, capb_p) so the block's trailing dims equal the
            # array dims (the Mosaic block-shape divisibility rule)
            pl.BlockSpec((1, 1, capb_p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # (B, 1, R) so the block's trailing dims (1, R) equal the
            # array dims — the Mosaic block-shape divisibility rule.
            pl.BlockSpec((1, 1, R), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, GROUP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            # row 0: any-hit accumulator / nearest best-t
            # row 1: nearest best-gid (f32)
            pltpu.VMEM((2, R), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),          # done / DMA parity
        ],
    )
    kw = {}
    if not interpret:
        # Soft-shadow casts stack S samples into the ray axis (R up to
        # 4096): the (G, R) fold temporaries then need ~17 MB of scoped
        # VMEM — just over Mosaic's 16 MB default.  v5e has 128 MB.
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    out_t, out_g = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 1, R), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, R), jnp.int32)],
        interpret=interpret,
        **kw,
    )(lists, counts, rays_packed, t0q, tri_stream)
    return out_t.reshape(B, R), out_g.reshape(B, R)


def build_rt_accel_pl(world: Dict) -> Dict:
    """rt_accel.build_rt_accel at GROUP=128 plus the kernel's packed
    (16, Tp) triangle stream (module docstring layout)."""
    accel = rt_accel.build_rt_accel(world, group=GROUP)
    Tp = accel["v0"].shape[0]
    if Tp >= (1 << 24):
        raise ValueError("f32 global ids are exact below 2^24 triangles")
    rows = jnp.zeros((16, Tp), F32)
    rows = rows.at[0:3].set(accel["v0"].T)
    rows = rows.at[3:6].set(accel["e1"].T)
    rows = rows.at[6:9].set(accel["e2"].T)
    rows = rows.at[9].set(accel["perm"].astype(F32))
    rows = rows.at[10].set(accel["slot_ok"].astype(F32))
    accel = dict(accel)
    accel["tri_stream"] = rows
    return accel


def _prep(origins, directions, accel, slot_mask, capb):
    """Shared wrapper prelude: normalized rays packed (B, 8, R), the
    (possibly tri-masked) live flag folded into the stream, per-bundle
    survivor lists/counts, and the overflow predicate.  Returns the
    EFFECTIVE capb (None = n_clusters, i.e. overflow-proof; otherwise
    clamped to n_clusters — the list rows can't be wider than the
    cluster count, and the kernel strides by this value)."""
    capb = int(accel["n_clusters"]) if capb is None \
        else min(int(capb), int(accel["n_clusters"]))
    o = jnp.asarray(origins, F32)
    d = ml.safe_normalize(jnp.asarray(directions, F32), xp=jnp)
    B, R = o.shape[:2]
    if R % 128:
        raise ValueError(f"rays per bundle must be a 128 multiple, "
                         f"got {R}")
    rays = jnp.concatenate([
        jnp.swapaxes(o, 1, 2),                 # (B, 3, R)
        jnp.swapaxes(d, 1, 2),
        jnp.zeros((B, 2, R), F32)], axis=1)    # (B, 8, R)

    stream = accel["tri_stream"]
    if slot_mask is not accel["slot_ok"]:
        stream = stream.at[10].set(slot_mask.astype(F32))

    alive, t0 = rt_accel._bundles_alive_entry(o, d, accel,
                                              slot_mask)     # (B, NC)
    counts = jnp.sum(alive.astype(I32), axis=1)
    # Survivors ordered FRONT-TO-BACK by conservative entry time: the
    # any-hit fold exits as soon as every ray is occluded (near
    # occluders come first), and the nearest fold exits once every
    # ray's winner precedes the next entry time (kernel docstring) —
    # both bit-exact.  The sorted entry times stream to the kernel
    # quantized ×64/floor as i32 (conservative: t0q/64 ≤ t0; negatives
    # — origin inside the AABB — clamp to 0, disabling the exit test
    # for that step).
    keyed = jnp.where(alive, t0, BIG)
    order = jnp.argsort(keyed, axis=1).astype(I32)[:, :capb]
    t0s = jnp.take_along_axis(keyed, order, axis=1)
    # The sorted entry times (×64, floor — clamping DOWN keeps the exit
    # test conservative) ride as a lane-padded per-bundle VMEM row; the
    # cluster-id lists stay a plain SMEM array (SMEM could not hold a
    # second (B·capb,) array at 720p, and VMEM is plentiful).
    capb_p = -(-capb // 128) * 128
    t0q = jnp.clip(jnp.floor(t0s * F32(64.0)), 0.0, 2.0 ** 30
                   ).astype(I32)
    t0q = jnp.pad(t0q, ((0, 0), (0, capb_p - capb)))[:, None, :]
    overflow = jnp.max(counts) > capb
    return (o, d, rays, stream, order.reshape(-1), counts,
            t0q, overflow, B, R, capb)


def raycast_bundles_nearest_pl(origins, directions, world: Dict,
                               accel: Dict, *, capb=None,
                               face_mask: int = rc_mod.FACE_MASK_NONE,
                               tri_mask=None, interpret: bool = False):
    """Kernel-swept raycast_bundles_nearest (same contract/result dict
    as rt_accel.raycast_bundles_nearest; capb = per-bundle survivor
    capacity, overflow falls back to brute for the whole call)."""
    slot_mask = accel["slot_ok"]
    if tri_mask is not None:
        slot_mask = slot_mask & jnp.take(jnp.asarray(tri_mask, bool),
                                         accel["perm"])
    (o, d, rays, stream, lists, counts, t0q, overflow,
     B, R, capb) = _prep(origins, directions, accel, slot_mask, capb)

    def pair_path(_):
        tbest, wtri_i = _sweep_pl(rays, stream, lists, counts, t0q,
                                  B, R, capb, False, face_mask, interpret)
        wtri = wtri_i
        hit = wtri < NOTRI
        wtri = jnp.where(hit, wtri, 0).astype(I32)
        if "geom_table" in world:
            # One (T, 18) row-gather (ops/raytrace.build_rt_world) in
            # place of six separate takes — each small take op costs
            # ~0.7 ms of launch overhead at frame scale (measured v5e).
            g = jnp.take(world["geom_table"], wtri, axis=0)
            wv0, we1, we2 = g[..., 0:3], g[..., 3:6], g[..., 6:9]
            n0, n1, n2 = g[..., 9:12], g[..., 12:15], g[..., 15:18]
        else:
            wv0 = jnp.take(world["v0"], wtri, axis=0)
            we1 = jnp.take(world["v1"], wtri, axis=0) - wv0
            we2 = jnp.take(world["v2"], wtri, axis=0) - wv0
            n0 = jnp.take(world["n0"], wtri, axis=0)
            n1 = jnp.take(world["n1"], wtri, axis=0)
            n2 = jnp.take(world["n2"], wtri, axis=0)
        _ok, _t, u, v = rt_accel._mt_block(o, d, wv0, we1, we2, face_mask)
        w = F32(1.0) - u - v
        normal = ml.safe_normalize(
            n0 * w[..., None] + n1 * u[..., None] + n2 * v[..., None],
            xp=jnp)
        dist = jnp.where(hit, tbest, BIG)
        point = o + d * jnp.where(hit, dist, F32(0))[..., None]
        return {
            "hit": hit,
            "distance": dist,
            "point": jnp.where(hit[..., None], point,
                               jnp.zeros_like(point)),
            "normal": jnp.where(hit[..., None], normal,
                                jnp.zeros_like(normal)),
            "tri": wtri,
            # winner barycentrics: consumers (ops/raytrace._shade_hits)
            # reuse them instead of re-gathering corner data per ray
            "u": u, "v": v,
        }

    def brute_path(_):
        def one(args):
            ob, db = args
            res = rc_mod.raycast_batch(ob, db, world,
                                       face_mask=face_mask,
                                       tri_mask=tri_mask)
            wv0 = jnp.take(world["v0"], res["tri"], axis=0)
            we1 = jnp.take(world["v1"], res["tri"], axis=0) - wv0
            we2 = jnp.take(world["v2"], res["tri"], axis=0) - wv0
            _ok, _t, u, v = rt_accel._mt_block(ob, ml.safe_normalize(
                jnp.asarray(db, F32), xp=jnp), wv0, we1, we2, face_mask)
            res["u"] = u
            res["v"] = v
            return res
        return jax.lax.map(one, (o, d))

    out = jax.lax.cond(overflow, brute_path, pair_path, None)
    out["n_pairs"] = jnp.sum(counts)
    out["overflow"] = overflow
    return out


def raycast_bundles_any_pl(origins, directions, world: Dict, accel: Dict,
                           *, capb=None,
                           face_mask: int = rc_mod.FACE_MASK_NONE,
                           tri_mask=None, interpret: bool = False):
    """Kernel-swept occlusion raycast (rt_accel.raycast_bundles_any
    contract)."""
    slot_mask = accel["slot_ok"]
    if tri_mask is not None:
        slot_mask = slot_mask & jnp.take(jnp.asarray(tri_mask, bool),
                                         accel["perm"])
    (o, d, rays, stream, lists, counts, t0q, overflow,
     B, R, capb) = _prep(origins, directions, accel, slot_mask, capb)

    def pair_path(_):
        _t, hits = _sweep_pl(rays, stream, lists, counts, t0q,
                             B, R, capb, True, face_mask, interpret)
        return hits > 0

    def brute_path(_):
        def one(args):
            ob, db = args
            return rc_mod.raycast_batch(ob, db, world,
                                        face_mask=face_mask,
                                        tri_mask=tri_mask)["hit"]
        return jax.lax.map(one, (o, d))

    hit = jax.lax.cond(overflow, brute_path, pair_path, None)
    return {"hit": hit, "n_pairs": jnp.sum(counts), "overflow": overflow}
