"""Single-pass Pallas tile renderer: fold + resolve + interpolate in-kernel.

Second-generation Pallas path (replacing the round-1 two-pass G-buffer
kernel as the `RenderParams.use_pallas` route).  That kernel lost to the XLA fused
path for three measured reasons (scripts/profile_kernels.py, BENCHMARKS.md):
two streaming passes over the same bins, a raw 3-vertex payload G-buffer
(~128 f32/pixel → ~1 GB/frame of HBM round-trip at 1080p), and 128-lane
chunks that pad sparse bins ~10× (dust2 @1080p: mean segment 9.7 triangles,
65 % of tiles empty, 49 global triangles).  This kernel fixes all three:

  * ONE pass per stream: the per-chunk winner is resolved immediately with
    a one-hot (S, kp3)×(S, tpx) MXU matmul and merged into scratch refs
    (best depth / index / winner payload) — stream data is DMA'd once.
  * Sub-chunk predication: chunks stay 128-lane (DMA alignment) but are
    evaluated in 32-lane sub-chunks, each skipped with @pl.when unless it
    overlaps the tile's live [offset, offset+count) range — a mean-9.7
    segment costs one 32-wide evaluation instead of 128.
  * The GLOBAL list (bbox span > span_cap: the near walls / floor) rides in
    VMEM as a normal pallas input (constant index map → loaded once, not
    per tile); a DMA tail loop keeps exactness if it ever exceeds the
    resident cap.
  * Perspective-correct interpolation (Rasterizer.cs:566-640 semantics,
    matching binning.render_binned_fused) runs IN-kernel on the winner
    payload, so the G-buffer shrinks to the interpolated varyings the
    fragment shader declared (~16-24 f32/pixel): ~6× less HBM traffic.

Fragment shading stays one full-frame XLA pass over the compact G-buffer
(texture-atlas gathers don't lower inside Mosaic), followed by the same
blend/depth merge as the fused path.  LESS_EQUAL depth only (the game's
mode; everything else falls back to the XLA paths in the engine).

Reference parity: the per-pixel depth-test/interpolate loop this replaces
is /root/reference/Rasterizer.cs:462-538 (tile loop) + :566-640
(Interpolate); the lexicographic (depth, submission index) fold reproduces
its sequential new >= old semantics exactly (PARITY.md).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from softwarerenderer_tpu.config import DepthTest, RenderParams
from softwarerenderer_tpu.ops.binning import _cdiv, bin_triangles
from softwarerenderer_tpu.ops.geometry import unflatten_varyings
from softwarerenderer_tpu.ops.raster import _blend, DEPTH_CLEAR

F32 = jnp.float32
N_FIELDS = 16     # setup-stream rows: s0x s0y s1x s1y s2x s2y d0 d1 d2 ia idx


def _build_streams(tris, bins, payload, glob_idx=None, attr_perm=None):
    """Gather the per-stream setup and payload rows.

    glob_idx: the (possibly params.global_cap-truncated) prefix of
    bins["order"] to stream; None = the full order.
    attr_perm: lazy-compaction permutation (geometry.compact_triangles
    lazy_attrs) — `payload` then holds FULL pre-compaction rows and the
    gathers compose perm[idx], which reproduces the eager path's rows
    exactly (payload_c[i] == payload_full[perm[i]] for every slot)."""
    screen = tris["screen"]
    depth = tris["depth"]
    inv_area = jnp.where(tris["valid"], tris["inv_area"], 0.0)
    n = screen.shape[0]
    idx_f = jnp.arange(n, dtype=F32)
    zeros = jnp.zeros_like(idx_f)
    setup = jnp.stack([
        screen[:, 0, 0], screen[:, 0, 1],
        screen[:, 1, 0], screen[:, 1, 1],
        screen[:, 2, 0], screen[:, 2, 1],
        depth[:, 0], depth[:, 1], depth[:, 2],
        inv_area, idx_f, zeros, zeros, zeros, zeros, zeros,
    ])                                                    # (16, N)
    if glob_idx is None:
        glob_idx = bins["order"]
    seg_idx = bins["sorted_tri"]
    glob_setup = jnp.take(setup, glob_idx, axis=1)
    seg_setup = jnp.take(setup, seg_idx, axis=1)
    if attr_perm is not None:
        glob_idx = jnp.take(attr_perm, glob_idx)
        seg_idx = jnp.take(attr_perm, seg_idx)
    glob_payload = jnp.take(payload, glob_idx, axis=0)
    seg_payload = jnp.take(payload, seg_idx, axis=0)
    return glob_setup, seg_setup, glob_payload, seg_payload

SUB = 32          # sub-chunk width (predicated evaluation granularity)
GLOB_RESIDENT = 256   # global triangles kept in VMEM (dust2 @1080p: 49)


def _kernel(ntx, nty, tile_h, tile_w, chunk, kp, kp3, kp3_dma,
            kpi, interp_plan, sl_screen, sl_ia, clip_w_off, interpret, peel,
            # scalar prefetch (row_offset rides SMEM so the sharded path
            # can pass its traced per-shard band offset)
            starts_ref, counts_ref, nglob_ref, rowoff_ref,
            # inputs (prevd/previ present only when peel — depth peeling)
            fbd_ref, *rest):
    if peel:
        (prevd_ref, previ_ref, globres_ref, globres_pl_ref,
         glob_ref, seg_ref, glob_pl_ref, seg_pl_ref,
         gbuf_ref, outd_ref, outi_ref,
         bd_ref, bi_ref, bpl_ref, buf_ref, plbuf_ref, sem_ref,
         plsem_ref) = rest
    else:
        prevd_ref = previ_ref = None
        (globres_ref, globres_pl_ref,
         glob_ref, seg_ref, glob_pl_ref, seg_pl_ref,
         gbuf_ref, outd_ref, outi_ref,
         bd_ref, bi_ref, bpl_ref, buf_ref, plbuf_ref, sem_ref,
         plsem_ref) = rest
    i = pl.program_id(0)
    ty = i // ntx
    tx = i % ntx
    tpx = tile_h * tile_w

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tpx), 1)
    px = (lane % tile_w + tx * tile_w).astype(F32)
    # rowoff is a PER-TILE-ROW offset map (scalar prefetch, SMEM): a
    # contiguous band fills it with one constant; the balanced fb-sharded
    # mode maps each local tile row to an arbitrary global row
    # (ops/binning.py tile_row_map semantics, now in-kernel).
    py = (lane // tile_w + ty * tile_h + rowoff_ref[ty]).astype(F32)

    n_global = nglob_ref[0]
    start = starts_ref[i]
    count = counts_ref[i]

    bd_ref[...] = fbd_ref[...].reshape(1, tpx)
    bi_ref[...] = jnp.full((1, tpx), -1.0, dtype=F32)
    bpl_ref[...] = jnp.zeros((kp3, tpx), F32)
    if peel:
        # Read + relayout the previous winner maps ONCE here — inside
        # eval_merge they would be re-read and re-reshaped per sub-chunk
        # (a full-tile sublane→lane relayout each time, measured ~8×
        # slower end-to-end).
        peel_d = prevd_ref[...].reshape(1, tpx)
        peel_i = previ_ref[...].reshape(1, tpx)
        # Tile-granular eligibility (r4): a tile whose prev maps admit
        # nothing (every pixel reset by the opaque short-circuit — the
        # common sparse-translucency case: a few windows/particles in
        # an opaque frame) skips ALL stream folds; its outputs stay at
        # the clear init, which the peel condition already treats as
        # "admit nothing" downstream.  The pass-level lax.cond skip
        # (engine) still handles the all-opaque frame wholesale.
        run_folds = jnp.max(peel_i) >= F32(0)
    else:
        run_folds = None

    def eval_merge(cols, pl_rows, base_pos, lo, hi):
        """Fold + resolve one (N_FIELDS, SUB) sub-chunk into the scratch
        refs.  Stream positions base_pos..base_pos+SUB-1; only positions in
        [lo, hi) are live."""
        col = lambda k: cols[k, :][:, None]                    # (SUB, 1)
        s0x, s0y, s1x, s1y = col(0), col(1), col(2), col(3)
        s2x, s2y = col(4), col(5)
        d0, d1, d2, ia, idx = col(6), col(7), col(8), col(9), col(10)
        w0 = (s1y - s2y) * (px - s1x) + (s2x - s1x) * (py - s1y)
        w1 = (s2y - s0y) * (px - s2x) + (s0x - s2x) * (py - s2y)
        w2 = (s0y - s1y) * (px - s0x) + (s1x - s0x) * (py - s0y)
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
                 ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
        pos = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0) + base_pos
        ok = inside & (pos >= lo) & (pos < hi)
        d = d0 * (w0 * ia) + d1 * (w1 * ia) + d2 * (w2 * ia)
        if peel:
            # Depth peeling (K-buffer): admit only fragments strictly
            # worse-ranked than the previous pass's per-pixel winner under
            # the lexicographic (depth, submission index) LESS_EQUAL order.
            # `idx != pi` additionally pins out the exact previous winner
            # so a 1-ulp depth wobble can never re-admit it (which would
            # double-blend that fragment in the replay).
            if interpret:
                # keep the d used here and the d used in the fold identical
                # under XLA rematerialization (see the dm barrier below)
                d = jax.lax.optimization_barrier(d)
            ok = ok & (idx != peel_i) & (
                (d < peel_d) | ((d == peel_d) & (idx < peel_i)))

        # LESS_EQUAL fold: lexicographic (depth, submission index) max;
        # ties across sub-chunks/streams break on index (later wins),
        # matching binning.merge() (Rasterizer.cs:546 "new >= old").
        #
        # EVERYTHING below derives from the single barriered `dm` array.
        # Without the barrier the compiler may rematerialize the edge
        # functions into each consumer with different FMA contraction, and
        # a borderline `inside` predicate then flips between the fold and
        # the one-hot resolve — the fold records a winner whose payload
        # the resolve never selects (measured in interpret mode).
        dm = jnp.where(ok, d, F32(-jnp.inf))
        if interpret:
            # Mosaic computes each SSA value once (no barrier needed, and
            # it has no lowering for one); the XLA interpret path does
            # rematerialize, so pin the value there.
            dm = jax.lax.optimization_barrier(dm)
        cand_d = jnp.max(dm, axis=0, keepdims=True)            # (1, tpx)
        has = cand_d > F32(-jnp.inf)
        at = (dm == cand_d) & has
        cand_i = jnp.max(jnp.where(at, idx, F32(-1.0)), axis=0,
                         keepdims=True)
        best_d = bd_ref[...]
        best_i = bi_ref[...]
        take = has & (cand_i > F32(-1.0)) & (
            (cand_d > best_d) | ((cand_d == best_d) & (cand_i > best_i)))

        # Winner payload for this sub-chunk via one-hot matmul, laid out
        # (fields, pixels) so later field reads are cheap sublane slices.
        # pl_rows arrives at the 128-lane DMA width; the matmul and the
        # (kp3, tpx) merge below use only the real payload columns — the
        # full-width merge is the kernel's dominant VMEM traffic.
        onehot = (at & (idx == cand_i)).astype(F32)            # (SUB, tpx)
        cand_pl = jax.lax.dot_general(
            pl_rows[:, :kp3], onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (kp3, tpx)
        bpl_ref[...] = jnp.where(take, cand_pl, bpl_ref[...])
        bd_ref[...] = jnp.where(take, cand_d, best_d)
        bi_ref[...] = jnp.where(take, cand_i, best_i)

    # ---- resident globals: VMEM inputs, no DMA ---------------------------
    def live_pred(cond):
        return cond if run_folds is None else (run_folds & cond)

    n_res = jnp.minimum(n_global, GLOB_RESIDENT)
    for k in range(GLOB_RESIDENT // SUB):
        @pl.when(live_pred(k * SUB < n_res))
        def _(k=k):
            eval_merge(globres_ref[:, k * SUB:(k + 1) * SUB],
                       globres_pl_ref[k * SUB:(k + 1) * SUB, :],
                       k * SUB, 0, n_res)

    # ---- streamed folds: double-buffered 128-lane DMA, 32-lane eval ------
    def fold_stream(stream_ref, pl_ref, offset, length):
        abase = (offset // chunk) * chunk
        lead = offset - abase
        total = lead + length
        n_chunks = (total + chunk - 1) // chunk

        def get_dmas(slot, c):
            s0 = pl.multiple_of(abase + c * chunk, chunk)
            return (pltpu.make_async_copy(
                        stream_ref.at[:, pl.ds(s0, chunk)],
                        buf_ref.at[slot], sem_ref.at[slot]),
                    pltpu.make_async_copy(
                        pl_ref.at[pl.ds(s0, chunk), :],
                        plbuf_ref.at[slot], plsem_ref.at[slot]))

        @pl.when(n_chunks > 0)
        def _():
            for dma in get_dmas(0, 0):
                dma.start()

        def body(c, carry):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in get_dmas((c + 1) % 2, c + 1):
                    dma.start()
            d1, d2 = get_dmas(slot, c)
            d1.wait()
            d2.wait()
            for s in range(chunk // SUB):
                base_pos = c * chunk + s * SUB
                live = (base_pos < total) & (base_pos + SUB > lead)

                @pl.when(live)
                def _(s=s, base_pos=base_pos, slot=slot):
                    eval_merge(buf_ref[slot][:, s * SUB:(s + 1) * SUB],
                               plbuf_ref[slot][s * SUB:(s + 1) * SUB, :],
                               base_pos, lead, total)
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)

    # Global tail past the resident cap (rare; keeps exactness).
    @pl.when(live_pred(n_global > GLOB_RESIDENT))
    def _():
        fold_stream(glob_ref, glob_pl_ref, GLOB_RESIDENT,
                    n_global - GLOB_RESIDENT)

    @pl.when(live_pred(count > 0))
    def _():
        fold_stream(seg_ref, seg_pl_ref, start, count)

    # ---- in-kernel perspective-correct interpolation ---------------------
    # (Rasterizer.cs:566-640; identical math to binning.render_binned_fused)
    def row(v, f):
        return bpl_ref[v * kp + f:v * kp + f + 1, :]           # (1, tpx)

    ia = row(0, sl_ia)
    s0x, s0y = row(0, sl_screen), row(0, sl_screen + 1)
    s1x, s1y = row(1, sl_screen), row(1, sl_screen + 1)
    s2x, s2y = row(2, sl_screen), row(2, sl_screen + 1)
    w0 = ((s1y - s2y) * (px - s1x) + (s2x - s1x) * (py - s1y)) * ia
    w1 = ((s2y - s0y) * (px - s2x) + (s0x - s2x) * (py - s2y)) * ia
    w2 = ((s0y - s1y) * (px - s0x) + (s1x - s0x) * (py - s0y)) * ia
    cw0, cw1, cw2 = (row(0, clip_w_off), row(1, clip_w_off),
                     row(2, clip_w_off))
    rcp_a = w0 / jnp.where(cw0 == 0, F32(1), cw0)
    rcp_b = w1 / jnp.where(cw1 == 0, F32(1), cw1)
    rcp_c = w2 / jnp.where(cw2 == 0, F32(1), cw2)
    wsum = rcp_a + rcp_b + rcp_c
    wgt = F32(1.0) / jnp.where(wsum == 0, F32(1), wsum)
    wa, wb, wc = rcp_a * wgt, rcp_b * wgt, rcp_c * wgt

    def pc(f):    # perspective-correct
        return (row(0, f) * rcp_a + row(1, f) * rcp_b
                + row(2, f) * rcp_c) * wgt

    def pw(f):    # screen-space (Data dict channel semantics)
        return row(0, f) * wa + row(1, f) * wb + row(2, f) * wc

    def out(c, val):
        # Planar G-buffer write: the (1, tpx)->(th, tw) relayout happens
        # HERE in VMEM (like outd below) so the host-side consumer reads
        # (kpi, H, W) planes directly with no XLA untile transpose.
        gbuf_ref[c:c + 1, :, :] = val.reshape(1, tile_h, tile_w)

    j = 0
    for kind, lo, hi in interp_plan:
        width = hi - lo
        if kind == "pw3":     # 3-vector Data channel: renormalize
            # val / sqrt(lsq) exactly (NOT rsqrt: approximate on TPU and
            # would diverge from the XLA fused path's interpolation).
            v0, v1, v2 = pw(lo), pw(lo + 1), pw(lo + 2)
            lsq = v0 * v0 + v1 * v1 + v2 * v2
            den = jnp.sqrt(jnp.where(lsq > 0, lsq, F32(1)))
            keep = lsq > F32(1e-6)
            out(j, jnp.where(keep, v0 / den, v0))
            out(j + 1, jnp.where(keep, v1 / den, v1))
            out(j + 2, jnp.where(keep, v2 / den, v2))
        elif kind == "pw":
            for f in range(lo, hi):
                out(j + f - lo, pw(f))
        elif kind == "pc":
            for f in range(lo, hi):
                out(j + f - lo, pc(f))
        elif kind == "bary":
            out(j, wa)
            out(j + 1, wb)
            out(j + 2, wc)
            width = 3
        elif kind == "v0":    # per-triangle scalar (tex id, mesh id)
            out(j, row(0, lo))
            width = 1
        j += width
    for c in range(j, kpi):
        out(c, jnp.zeros((1, tpx), F32))

    outd_ref[...] = bd_ref[...].reshape(tile_h, tile_w)
    outi_ref[...] = bi_ref[...].reshape(tile_h, tile_w).astype(jnp.int32)


def _prepare_ctx(tris: Dict, params: RenderParams, fb_depth,
                 per_tri_extra: Optional[Dict], row_offset,
                 gb_keep=None, tile_row_map=None, full_height=None):
    """Bin, pack the payload, build the streams and the interpolation plan
    — everything a kernel pass needs that is independent of peeling state.
    Shared by the opaque single-pass path and the K-buffer peeled passes
    (which reuse one ctx for all K kernel invocations).

    gb_keep: optional frozenset of flat varying names the fragment shader
    declared it reads (its `varyings` registry).  When given, G-buffer
    channels nothing reads are never written: clip_position shrinks to its
    z channel alone (the fog input; x/y/w are re-exposed as zeros) unless
    "clip_position" itself is declared, and the barycentric planes are
    emitted only when "barycentric" is declared.  None keeps everything
    (registry-less custom shaders).

    tile_row_map (traced (params.height // tile_h,) i32, with
    full_height): this pass owns an ARBITRARY set of GLOBAL tile rows —
    the load-balanced fb-sharding mode (parallel.sharding
    balanced="rows", same semantics as binning.visibility_binned's
    tile_row_map): binning runs over the FULL frame, the owned tiles'
    segment starts/counts are gathered, and the kernel's per-tile-row
    scalar-prefetch offset map carries each local row's global pixel
    row, so the edge/interp arithmetic stays bit-identical to the
    unsharded kernel.  Requires params.tile_h <= 32 (the kernel's VMEM
    tile height) and height a tile_h multiple."""
    tile_w = params.tile_w
    # VMEM budget: bpl (kp3, tpx) + eval intermediates (SUB, tpx)×~8 +
    # payload buffers; tpx = 32·128 keeps the total ≈ 10 MB.
    tile_h = min(params.tile_h, 32)
    chunk = 128                       # DMA granularity (lane alignment)
    H, W = params.height, params.width
    nty, ntx = _cdiv(H, tile_h), _cdiv(W, tile_w)
    ntiles = nty * ntx
    Hp, Wp = nty * tile_h, ntx * tile_w
    tpx = tile_h * tile_w

    if tile_row_map is not None:
        if tile_h != params.tile_h:
            raise ValueError(
                f"tile_row_map mode needs params.tile_h <= 32 (kernel "
                f"tile height), got {params.tile_h}")
        if H % tile_h:
            raise ValueError("height must be a tile_h multiple for "
                             "tile_row_map mode")
        bins = bin_triangles(tris, params.replace(height=full_height),
                             tile_h, tile_w, params.span_cap, 0)
        trm = jnp.asarray(tile_row_map, jnp.int32)
        gids = (trm[:, None] * ntx
                + jnp.arange(ntx, dtype=jnp.int32)[None, :]).reshape(-1)
        starts = jnp.take(bins["starts"], gids)
        counts = jnp.take(bins["counts"], gids)
        rowoff_arr = (trm - jnp.arange(nty, dtype=jnp.int32)) * tile_h
    else:
        bins = bin_triangles(tris, params, tile_h, tile_w, params.span_cap,
                             row_offset)
        starts = bins["starts"]
        counts = bins["counts"]
        rowoff_arr = jnp.broadcast_to(
            jnp.asarray(row_offset, jnp.int32).reshape(()), (nty,))

    # ---- packed per-triangle payload (fused-path layout) -----------------
    # When the shader's registry allows it, clip_position is packed as its
    # (z, w) channels only — x/y are read by nothing downstream (z feeds
    # fog, w the perspective division) and dropping them narrows the
    # winner-merge scratch, the kernel's dominant VMEM traffic.
    #
    # Lazy compaction (geometry.compact_triangles lazy_attrs): the payload
    # is packed from the FULL pre-compaction rows riding in "attr_full"
    # (elementwise — no gather) and _build_streams composes "attr_perm"
    # into its row gathers, so payload-gather cost scales with the stream
    # lengths (params.pair_cap / global_cap) instead of active_cap × the
    # 128-padded payload width.
    attr_perm = tris.get("attr_perm")
    src = tris["attr_full"] if attr_perm is not None else tris
    src_extra = (src["extra"] if attr_perm is not None else per_tri_extra) \
        or {}
    prune_clip = gb_keep is not None and "clip_position" not in gb_keep
    keys = sorted(src["attrs"].keys())
    parts, slices, off = [], {}, 0
    for k in keys:
        arr = src["attrs"][k]
        if k == "clip_position" and prune_clip:
            arr = arr[..., 2:4]
        parts.append(arr)
        slices[k] = (off, off + arr.shape[-1])
        off += arr.shape[-1]
    n = src["screen"].shape[0]
    parts.append(src["screen"])
    sl_screen = off; off += 2
    parts.append(jnp.broadcast_to(src["inv_area"][:, None, None], (n, 3, 1)))
    sl_ia = off; off += 1
    extra_keys = sorted(per_tri_extra.keys()) if per_tri_extra else []
    extra_slices = {}
    for k in extra_keys:
        v = jnp.asarray(src_extra[k], F32)[:, None, None]
        parts.append(jnp.broadcast_to(v, (n, 3, 1)))
        extra_slices[k] = off
        off += 1
    kp = off
    # Two widths: the HBM stream / DMA buffers must keep a 128-aligned
    # lane dim (Mosaic rejects sub-128 lane slices: "Slice shape along
    # dimension 1 must be aligned to tiling (128)" — re-verified on v5e),
    # but the winner-payload SCRATCH has lanes = tpx with kp3 as its
    # sublane dim, so it only needs 8-alignment — and the full-width
    # (kp3, tpx) where-merge per sub-chunk is the kernel's dominant VMEM
    # traffic.  (A bf16 payload/merge was measured SLOWER on v5e —
    # 12.5 vs 10.7 ms/frame — see BENCHMARKS.md negative results.)
    kp3 = _cdiv(3 * kp, 8) * 8
    kp3_dma = _cdiv(3 * kp, 128) * 128
    payload = jnp.concatenate(parts, axis=-1).reshape(n, 3 * kp)
    payload = jnp.where(src["valid"][:, None], payload, 0.0)
    payload = jnp.pad(payload, ((0, 0), (0, kp3_dma - 3 * kp)))
    clip_w_off = slices["clip_position"][1] - 1

    # ---- interpolation plan → G-buffer channel map -----------------------
    interp_plan = []          # (kind, payload_lo, payload_hi)
    gb_slices = {}            # gbuf channel ranges per output
    j = 0
    for k in keys:
        lo, hi = slices[k]
        if k == "clip_position" and prune_clip:
            # Only clip z (the fog input) survives to the G-buffer; the
            # consumer rebuilds x/y/w as zeros (DCE'd when unread).  The
            # payload slice is (z, w), so z sits at `lo`.
            interp_plan.append(("pc", lo, lo + 1))
            gb_slices["clip_z"] = (j, j + 1)
            j += 1
            continue
        if k.startswith("data.") and hi - lo == 3:
            interp_plan.append(("pw3", lo, hi))
        elif k.startswith("data."):
            interp_plan.append(("pw", lo, hi))
        else:
            interp_plan.append(("pc", lo, hi))
        gb_slices[k] = (j, j + hi - lo)
        j += hi - lo
    if gb_keep is None or "barycentric" in gb_keep:
        interp_plan.append(("bary", 0, 0))
        gb_slices["barycentric"] = (j, j + 3)
        j += 3
    for k in extra_keys:
        interp_plan.append(("v0", extra_slices[k], 0))
        gb_slices["tri." + k] = (j, j + 1)
        j += 1
    kpi = _cdiv(j, 8) * 8

    # ---- streams ----------------------------------------------------------
    # params.global_cap: stream only the first global_cap order entries —
    # globals lead the order in submission order, so the truncation is
    # exact whenever the frame's global count fits (overflow drops the
    # last-submitted globals; binning.global_count is the runtime guard).
    # The kernel's n_global bound is clamped to match so the DMA never
    # reads past the truncated stream.
    gcap = int(getattr(params, "global_cap", 0) or 0)
    n_global = bins["n_global"]
    glob_idx = None
    if gcap and gcap < bins["order"].shape[0]:
        gcap = max(gcap, GLOB_RESIDENT)
        glob_idx = bins["order"][:gcap]
        n_global = jnp.minimum(n_global, gcap)
    glob_s, seg_s, glob_p, seg_p = _build_streams(tris, bins, payload,
                                                  glob_idx, attr_perm)

    def pad_streams(s, p, min_len):
        ln = s.shape[1]
        ln_pad = max(_cdiv(max(ln, 1), chunk) * chunk + chunk, min_len)
        return (jnp.pad(s, ((0, 0), (0, ln_pad - ln))),
                jnp.pad(p, ((0, ln_pad - ln), (0, 0))))
    glob_s, glob_p = pad_streams(glob_s, glob_p, GLOB_RESIDENT)
    seg_s, seg_p = pad_streams(seg_s, seg_p, 0)
    globres = glob_s[:, :GLOB_RESIDENT]
    globres_pl = glob_p[:GLOB_RESIDENT]

    fbd = jnp.pad(fb_depth, ((0, Hp - H), (0, Wp - W)))

    return dict(
        tile_h=tile_h, tile_w=tile_w, chunk=chunk, H=H, W=W, Hp=Hp, Wp=Wp,
        ntx=ntx, nty=nty, ntiles=ntiles, tpx=tpx, kp=kp, kp3=kp3,
        kp3_dma=kp3_dma, kpi=kpi, interp_plan=tuple(interp_plan),
        gb_slices=gb_slices, extra_keys=extra_keys, sl_screen=sl_screen,
        sl_ia=sl_ia, clip_w_off=clip_w_off, row_offset=row_offset,
        starts=starts, counts=counts,
        n_global=jnp.asarray([n_global], jnp.int32),
        row_offset_arr=rowoff_arr,
        fbd=fbd, globres=globres, globres_pl=globres_pl,
        glob_s=glob_s, seg_s=seg_s, glob_p=glob_p, seg_p=seg_p)


def _run_pass(ctx: Dict, interpret: bool, prev_d=None, prev_i=None,
              raw: bool = False):
    """One kernel invocation over a prepared ctx.  With (prev_d, prev_i)
    — padded (Hp, Wp) f32 maps of the previous pass's winner — the fold
    peels: it keeps the best fragment strictly worse-ranked than that
    winner.  Returns (frag dict for the shader, padded best_d, padded
    best_i); raw=True returns the planar (kpi, Hp, Wp) G-buffer in the
    frag slot instead (see _frag_from_planes)."""
    peel = prev_d is not None
    (tile_h, tile_w, ntx, nty, ntiles, tpx, kpi, kp3_dma, Hp, Wp, H, W) = (
        ctx["tile_h"], ctx["tile_w"], ctx["ntx"], ctx["nty"], ctx["ntiles"],
        ctx["tpx"], ctx["kpi"], ctx["kp3_dma"], ctx["Hp"], ctx["Wp"],
        ctx["H"], ctx["W"])
    tile_spec = pl.BlockSpec((tile_h, tile_w),
                             lambda i, *_: (i // ntx, i % ntx))
    in_specs = [tile_spec]
    if peel:
        in_specs += [tile_spec, tile_spec]
    in_specs += [
        pl.BlockSpec((N_FIELDS, GLOB_RESIDENT), lambda i, *_: (0, 0)),
        pl.BlockSpec((GLOB_RESIDENT, kp3_dma), lambda i, *_: (0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((kpi, tile_h, tile_w),
                         lambda i, *_: (0, i // ntx, i % ntx)),
            tile_spec,
            tile_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tpx), jnp.float32),        # best depth
            pltpu.VMEM((1, tpx), jnp.float32),        # best index
            pltpu.VMEM((ctx["kp3"], tpx), jnp.float32),   # winner payload
            pltpu.VMEM((2, N_FIELDS, ctx["chunk"]), jnp.float32),
            pltpu.VMEM((2, ctx["chunk"], kp3_dma), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, ntx, nty, tile_h, tile_w, ctx["chunk"],
        ctx["kp"], ctx["kp3"], kp3_dma, kpi, ctx["interp_plan"],
        ctx["sl_screen"], ctx["sl_ia"], ctx["clip_w_off"], interpret, peel)
    inputs = [ctx["fbd"]]
    if peel:
        inputs += [prev_d, prev_i]
    inputs += [ctx["globres"], ctx["globres_pl"], ctx["glob_s"],
               ctx["seg_s"], ctx["glob_p"], ctx["seg_p"]]
    gbuf, best_d, best_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((kpi, Hp, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)],
        interpret=interpret,
    )(ctx["starts"], ctx["counts"], ctx["n_global"],
      ctx["row_offset_arr"], *inputs)

    if raw:
        # Planar G-buffer handed back untouched: the K-buffer peel's
        # segment-compacted shading gathers live segments from it with
        # ONE take before building the frag dict.
        return gbuf, best_d, best_i
    return (_frag_from_planes(ctx, gbuf[:, :H, :W]), best_d, best_i)


def _frag_from_planes(ctx: Dict, planes):
    """Shader frag dict from (kpi, ...) G-buffer planes — shape-agnostic
    past the plane axis (full (H, W) frames and segment-compacted
    (cap, seg) blocks build identically)."""
    gb_slices = ctx["gb_slices"]
    flat = {k: jnp.moveaxis(planes[lo:hi], 0, -1)
            for k, (lo, hi) in gb_slices.items() if not k.startswith("tri.")}
    if "clip_z" in flat:
        # Pruned G-buffer: only z was stored.  The zero x/y/w planes are
        # dead code for any shader whose registry allowed the pruning.
        z = flat.pop("clip_z")[..., 0]
        zero = jnp.zeros_like(z)
        flat["clip_position"] = jnp.stack([zero, zero, z, zero], axis=-1)
    frag = unflatten_varyings(
        {k: v for k, v in flat.items() if k != "barycentric"})
    if "barycentric" in flat:
        frag["barycentric"] = flat["barycentric"]
    if ctx["extra_keys"]:
        frag["tri"] = {k: planes[gb_slices["tri." + k][0]].astype(jnp.int32)
                       for k in ctx["extra_keys"]}
    return frag


def _gb_keep(fragment_shader):
    """The shader's declared flat-varying reads, or None (keep all)."""
    v = getattr(fragment_shader, "varyings", None)
    return None if v is None else frozenset(v)


def _kernel_kdeep(ntx, nty, tile_h, tile_w, chunk, kp, kp3, kp3_dma, kpi,
                  interp_plan, sl_screen, sl_ia, clip_w_off, interpret, K,
                  # scalar prefetch
                  starts_ref, counts_ref, nglob_ref, rowoff_ref,
                  # inputs
                  fbd_ref, globres_ref, globres_pl_ref,
                  glob_ref, seg_ref, glob_pl_ref, seg_pl_ref,
                  # outputs
                  gbuf_ref, outd_ref, outi_ref,
                  # scratch
                  ld_ref, li_ref, pl_ref, buf_ref, plbuf_ref, sem_ref,
                  plsem_ref):
    """Single-pass K-deep fold (VERDICT r2 #3): keep the K best
    (depth, index) winners per pixel in kernel scratch during ONE
    streaming fold, then resolve all K payloads in a second in-kernel
    stream — the stream is DMA'd twice total instead of K times, and the
    fold does no payload merging at all (the peel kernel's dominant VMEM
    traffic).

    Phase A per sub-chunk: extract the sub-chunk's top-K candidates in
    rank order (K masked maxes) and bubble each through the sorted
    (K, tpx) scratch lists — (1, tpx)-row compare/swap chains, no
    payload.  Phase B per sub-chunk: for each layer, one-hot-match the
    layer's winner INDEX (unique within a tile's stream) and accumulate
    its payload row block — accumulation needs no where-merge because
    each winner index matches exactly one stream position.  Phase C
    interpolates each layer into its kpi-channel G-buffer block.

    LESS_EQUAL only (lexicographic later-wins, like the peel path)."""
    i = pl.program_id(0)
    ty = i // ntx
    tx = i % ntx
    tpx = tile_h * tile_w

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tpx), 1)
    px = (lane % tile_w + tx * tile_w).astype(F32)
    # per-tile-row offset map (see _kernel): constant for bands,
    # arbitrary global rows under balanced fb sharding.
    py = (lane // tile_w + ty * tile_h + rowoff_ref[ty]).astype(F32)

    n_global = nglob_ref[0]
    start = starts_ref[i]
    count = counts_ref[i]
    fbd = fbd_ref[...].reshape(1, tpx)

    ld_ref[...] = jnp.full((K, tpx), F32(-jnp.inf), F32)
    li_ref[...] = jnp.full((K, tpx), -1.0, F32)
    pl_ref[...] = jnp.zeros((K * kp3, tpx), F32)

    def eval_common(cols, base_pos, lo, hi):
        col = lambda k: cols[k, :][:, None]                    # (SUB, 1)
        s0x, s0y, s1x, s1y = col(0), col(1), col(2), col(3)
        s2x, s2y = col(4), col(5)
        d0, d1, d2, ia, idx = col(6), col(7), col(8), col(9), col(10)
        w0 = (s1y - s2y) * (px - s1x) + (s2x - s1x) * (py - s1y)
        w1 = (s2y - s0y) * (px - s2x) + (s0x - s2x) * (py - s2y)
        w2 = (s0y - s1y) * (px - s0x) + (s1x - s0x) * (py - s0y)
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
                 ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
        pos = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0) + base_pos
        ok = inside & (pos >= lo) & (pos < hi)
        d = d0 * (w0 * ia) + d1 * (w1 * ia) + d2 * (w2 * ia)
        return ok, d, idx

    def eval_kfold(cols, pl_rows, base_pos, lo, hi):
        ok, d, idx = eval_common(cols, base_pos, lo, hi)
        # admission vs the frame's initial depth: the reference's
        # "new >= old" against the clear/seeded buffer
        ok = ok & (d >= fbd)
        dm = jnp.where(ok, d, F32(-jnp.inf))
        if interpret:
            dm = jax.lax.optimization_barrier(dm)
        # K-list rows live as VALUES for the whole sub-chunk: one ref
        # read + one ref write instead of up to 2·K² row-sized
        # read-modify-writes (measured 67 vs 39 ms/frame at K=4 when
        # every compare/swap went through the scratch refs).
        rows_d = [ld_ref[s:s + 1, :] for s in range(K)]
        rows_i = [li_ref[s:s + 1, :] for s in range(K)]
        for _ in range(K):
            cand_d = jnp.max(dm, axis=0, keepdims=True)        # (1, tpx)
            has = cand_d > F32(-jnp.inf)
            at = (dm == cand_d) & has
            cand_i = jnp.max(jnp.where(at, idx, F32(-1.0)), axis=0,
                             keepdims=True)
            has = has & (cand_i > F32(-1.0))
            # remove exactly the picked fragment, then bubble it through
            # the sorted lists (slot 0 = highest rank)
            dm = jnp.where(at & (idx == cand_i), F32(-jnp.inf), dm)
            carry_d = jnp.where(has, cand_d, F32(-jnp.inf))
            carry_i = jnp.where(has, cand_i, F32(-1.0))
            for s in range(K):
                sd, si = rows_d[s], rows_i[s]
                go = (carry_i > F32(-1.0)) & (
                    (carry_d > sd) | ((carry_d == sd) & (carry_i > si)))
                rows_d[s] = jnp.where(go, carry_d, sd)
                rows_i[s] = jnp.where(go, carry_i, si)
                carry_d = jnp.where(go, sd, carry_d)
                carry_i = jnp.where(go, si, carry_i)
        ld_ref[...] = jnp.concatenate(rows_d, axis=0)
        li_ref[...] = jnp.concatenate(rows_i, axis=0)

    def eval_kresolve(cols, pl_rows, base_pos, lo, hi):
        # Index-only match: within one tile's processed stream every
        # triangle id appears exactly once, so accumulation resolves each
        # layer's payload without a merge.
        col = lambda k: cols[k, :][:, None]
        idx = col(10)
        pos = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0) + base_pos
        live = (pos >= lo) & (pos < hi)
        for k in range(K):
            onehot = ((idx == li_ref[k:k + 1, :]) & live).astype(F32)
            cand_pl = jax.lax.dot_general(
                pl_rows[:, :kp3], onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (kp3, tpx)
            pl_ref[k * kp3:(k + 1) * kp3, :] = \
                pl_ref[k * kp3:(k + 1) * kp3, :] + cand_pl

    def fold_stream(eval_fn, stream_ref, pl_stream_ref, offset, length):
        abase = (offset // chunk) * chunk
        lead = offset - abase
        total = lead + length
        n_chunks = (total + chunk - 1) // chunk

        def get_dmas(slot, c):
            s0 = pl.multiple_of(abase + c * chunk, chunk)
            return (pltpu.make_async_copy(
                        stream_ref.at[:, pl.ds(s0, chunk)],
                        buf_ref.at[slot], sem_ref.at[slot]),
                    pltpu.make_async_copy(
                        pl_stream_ref.at[pl.ds(s0, chunk), :],
                        plbuf_ref.at[slot], plsem_ref.at[slot]))

        @pl.when(n_chunks > 0)
        def _():
            for dma in get_dmas(0, 0):
                dma.start()

        def body(c, carry):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in get_dmas((c + 1) % 2, c + 1):
                    dma.start()
            d1, d2 = get_dmas(slot, c)
            d1.wait()
            d2.wait()
            for s in range(chunk // SUB):
                base_pos = c * chunk + s * SUB
                live = (base_pos < total) & (base_pos + SUB > lead)

                @pl.when(live)
                def _(s=s, base_pos=base_pos, slot=slot):
                    eval_fn(buf_ref[slot][:, s * SUB:(s + 1) * SUB],
                            plbuf_ref[slot][s * SUB:(s + 1) * SUB, :],
                            base_pos, lead, total)
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)

    def run_phase(eval_fn):
        n_res = jnp.minimum(n_global, GLOB_RESIDENT)
        for k in range(GLOB_RESIDENT // SUB):
            @pl.when(k * SUB < n_res)
            def _(k=k):
                eval_fn(globres_ref[:, k * SUB:(k + 1) * SUB],
                        globres_pl_ref[k * SUB:(k + 1) * SUB, :],
                        k * SUB, 0, n_res)

        @pl.when(n_global > GLOB_RESIDENT)
        def _():
            fold_stream(eval_fn, glob_ref, glob_pl_ref, GLOB_RESIDENT,
                        n_global - GLOB_RESIDENT)

        @pl.when(count > 0)
        def _():
            fold_stream(eval_fn, seg_ref, seg_pl_ref, start, count)

    run_phase(eval_kfold)
    run_phase(eval_kresolve)

    # ---- phase C: per-layer perspective-correct interpolation -----------
    for layer in range(K):
        base = layer * kp3

        def row(v, f):
            o = base + v * kp + f
            return pl_ref[o:o + 1, :]                          # (1, tpx)

        ia = row(0, sl_ia)
        s0x, s0y = row(0, sl_screen), row(0, sl_screen + 1)
        s1x, s1y = row(1, sl_screen), row(1, sl_screen + 1)
        s2x, s2y = row(2, sl_screen), row(2, sl_screen + 1)
        w0 = ((s1y - s2y) * (px - s1x) + (s2x - s1x) * (py - s1y)) * ia
        w1 = ((s2y - s0y) * (px - s2x) + (s0x - s2x) * (py - s2y)) * ia
        w2 = ((s0y - s1y) * (px - s0x) + (s1x - s0x) * (py - s0y)) * ia
        cw0, cw1, cw2 = (row(0, clip_w_off), row(1, clip_w_off),
                         row(2, clip_w_off))
        rcp_a = w0 / jnp.where(cw0 == 0, F32(1), cw0)
        rcp_b = w1 / jnp.where(cw1 == 0, F32(1), cw1)
        rcp_c = w2 / jnp.where(cw2 == 0, F32(1), cw2)
        wsum = rcp_a + rcp_b + rcp_c
        wgt = F32(1.0) / jnp.where(wsum == 0, F32(1), wsum)
        wa, wb, wc = rcp_a * wgt, rcp_b * wgt, rcp_c * wgt

        def pc(f):
            return (row(0, f) * rcp_a + row(1, f) * rcp_b
                    + row(2, f) * rcp_c) * wgt

        def pw(f):
            return row(0, f) * wa + row(1, f) * wb + row(2, f) * wc

        def out(c, val):
            gbuf_ref[layer * kpi + c:layer * kpi + c + 1, :, :] = \
                val.reshape(1, tile_h, tile_w)

        j = 0
        for kind, lo, hi in interp_plan:
            width = hi - lo
            if kind == "pw3":
                v0, v1, v2 = pw(lo), pw(lo + 1), pw(lo + 2)
                lsq = v0 * v0 + v1 * v1 + v2 * v2
                den = jnp.sqrt(jnp.where(lsq > 0, lsq, F32(1)))
                keep = lsq > F32(1e-6)
                out(j, jnp.where(keep, v0 / den, v0))
                out(j + 1, jnp.where(keep, v1 / den, v1))
                out(j + 2, jnp.where(keep, v2 / den, v2))
            elif kind == "pw":
                for f in range(lo, hi):
                    out(j + f - lo, pw(f))
            elif kind == "pc":
                for f in range(lo, hi):
                    out(j + f - lo, pc(f))
            elif kind == "bary":
                out(j, wa)
                out(j + 1, wb)
                out(j + 2, wc)
                width = 3
            elif kind == "v0":
                out(j, row(0, lo))
                width = 1
            j += width
        for c in range(j, kpi):
            out(c, jnp.zeros((1, tpx), F32))

        outd_ref[layer] = ld_ref[layer:layer + 1, :].reshape(tile_h,
                                                            tile_w)
        outi_ref[layer] = li_ref[layer:layer + 1, :].reshape(
            tile_h, tile_w).astype(jnp.int32)


def _run_pass_kdeep(ctx: Dict, K: int, interpret: bool):
    """One K-deep kernel invocation: returns (frags list of K frag dicts,
    bd (K, Hp, Wp), bi (K, Hp, Wp))."""
    (tile_h, tile_w, ntx, nty, ntiles, tpx, kpi, kp3_dma, Hp, Wp, H, W) = (
        ctx["tile_h"], ctx["tile_w"], ctx["ntx"], ctx["nty"], ctx["ntiles"],
        ctx["tpx"], ctx["kpi"], ctx["kp3_dma"], ctx["Hp"], ctx["Wp"],
        ctx["H"], ctx["W"])
    tile_spec = pl.BlockSpec((tile_h, tile_w),
                             lambda i, *_: (i // ntx, i % ntx))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ntiles,),
        in_specs=[
            tile_spec,
            pl.BlockSpec((N_FIELDS, GLOB_RESIDENT), lambda i, *_: (0, 0)),
            pl.BlockSpec((GLOB_RESIDENT, kp3_dma), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((K * kpi, tile_h, tile_w),
                         lambda i, *_: (0, i // ntx, i % ntx)),
            pl.BlockSpec((K, tile_h, tile_w),
                         lambda i, *_: (0, i // ntx, i % ntx)),
            pl.BlockSpec((K, tile_h, tile_w),
                         lambda i, *_: (0, i // ntx, i % ntx)),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, tpx), jnp.float32),            # layer depths
            pltpu.VMEM((K, tpx), jnp.float32),            # layer indices
            pltpu.VMEM((K * ctx["kp3"], tpx), jnp.float32),
            pltpu.VMEM((2, N_FIELDS, ctx["chunk"]), jnp.float32),
            pltpu.VMEM((2, ctx["chunk"], kp3_dma), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel_kdeep, ntx, nty, tile_h, tile_w, ctx["chunk"],
        ctx["kp"], ctx["kp3"], kp3_dma, kpi, ctx["interp_plan"],
        ctx["sl_screen"], ctx["sl_ia"], ctx["clip_w_off"], interpret, K)
    gbuf, bd, bi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((K * kpi, Hp, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((K, Hp, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((K, Hp, Wp), jnp.int32)],
        interpret=interpret,
    )(ctx["starts"], ctx["counts"], ctx["n_global"], ctx["row_offset_arr"],
      ctx["fbd"], ctx["globres"], ctx["globres_pl"], ctx["glob_s"],
      ctx["seg_s"], ctx["glob_p"], ctx["seg_p"])

    frags = []
    gb_slices = ctx["gb_slices"]
    for layer in range(K):
        planes = gbuf[layer * kpi:(layer + 1) * kpi, :H, :W]
        flat = {k: jnp.moveaxis(planes[lo:hi], 0, -1)
                for k, (lo, hi) in gb_slices.items()
                if not k.startswith("tri.")}
        if "clip_z" in flat:
            z = flat.pop("clip_z")[..., 0]
            zero = jnp.zeros_like(z)
            flat["clip_position"] = jnp.stack([zero, zero, z, zero],
                                              axis=-1)
        frag = unflatten_varyings(
            {k: v for k, v in flat.items() if k != "barycentric"})
        if "barycentric" in flat:
            frag["barycentric"] = flat["barycentric"]
        if ctx["extra_keys"]:
            frag["tri"] = {
                k: planes[gb_slices["tri." + k][0]].astype(jnp.int32)
                for k in ctx["extra_keys"]}
        frags.append(frag)
    return frags, bd, bi


def render_tile_pallas_kbuffer_single(tris: Dict, fragment_shader,
                                      uniforms: Dict, params: RenderParams,
                                      fb_color, fb_depth,
                                      per_tri_extra: Optional[Dict] = None,
                                      row_offset=0, *,
                                      interpret: bool = False,
                                      with_stats: bool = False):
    """K-buffer via the single-pass K-deep kernel: ONE kernel invocation
    (streams DMA'd twice in-kernel) instead of K peeled passes, then the
    same per-layer shading + submission-order replay as the peel path —
    identical exactness contract (kbuffer.render_binned_kbuffer
    docstring), LESS_EQUAL only."""
    if params.depth_test != DepthTest.LESS_EQUAL:
        raise NotImplementedError("pallas K-buffer supports LESS_EQUAL "
                                  "only")
    K = params.kbuffer
    assert K >= 1
    ctx = _prepare_ctx(tris, params, fb_depth, per_tri_extra, row_offset,
                       gb_keep=_gb_keep(fragment_shader))
    H, W = ctx["H"], ctx["W"]
    frags, bd, bi = _run_pass_kdeep(ctx, K, interpret)

    src = jnp.stack([fragment_shader(f, uniforms, jnp)
                     for f in frags])               # (K, H, W, 4)
    return _replay_layers(src, bd[:, :H, :W], bi[:, :H, :W],
                          fb_color, fb_depth, params, with_stats)


def _replay_layers(src, sd, si_i, fb_color, fb_depth,
                   params: RenderParams, with_stats: bool):
    """Submission-order replay of K shaded layers (Rasterizer.cs:509-523
    + Blend :57-65), shared by the peel and K-deep K-buffer paths.

    src (K, H, W, 4) shaded colors; sd (K, H, W) depths; si_i (K, H, W)
    int winner indices (-1 = none).  Selection is K-way predicated
    `where`s, NOT take_along_axis: a per-pixel gather over even a K-deep
    axis is element-count-bound on TPU (~tens of ms per full-frame take
    at 1080p — BENCHMARKS.md gather model; measured 508 → 46 ms at K=4).
    with_stats adds the conservative K-overflow indicator: pixels whose
    K-th (deepest) layer holds a fragment."""
    K = src.shape[0]
    si = jnp.where(si_i >= 0, si_i.astype(F32), F32(jnp.inf))
    cur_c, cur_d = fb_color, fb_depth

    def one_round(cur_c, cur_d, used):
        masked_i = jnp.where(used, F32(jnp.inf), si)
        sel_i = jnp.min(masked_i, axis=0)               # (H, W)
        valid = jnp.isfinite(sel_i)
        # distinct per-pixel indices ⇒ at most one layer matches
        is_pick = (masked_i == sel_i[None]) & valid[None]
        used = used | is_pick
        sel_d = jnp.sum(jnp.where(is_pick, sd, 0.0), axis=0)
        sel_c = jnp.sum(jnp.where(is_pick[..., None], src, 0.0), axis=0)
        # LESS_EQUAL: reference "new >= old" (Rasterizer.cs:545-546)
        written = valid & (sel_d >= cur_d) & (sel_c[..., 3] > 0)
        cur_c = jnp.where(written[..., None],
                          _blend(sel_c, cur_c, params.blend_mode), cur_c)
        cur_d = jnp.where(written, sel_d, cur_d)
        return cur_c, cur_d, used

    cur_c, cur_d, used = one_round(cur_c, cur_d, jnp.zeros(si.shape, bool))
    if K > 1:
        # Rounds 2..K blend the per-pixel 2nd..K-th smallest indices —
        # no-ops when every deeper layer is empty (the opaque
        # short-circuit's common case): skip them all with one cond.
        def rest(cur_c, cur_d, used):
            for _ in range(K - 1):
                cur_c, cur_d, used = one_round(cur_c, cur_d, used)
            return cur_c, cur_d

        cur_c, cur_d = jax.lax.cond(
            jnp.any(si_i[1:] >= 0), rest,
            lambda c, d, u: (c, d), cur_c, cur_d, used)
    if with_stats:
        return cur_c, cur_d, {
            "kbuffer_saturated_px": jnp.sum(
                (si_i[K - 1] >= 0).astype(jnp.int32))}
    return cur_c, cur_d


def render_tile_pallas(tris: Dict, fragment_shader, uniforms: Dict,
                       params: RenderParams, fb_color, fb_depth,
                       per_tri_extra: Optional[Dict] = None,
                       row_offset=0, *, interpret: bool = False):
    """Full frame: single-pass tile kernel + one XLA shading pass.

    Same contract as binning.render_binned_fused; LESS_EQUAL depth only.
    """
    if params.depth_test != DepthTest.LESS_EQUAL:
        raise NotImplementedError("pallas tile kernel supports LESS_EQUAL "
                                  "only")
    ctx = _prepare_ctx(tris, params, fb_depth, per_tri_extra, row_offset,
                       gb_keep=_gb_keep(fragment_shader))
    H, W = ctx["H"], ctx["W"]
    sr = int(params.shade_rate)
    if sr > 1:
        # Approximate shade-rate mode (config.RenderParams.shade_rate):
        # winners/depth at full resolution from the kernel, the shader
        # pass on every sr-th ROW of the G-buffer, colors replicated
        # down each row block — 1/sr of the texel gathers + shader ops.
        # Rows only: a column-strided subsample crosses TPU lanes and
        # costs MORE than it saves (measured 4K: ::2 on the lane dim
        # 70 ms vs 5.7 ms on rows — BENCHMARKS.md shade-rate note).
        if H % sr:
            raise ValueError(f"shade_rate={sr} needs the frame height "
                             f"divisible by it, got {H}")
        gbuf, best_d, best_i = _run_pass(ctx, interpret, raw=True)
        frag = _frag_from_planes(ctx, gbuf[:, :H:sr, :W])
        color = fragment_shader(frag, uniforms, jnp)
        color = jnp.repeat(color, sr, 0)
    else:
        frag, best_d, best_i = _run_pass(ctx, interpret)
        color = fragment_shader(frag, uniforms, jnp)

    # ---- full-frame shading over the compact G-buffer (one XLA pass) ----
    covered = best_i[:H, :W] >= 0
    written = covered & (color[..., 3] > 0)
    out_c = jnp.where(written[..., None],
                      _blend(color, fb_color, params.blend_mode), fb_color)
    out_d = jnp.where(written, best_d[:H, :W], fb_depth)
    return out_c, out_d


def render_tile_pallas_kbuffer(tris: Dict, fragment_shader, uniforms: Dict,
                               params: RenderParams, fb_color, fb_depth,
                               per_tri_extra: Optional[Dict] = None,
                               row_offset=0, *, interpret: bool = False,
                               with_stats: bool = False,
                               tile_row_map=None, full_height=None):
    """K-buffer via depth peeling: K single-winner kernel passes, each
    folding only fragments strictly worse-ranked than the previous pass's
    winner, then the reference's sequential shade-blend replayed over the
    K layers in submission order (Rasterizer.cs:509-523 + Blend :57-65 —
    same exactness contract as ops/kbuffer.render_binned_kbuffer, whose
    module docstring states the K-coverage conditions).

    Binning, stream building and payload packing run ONCE; each peel
    reuses the prepared ctx, so the cost is K× the opaque kernel + K
    shading passes instead of the XLA K-buffer's ~95 ms/layer
    resolve-replay (BENCHMARKS.md).  LESS_EQUAL depth only.
    """
    if params.depth_test != DepthTest.LESS_EQUAL:
        raise NotImplementedError("pallas K-buffer supports LESS_EQUAL only")
    K = params.kbuffer
    assert K >= 1
    ctx = _prepare_ctx(tris, params, fb_depth, per_tri_extra, row_offset,
                       gb_keep=_gb_keep(fragment_shader),
                       tile_row_map=tile_row_map, full_height=full_height)
    H, W, Hp, Wp = ctx["H"], ctx["W"], ctx["Hp"], ctx["Wp"]

    # Opaque short-circuit + empty-pass skip (PARITY.md
    # "Exactness-preserving optimizations" states the proof + the
    # one-blend-ulp exactness bound):
    #   * a pixel whose pass-k winner is semantically opaque (the
    #     pack-time per-triangle flag riding the payload as tri.opq —
    #     engine.renderer.opaque_tri_flags) AND visibly shaded
    #     (alpha > 0: discarded or NaN-interpolated winners, e.g.
    #     degenerate near-clip geometry, must keep peeling) can never
    #     show a worse-ranked fragment: strictly-farther ones fail the
    #     replay's depth test after the winner draws or are overwritten
    #     by it, and equal-depth ties resolve to the highest index — the
    #     winner itself.  Under NONE blending the shaded alpha > 0 test
    #     alone suffices (result = src for any visible winner);
    #   * such pixels get their prev maps reset to the clear values,
    #     which the existing peel condition already treats as "admit
    #     nothing" — no kernel change;
    #   * pixels in the tile-grid pad band (rows >= H / cols >= W) are
    #     reset too, so unclipped geometry hanging below the screen edge
    #     can't keep passes alive;
    #   * a pass whose transformed prev maps show NO eligible pixel is
    #     skipped wholesale with lax.cond (deeper layers cannot exist),
    #     as is every pass after it.  On a fully opaque scene K-buffer
    #     mode therefore costs ~one opaque frame.
    from softwarerenderer_tpu.config import BlendMode
    use_opq = (params.kbuffer_short_circuit and "opq" in ctx["extra_keys"]
               and params.blend_mode == BlendMode.ALPHA)
    none_stop = (params.kbuffer_short_circuit
                 and params.blend_mode == BlendMode.NONE)
    yy = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    pad_stop = (yy >= H) | (xx >= W)

    def shade(frag):
        col = fragment_shader(frag, uniforms, jnp)
        if use_opq:
            opq = (frag["tri"]["opq"] > 0) & (col[..., 3] > F32(0))
        elif none_stop:
            opq = col[..., 3] > F32(0)
        else:
            opq = jnp.zeros((), bool)
        return col, opq

    colors, depths, indices = [], [], []
    for k in range(K):
        if k == 0:
            frag, bd, bi = _run_pass(ctx, interpret)
            col, opq = shade(frag)
        else:
            stop = pad_stop
            if use_opq or none_stop:
                stop = stop | jnp.pad(opq, ((0, Hp - H), (0, Wp - W)))
            prev_d = jnp.where(stop, DEPTH_CLEAR, bd)
            prev_i = jnp.where(stop, F32(-1), bi.astype(F32))
            eligible = jnp.any(prev_i >= F32(0))

            # Segment-compacted layer shading
            # (params.kbuffer_compact_rows): peel layers k >= 1 are
            # typically sparse (a few translucent surfaces), yet the
            # shader pass charges the full frame.  Split rows into
            # `seg`-px segments, gather the segments holding ANY live
            # winner DIRECTLY from the kernel's planar G-buffer with
            # ONE take (per-channel takes each pay ~1 ms of op overhead
            # at 1080p; a planar row-gather is bandwidth-priced), shade
            # the compacted (cap, seg) block, scatter back.  Bit-exact:
            # the shader ABI is per-pixel; fill/duplicate entries
            # recompute segment 0 with identical values; un-shaded
            # segments hold zeros no consumer reads (the replay picks
            # only winner_index >= 0 pixels, and the opq stop only
            # matters where a winner exists).
            seg = 128
            while seg > 8 and W % seg:
                seg //= 2
            frac = params.kbuffer_compact_rows
            compactable = frac > 0 and W % seg == 0
            if compactable:
                nseg = W // seg
                seg_cap = int(H * nseg * frac)
                seg_cap = min(H * nseg, max(8, -(-seg_cap // 8) * 8))
                compactable = seg_cap < H * nseg

            def live(pd, pi):
                gbuf, bd, bi = _run_pass(ctx, interpret, pd, pi,
                                         raw=True)

                def full(gbuf):
                    return shade(_frag_from_planes(ctx,
                                                   gbuf[:, :H, :W]))

                if not compactable:
                    col, opq = full(gbuf)
                    return col, bd, bi, opq
                live_seg = jnp.any(
                    (bi[:H, :W] >= 0).reshape(H * nseg, seg), axis=1)
                n_live = jnp.sum(live_seg.astype(jnp.int32))

                def compact(gbuf):
                    idx = jnp.nonzero(live_seg, size=seg_cap,
                                      fill_value=0)[0]
                    kpi = gbuf.shape[0]
                    sub = jnp.take(
                        gbuf[:, :H, :W].reshape(kpi, H * nseg, seg),
                        idx, axis=1)
                    colr, opqr = shade(_frag_from_planes(ctx, sub))
                    col = jnp.zeros((H * nseg, seg, 4), F32) \
                        .at[idx].set(colr).reshape(H, W, 4)
                    if use_opq or none_stop:
                        opq = jnp.zeros((H * nseg, seg), bool) \
                            .at[idx].set(opqr).reshape(H, W)
                    else:
                        opq = jnp.zeros((), bool)
                    return col, opq

                col, opq = jax.lax.cond(n_live <= seg_cap, compact,
                                        full, gbuf)
                return col, bd, bi, opq

            def dead(pd, pi):
                return (jnp.zeros((H, W, 4), F32),
                        jnp.full((Hp, Wp), DEPTH_CLEAR, F32),
                        jnp.full((Hp, Wp), -1, jnp.int32),
                        jnp.zeros((H, W) if (use_opq or none_stop) else (),
                                  bool))

            col, bd, bi, opq = jax.lax.cond(eligible, live, dead,
                                            prev_d, prev_i)
        colors.append(col)
        depths.append(bd[:H, :W])
        indices.append(bi[:H, :W])
    return _replay_layers(jnp.stack(colors), jnp.stack(depths),
                          jnp.stack(indices), fb_color, fb_depth, params,
                          with_stats)
