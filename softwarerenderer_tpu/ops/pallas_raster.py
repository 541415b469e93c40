"""Pallas TPU kernel for the per-tile visibility fold.

The hottest loop of the renderer — fold every tile's binned triangles into
a per-pixel (depth, submission-index) winner — as a hand-scheduled Mosaic
kernel instead of an XLA fori_loop:

  * triangle setup is PRE-GATHERED (one XLA take) into contiguous streams
    laid out (16 fields, P) so a chunk slice [(16, C)] is a single aligned
    DMA from HBM into VMEM scratch — the kernel never does random access
  * one grid step per screen tile; the fold runs on (C, TH·TW) blocks in
    VMEM with double-buffered chunk DMA overlapping compute
  * per-tile trip counts come from scalar-prefetched starts/counts arrays
    (pltpu.PrefetchScalarGridSpec), so work is proportional to actual bin
    occupancy

Field rows of the stream layout:
  0:s0x 1:s0y 2:s1x 3:s1y 4:s2x 5:s2y 6:d0 7:d1 8:d2 9:inv_area
  10:index(as f32; post-clip ids < 2^24 are exact) 11-15: padding

Currently supports the default LESS_EQUAL depth mode (max-depth,
later-wins ties — the game's only mode); other monotone modes fall back to
the XLA binned path in the engine.
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
from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR

F32 = jnp.float32
N_FIELDS = 16


def _build_streams(tris: Dict, bins: Dict):
    """Pre-gather triangle setup into (16, P) contiguous streams: one for
    the capacity-free global list (submission order), one for the sorted
    per-tile segments."""
    screen = tris["screen"]
    depth = tris["depth"]
    inv_area = jnp.where(tris["valid"], tris["inv_area"], 0.0)
    n = screen.shape[0]
    idx_f = jnp.arange(n, dtype=F32)
    setup = jnp.stack([
        screen[:, 0, 0], screen[:, 0, 1],
        screen[:, 1, 0], screen[:, 1, 1],
        screen[:, 2, 0], screen[:, 2, 1],
        depth[:, 0], depth[:, 1], depth[:, 2],
        inv_area, idx_f,
        jnp.zeros_like(idx_f), jnp.zeros_like(idx_f),
        jnp.zeros_like(idx_f), jnp.zeros_like(idx_f), jnp.zeros_like(idx_f),
    ])                                                   # (16, N)
    glob_stream = jnp.take(setup, bins["order"], axis=1)     # globals first
    seg_stream = jnp.take(setup, bins["sorted_tri"], axis=1)
    return glob_stream, seg_stream


def _fold_kernel(ntx, nty, tile_h, tile_w, chunk, row_offset,
                 # scalar prefetch:
                 starts_ref, counts_ref, nglob_ref,
                 # inputs:
                 fbd_ref, glob_ref, seg_ref,
                 # outputs:
                 outd_ref, outi_ref,
                 # scratch:
                 buf_ref, sem_ref):
    i = pl.program_id(0)
    ty = i // ntx
    tx = i % ntx
    tpx = tile_h * tile_w

    px = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          + tx * tile_w).reshape(1, tpx).astype(F32)
    py = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          + ty * tile_h + row_offset).reshape(1, tpx).astype(F32)

    best_d0 = fbd_ref[...].reshape(1, tpx)
    best_i0 = jnp.full((1, tpx), -1.0, dtype=F32)

    n_global = nglob_ref[0]
    start = starts_ref[i]
    count = counts_ref[i]

    def fold_stream(stream_ref, offset, length, carry):
        """Fold `length` candidates starting at stream[:, offset] with
        double-buffered chunk DMA.  DMA lane offsets must be 128-aligned,
        so chunks start at the aligned-down base and the fold masks the
        out-of-range lanes."""
        abase = (offset // 128) * 128
        lead = offset - abase           # 0..127 lanes before the segment
        n_chunks = _pl_cdiv(lead + length, chunk)

        def get_dma(slot, c):
            start = pl.multiple_of(abase + c * chunk, 128)
            return pltpu.make_async_copy(
                stream_ref.at[:, pl.ds(start, chunk)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def body(c, carry):
            best_d, best_i = carry
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()
            f = buf_ref[slot]                       # (16, C)
            col = lambda k: f[k, :][:, None]        # (C, 1)
            s0x, s0y = col(0), col(1)
            s1x, s1y = col(2), col(3)
            s2x, s2y = col(4), col(5)
            d0, d1, d2 = col(6), col(7), col(8)
            ia, idx = col(9), col(10)

            w0 = (s1y - s2y) * (px - s1x) + (s2x - s1x) * (py - s1y)
            w1 = (s2y - s0y) * (px - s2x) + (s0x - s2x) * (py - s2y)
            w2 = (s0y - s1y) * (px - s0x) + (s1x - s0x) * (py - s0y)
            inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
                     ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
            lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            pos = lane + c * chunk          # relative to the aligned base
            ok = inside & (pos >= lead) & (pos < lead + length)
            d = d0 * (w0 * ia) + d1 * (w1 * ia) + d2 * (w2 * ia)

            # LESS_EQUAL: max depth, later submission wins ties — the
            # sequential fold within the chunk collapses to a lexicographic
            # (depth, idx) max because idx increases with submission.
            dm = jnp.where(ok, d, F32(-jnp.inf))
            cand_d = jnp.max(dm, axis=0, keepdims=True)        # (1, tpx)
            at = ok & (d == cand_d)
            cand_i = jnp.max(jnp.where(at, idx, F32(-1.0)), axis=0,
                             keepdims=True)
            # Depth ties across the two streams (global list vs per-tile
            # segment) break on submission index, matching binning.merge():
            # later-submitted (larger idx) wins at exactly-equal depth.
            take = (cand_i > F32(-1.0)) & (
                (cand_d > best_d) | ((cand_d == best_d) & (cand_i > best_i)))
            return (jnp.where(take, cand_d, best_d),
                    jnp.where(take, cand_i, best_i))

        return jax.lax.fori_loop(0, n_chunks, body, carry)

    carry = fold_stream(glob_ref, 0, n_global, (best_d0, best_i0))
    best_d, best_i = fold_stream(seg_ref, start, count, carry)

    outd_ref[...] = best_d.reshape(tile_h, tile_w)
    outi_ref[...] = best_i.reshape(tile_h, tile_w).astype(jnp.int32)


def _pl_cdiv(a, b):
    return (a + b - 1) // b


def visibility_pallas(tris: Dict, params: RenderParams,
                      chunk: Optional[int] = None, init_depth=None,
                      row_offset=0, *, interpret: bool = False):
    """Drop-in visibility_fn (raster.render_deferred contract) running the
    per-tile fold as a Pallas kernel.  LESS_EQUAL only."""
    if params.depth_test != DepthTest.LESS_EQUAL:
        raise NotImplementedError("pallas fold supports LESS_EQUAL; use the "
                                  "XLA binned path for other modes")
    # DMA slices along the lane dimension must be 128-aligned.
    chunk = max(128, _cdiv(int(chunk or params.chunk), 128) * 128)
    tile_h, tile_w = params.tile_h, params.tile_w
    H, W = params.height, params.width
    nty, ntx = _cdiv(H, tile_h), _cdiv(W, tile_w)
    ntiles = nty * ntx
    Hp, Wp = nty * tile_h, ntx * tile_w

    bins = bin_triangles(tris, params, tile_h, tile_w, params.span_cap,
                         row_offset)
    glob_stream, seg_stream = _build_streams(tris, bins)
    # Pad streams so any in-range chunk DMA is legal.
    def pad_stream(s):
        p = s.shape[1]
        p_pad = _cdiv(max(p, 1), chunk) * chunk + chunk
        return jnp.pad(s, ((0, 0), (0, p_pad - p)))
    glob_stream = pad_stream(glob_stream)
    seg_stream = pad_stream(seg_stream)

    if init_depth is None:
        init_depth = jnp.full((H, W), DEPTH_CLEAR, dtype=F32)
    fbd = jnp.pad(init_depth, ((0, Hp - H), (0, Wp - W)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile_h, tile_w),
                         lambda i, *_: (i // ntx, i % ntx)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w),
                         lambda i, *_: (i // ntx, i % ntx)),
            pl.BlockSpec((tile_h, tile_w),
                         lambda i, *_: (i // ntx, i % ntx)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, N_FIELDS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fold_kernel, ntx, nty, tile_h, tile_w,
                               chunk, row_offset)
    outd, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)],
        interpret=interpret,
    )(bins["starts"], bins["counts"],
      jnp.asarray([bins["n_global"]], jnp.int32),
      fbd, glob_stream, seg_stream)
    return outd[:H, :W], outi[:H, :W]


def make_pallas_visibility(interpret: bool = False):
    def fn(tris, params, chunk=None, init_depth=None, row_offset=0):
        return visibility_pallas(tris, params, chunk, init_depth, row_offset,
                                 interpret=interpret)
    return fn
