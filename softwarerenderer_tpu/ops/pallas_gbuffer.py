"""Pallas G-buffer kernel: fold + resolve + interpolate in ONE kernel.

The XLA fused renderer (ops/binning.render_binned_fused) is dispatch-bound:
each tile group launches ~150 small ops, and an empty 1080p scene costs
~26 ms of pure overhead (BENCHMARKS.md).  This kernel eliminates that by
running the whole triangle-dependent pipeline per tile inside Mosaic:

  pass A — visibility fold over the tile's chunk stream (as
           ops/pallas_raster.py: double-buffered DMA, lexicographic
           (depth, index) max for LESS_EQUAL)
  pass B — winner payload resolve: one-hot (tpx, C) × (C, Kp) MXU matmuls
           over the same chunk stream
  interp — perspective-correct interpolation (exact Rasterizer.Interpolate
           math) of the varyings the shader declared

and writes a per-pixel G-BUFFER (interpolated varyings + depth + coverage).
Fragment shading then runs as ONE full-frame XLA pass over the G-buffer —
texture gathers don't lower inside Mosaic, and a single full-frame pass
amortizes dispatch anyway.

Works for any fragment shader whose varyings fit the registry (shaders
declare `.varyings`); LESS_EQUAL depth only (the game's mode) — everything
else falls back to the XLA fused path in the engine.

STATUS: EXPERIMENTAL (RenderParams.use_pallas, default off).  Pixel-exact
vs the XLA fused path (tested), but measured ~2x SLOWER at 1080p dust2
(~76 vs ~37 ms/frame, 50-pipelined-frames + single-readback methodology —
NOTE: per-call `block_until_ready` does not await Mosaic custom-call
completion over the axon tunnel and reports fantasy sub-ms numbers).
Known inefficiencies to fix before flipping the default: the 128-lane
minimum chunk pads sparse bins ~10x, empty tiles still run lead-alignment
chunks, and the raw G-buffer (tpx × 128 f32 per tile) round-trips HBM.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from softwarerenderer_tpu.config import DepthTest, RenderParams
from softwarerenderer_tpu.ops.binning import _cdiv, bin_triangles
from softwarerenderer_tpu.ops.geometry import unflatten_varyings
from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR, _blend

F32 = jnp.float32
N_FIELDS = 16   # fold stream rows (see ops/pallas_raster.py layout)


def _build_streams(tris, bins, payload):
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
    glob_setup = jnp.take(setup, bins["order"], axis=1)
    seg_setup = jnp.take(setup, bins["sorted_tri"], axis=1)
    glob_payload = jnp.take(payload, bins["order"], axis=0)
    seg_payload = jnp.take(payload, bins["sorted_tri"], axis=0)
    return glob_setup, seg_setup, glob_payload, seg_payload


def _kernel(ntx, nty, tile_h, tile_w, chunk, row_offset, kp3,
            # scalar prefetch
            starts_ref, counts_ref, nglob_ref,
            # inputs
            fbd_ref, glob_ref, seg_ref, glob_pl_ref, seg_pl_ref,
            # outputs
            out_acc_ref, outd_ref, outi_ref,
            # scratch
            buf_ref, plbuf_ref, sem_ref, plsem_ref):
    i = pl.program_id(0)
    ty = i // ntx
    tx = i % ntx
    tpx = tile_h * tile_w

    px = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          + tx * tile_w).reshape(1, tpx).astype(F32)
    py = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          + ty * tile_h + row_offset).reshape(1, tpx).astype(F32)

    n_global = nglob_ref[0]
    start = starts_ref[i]
    count = counts_ref[i]

    # ---- pass A: visibility fold --------------------------------------
    def fold_stream(stream_ref, offset, length, carry):
        abase = (offset // 128) * 128
        lead = offset - abase
        n_chunks = (lead + length + chunk - 1) // chunk

        def get_dma(slot, c):
            s0 = pl.multiple_of(abase + c * chunk, 128)
            return pltpu.make_async_copy(
                stream_ref.at[:, pl.ds(s0, chunk)], buf_ref.at[slot],
                sem_ref.at[slot])

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
            f = buf_ref[slot]
            col = lambda k: f[k, :][:, None]
            s0x, s0y, s1x, s1y = col(0), col(1), col(2), col(3)
            s2x, s2y = col(4), col(5)
            d0, d1, d2, ia, idx = col(6), col(7), col(8), col(9), col(10)
            w0 = (s1y - s2y) * (px - s1x) + (s2x - s1x) * (py - s1y)
            w1 = (s2y - s0y) * (px - s2x) + (s0x - s2x) * (py - s2y)
            w2 = (s0y - s1y) * (px - s0x) + (s1x - s0x) * (py - s0y)
            inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
                     ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
            lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            pos = lane + c * chunk
            ok = inside & (pos >= lead) & (pos < lead + length)
            d = d0 * (w0 * ia) + d1 * (w1 * ia) + d2 * (w2 * ia)
            dm = jnp.where(ok, d, F32(-jnp.inf))
            cand_d = jnp.max(dm, axis=0, keepdims=True)
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

    best_d0 = fbd_ref[...].reshape(1, tpx)
    best_i0 = jnp.full((1, tpx), -1.0, dtype=F32)
    carry = fold_stream(glob_ref, 0, n_global, (best_d0, best_i0))
    best_d, best_i = fold_stream(seg_ref, start, count, carry)

    # ---- pass B: one-hot payload resolve -------------------------------
    def resolve_stream(stream_ref, pl_ref, offset, length, acc):
        abase = (offset // 128) * 128
        lead = offset - abase
        n_chunks = (lead + length + chunk - 1) // chunk

        def get_dmas(slot, c):
            s0 = pl.multiple_of(abase + c * chunk, 128)
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

        def body(c, acc):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in get_dmas((c + 1) % 2, c + 1):
                    dma.start()
            d1, d2 = get_dmas(slot, c)
            d1.wait()
            d2.wait()
            ids = buf_ref[slot][10, :][:, None]          # (C, 1) f32 ids
            lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            pos = lane + c * chunk
            ok = (pos >= lead) & (pos < lead + length)   # (C, 1)
            # one-hot laid out (C, tpx) — building (tpx, C) would transpose
            # the lane axis into sublanes, which Mosaic can't lower; the
            # matmul contracts dim 0 of both operands instead.
            onehot_t = ((ids == best_i) & ok).astype(F32)   # (C, tpx)
            return acc + jax.lax.dot_general(
                onehot_t, plbuf_ref[slot], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return jax.lax.fori_loop(0, n_chunks, body, acc)

    acc = jnp.zeros((tpx, kp3), F32)
    acc = resolve_stream(glob_ref, glob_pl_ref, 0, n_global, acc)
    acc = resolve_stream(seg_ref, seg_pl_ref, start, count, acc)

    out_acc_ref[...] = acc.reshape(1, tpx, kp3)
    outd_ref[...] = best_d.reshape(tile_h, tile_w)
    outi_ref[...] = best_i.reshape(tile_h, tile_w).astype(jnp.int32)


def render_binned_gbuffer(tris: Dict, fragment_shader, uniforms: Dict,
                          params: RenderParams, fb_color, fb_depth,
                          per_tri_extra: Optional[Dict] = None,
                          row_offset=0, *, interpret: bool = False):
    """Full frame via the Pallas G-buffer kernel + one XLA shading pass.

    Same contract as binning.render_binned_fused; LESS_EQUAL depth only.
    """
    if params.depth_test != DepthTest.LESS_EQUAL:
        raise NotImplementedError("pallas gbuffer supports LESS_EQUAL only")
    # Clamp the kernel tile so the double-buffered G-buffer block + one-hot
    # intermediates fit the 16 MB VMEM budget.
    tile_w = params.tile_w
    tile_h = min(params.tile_h, 16)
    chunk = max(128, _cdiv(params.chunk, 128) * 128)
    H, W = params.height, params.width
    nty, ntx = _cdiv(H, tile_h), _cdiv(W, tile_w)
    ntiles = nty * ntx
    Hp, Wp = nty * tile_h, ntx * tile_w
    tpx = tile_h * tile_w

    bins = bin_triangles(tris, params, tile_h, tile_w, params.span_cap,
                         row_offset)

    # packed per-triangle payload (same layout as the fused path), padded to
    # a 128-lane width for clean DMA tiling
    keys = sorted(tris["attrs"].keys())
    parts, slices, off = [], {}, 0
    for k in keys:
        arr = tris["attrs"][k]
        parts.append(arr)
        slices[k] = (off, off + arr.shape[-1])
        off += arr.shape[-1]
    n = tris["screen"].shape[0]
    parts.append(tris["screen"]); sl_screen = (off, off + 2); off += 2
    parts.append(jnp.broadcast_to(tris["inv_area"][:, None, None],
                                  (n, 3, 1)))
    sl_ia = off; off += 1
    extra_slices = {}
    if per_tri_extra:
        for k in sorted(per_tri_extra.keys()):
            v = jnp.asarray(per_tri_extra[k], F32)[:, None, None]
            parts.append(jnp.broadcast_to(v, (n, 3, 1)))
            extra_slices[k] = off
            off += 1
    kp = off
    kp3 = _cdiv(3 * kp, 128) * 128
    payload = jnp.concatenate(parts, axis=-1).reshape(n, 3 * kp)
    payload = jnp.where(tris["valid"][:, None], payload, 0.0)
    payload = jnp.pad(payload, ((0, 0), (0, kp3 - 3 * kp)))

    glob_s, seg_s, glob_p, seg_p = _build_streams(tris, bins, payload)

    def pad_streams(s, p):
        ln = s.shape[1]
        ln_pad = _cdiv(max(ln, 1), chunk) * chunk + chunk
        return (jnp.pad(s, ((0, 0), (0, ln_pad - ln))),
                jnp.pad(p, ((0, ln_pad - ln), (0, 0))))
    glob_s, glob_p = pad_streams(glob_s, glob_p)
    seg_s, seg_p = pad_streams(seg_s, seg_p)

    fbd = jnp.pad(fb_depth, ((0, Hp - H), (0, Wp - W)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile_h, tile_w),
                         lambda i, *_: (i // ntx, i % ntx)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, tpx, kp3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((tile_h, tile_w),
                         lambda i, *_: (i // ntx, i % ntx)),
            pl.BlockSpec((tile_h, tile_w),
                         lambda i, *_: (i // ntx, i % ntx)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, N_FIELDS, chunk), jnp.float32),
            pltpu.VMEM((2, chunk, kp3), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, ntx, nty, tile_h, tile_w, chunk,
                               row_offset, kp3)
    acc, best_d, best_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ntiles, tpx, kp3), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)],
        interpret=interpret,
    )(bins["starts"], bins["counts"],
      jnp.asarray([bins["n_global"]], jnp.int32),
      fbd, glob_s, seg_s, glob_p, seg_p)

    # ---- full-frame interpolation + shading (one XLA pass) -------------
    av = acc[..., : 3 * kp].reshape(ntiles, tpx, 3, kp)
    tidx = jnp.arange(ntiles, dtype=jnp.int32)
    px_in = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
             .reshape(tpx))
    py_in = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
             .reshape(tpx))
    pxf = (tidx[:, None] % ntx * tile_w + px_in[None, :]).astype(F32)
    pyf = (tidx[:, None] // ntx * tile_h + py_in[None, :]
           + jnp.asarray(row_offset, jnp.int32)).astype(F32)

    s = av[..., sl_screen[0]:sl_screen[1]]
    ia = av[..., 0, sl_ia]
    clo, chi = slices["clip_position"]
    clip_w = av[..., chi - 1]
    s0x, s0y = s[..., 0, 0], s[..., 0, 1]
    s1x, s1y = s[..., 1, 0], s[..., 1, 1]
    s2x, s2y = s[..., 2, 0], s[..., 2, 1]
    w0 = ((s1y - s2y) * (pxf - s1x) + (s2x - s1x) * (pyf - s1y)) * ia
    w1 = ((s2y - s0y) * (pxf - s2x) + (s0x - s2x) * (pyf - s2y)) * ia
    w2 = ((s0y - s1y) * (pxf - s0x) + (s1x - s0x) * (pyf - s0y)) * ia
    rcp_a = w0 / jnp.where(clip_w[..., 0] == 0, F32(1), clip_w[..., 0])
    rcp_b = w1 / jnp.where(clip_w[..., 1] == 0, F32(1), clip_w[..., 1])
    rcp_c = w2 / jnp.where(clip_w[..., 2] == 0, F32(1), clip_w[..., 2])
    wsum = rcp_a + rcp_b + rcp_c
    wgt = F32(1.0) / jnp.where(wsum == 0, F32(1), wsum)
    wa, wb, wc = rcp_a * wgt, rcp_b * wgt, rcp_c * wgt
    a0, a1, a2 = av[..., 0, :], av[..., 1, :], av[..., 2, :]
    pc = (a0 * rcp_a[..., None] + a1 * rcp_b[..., None]
          + a2 * rcp_c[..., None]) * wgt[..., None]
    pw = a0 * wa[..., None] + a1 * wb[..., None] + a2 * wc[..., None]

    flat = {}
    for k in keys:
        lo, hi = slices[k]
        if k.startswith("data."):
            val = pw[..., lo:hi]
            if hi - lo == 3:
                lsq = jnp.sum(val * val, axis=-1, keepdims=True)
                nrm = val / jnp.sqrt(jnp.where(lsq > 0, lsq, F32(1)))
                val = jnp.where(lsq > F32(1e-6), nrm, val)
        else:
            val = pc[..., lo:hi]
        flat[k] = val
    frag = unflatten_varyings(flat)
    frag["barycentric"] = jnp.stack([wa, wb, wc], axis=-1)
    if extra_slices:
        frag["tri"] = {k: av[..., 0, i].astype(jnp.int32)
                       for k, i in extra_slices.items()}

    def untile(a):
        a = a[:ntiles].reshape((nty, ntx, tile_h, tile_w) + a.shape[2:])
        a = jnp.moveaxis(a, 1, 2).reshape((Hp, Wp) + a.shape[4:])
        return a[:H, :W]

    covered = best_i[:H, :W] >= 0   # already spatial (blocked output)
    frag = jax.tree_util.tree_map(untile, frag)
    color = fragment_shader(frag, uniforms, jnp)
    best_depth = best_d[:H, :W]
    written = covered & (color[..., 3] > 0)
    out_c = jnp.where(written[..., None],
                      _blend(color, fb_color, params.blend_mode), fb_color)
    out_d = jnp.where(written, best_depth, fb_depth)
    return out_c, out_d
