"""Debug visualization modes beyond the reference's wireframe
(Rasterizer.cs:14-18 ships NONE/WIREFRAME only): per-pixel OVERDRAW
heatmaps and DEPTH-buffer views, rendered inside the same jitted frame.

Overdraw counts every valid triangle slot whose coverage test passes at
the pixel center — the reference's inside rule exactly (both winding
signs, integer pixel centers, Rasterizer.cs:481-494) — regardless of
depth, so the heatmap shows true rasterization load (the quantity the
reference's tile locks serialize on).  Depth view normalizes the frame's
covered depth range to a gray ramp; with the reversed depth convention
(SURVEY.md §6 note 1: larger = nearer) nearer surfaces read brighter.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from softwarerenderer_tpu.config import RenderParams
from softwarerenderer_tpu.ops.raster import DEPTH_CLEAR, _pad_pow2_chunks

F32 = jnp.float32

# Heatmap stops: black (0) → blue → green → yellow → red (saturation).
_RAMP_T = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0], jnp.float32)
_RAMP_RGB = jnp.asarray([
    [0.0, 0.0, 0.0],
    [0.1, 0.25, 0.9],
    [0.1, 0.85, 0.2],
    [0.95, 0.9, 0.1],
    [1.0, 0.12, 0.08],
], jnp.float32)


def overdraw_count(tris: Dict, params: RenderParams, chunk: int = 128,
                   row_offset=0, col_offset=0) -> jnp.ndarray:
    """(H, W) int32 count of valid triangle slots covering each pixel.

    Brute force over triangles (count is a dense sum — binning buys
    nothing exactness-wise here, and this is a debug tool): the same
    chunked fori_loop / edge-function evaluation as
    raster.visibility_brute_force, with the winner fold replaced by a
    mask sum.
    """
    H, W = params.height, params.width
    n = tris["screen"].shape[0]
    n_pad = _pad_pow2_chunks(max(n, 1), chunk)

    def pad(a):
        cfg = [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg)

    screen = pad(tris["screen"])
    valid = pad(tris["valid"])
    px = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
          + jnp.asarray(col_offset, jnp.int32)).astype(F32)
    py = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
          + jnp.asarray(row_offset, jnp.int32)).astype(F32)

    def chunk_body(c, count):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk)
        s = sl(screen)
        vm = sl(valid)
        s0 = s[:, 0][:, None, None]
        s1 = s[:, 1][:, None, None]
        s2 = s[:, 2][:, None, None]
        a01 = s0[..., 1] - s1[..., 1]; b01 = s1[..., 0] - s0[..., 0]
        a12 = s1[..., 1] - s2[..., 1]; b12 = s2[..., 0] - s1[..., 0]
        a20 = s2[..., 1] - s0[..., 1]; b20 = s0[..., 0] - s2[..., 0]
        w0 = a12 * (px - s1[..., 0]) + b12 * (py - s1[..., 1])
        w1 = a20 * (px - s2[..., 0]) + b20 * (py - s2[..., 1])
        w2 = a01 * (px - s0[..., 0]) + b01 * (py - s0[..., 1])
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
                 ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
        mask = inside & vm[:, None, None]
        return count + jnp.sum(mask.astype(jnp.int32), axis=0)

    count0 = jnp.zeros((H, W), jnp.int32)
    return jax.lax.fori_loop(0, n_pad // chunk, chunk_body, count0)


def overdraw_to_color(count: jnp.ndarray, saturate: int = 8
                      ) -> jnp.ndarray:
    """Count → (H, W, 4) heatmap; the ramp saturates (red) at
    `saturate` fragments per pixel."""
    t = jnp.clip(count.astype(F32) / F32(max(1, saturate)), 0.0, 1.0)
    rgb = jnp.stack([jnp.interp(t, _RAMP_T, _RAMP_RGB[:, c])
                     for c in range(3)], axis=-1)
    a = jnp.ones(count.shape + (1,), F32)
    return jnp.concatenate([rgb, a], axis=-1)


def depth_view(depth: jnp.ndarray, clear=DEPTH_CLEAR) -> jnp.ndarray:
    """Depth buffer → (H, W, 4) gray ramp normalized to the frame's
    covered range (nearer = brighter under the reversed convention);
    uncovered pixels are black."""
    covered = depth != clear
    big = F32(jnp.inf)
    dmin = jnp.min(jnp.where(covered, depth, big))
    dmax = jnp.max(jnp.where(covered, depth, -big))
    span = jnp.maximum(dmax - dmin, F32(1e-20))
    t = jnp.clip((depth - dmin) / span, 0.0, 1.0)
    g = jnp.where(covered, F32(0.08) + F32(0.92) * t, F32(0.0))
    return jnp.concatenate(
        [jnp.broadcast_to(g[..., None], g.shape + (3,)),
         jnp.ones(g.shape + (1,), F32)], axis=-1)


def render_overdraw(tris: Dict, params: RenderParams):
    """OVERDRAW debug frame: (heatmap color, count-as-f32 'depth').

    The returned depth plane carries the raw per-pixel counts so callers
    (tests, profiling HUDs) can read exact numbers, not just colors."""
    count = overdraw_count(tris, params, chunk=max(32, params.chunk))
    return overdraw_to_color(count), count.astype(F32)


def render_depth_view(tris: Dict, params: RenderParams, fb_depth,
                      chunk: int = 128):
    """DEPTH debug frame: normalized gray view of the winner depth
    buffer (computed with the production visibility reduction — binned
    when params.binned — seeded from fb_depth like a normal frame)."""
    if params.binned:
        from softwarerenderer_tpu.ops.binning import visibility_binned
        best_d, _ = visibility_binned(
            tris, params, chunk=params.chunk, init_depth=fb_depth,
            tile_h=params.tile_h, tile_w=params.tile_w,
            span_cap=params.span_cap, tile_group=params.tile_group)
    else:
        from softwarerenderer_tpu.ops.raster import visibility_brute_force
        best_d, _ = visibility_brute_force(tris, params, chunk=chunk,
                                           init_depth=fb_depth)
    return depth_view(best_d), best_d
