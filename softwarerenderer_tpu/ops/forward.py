"""Exact forward rasterization: sequential scan in submission order.

The deferred path (ops/raster.py) shades only the per-pixel visibility
winner, which is exact for opaque scenes but not for ordered translucency,
order-dependent depth tests (EQUAL / NOT_EQUAL), fragment discard that
should reveal farther geometry, or wireframe line drawing.  This module is
the EXACTNESS fallback: a `lax.scan` over triangles in submission order,
each step evaluating the triangle over the framebuffer, depth-testing
against the CURRENT buffer, shading, blending and writing — a faithful
vectorization of the reference's per-triangle pipeline
(/root/reference/Rasterizer.cs:401-539) with its pinned sequential order
(SURVEY.md §5).

Cost: O(T · H · W) with the fragment shader run per triangle — use for
parity tests, debug views and translucent scenes, not the hot path.

Wireframe mode (Rasterizer.cs:232-340 DrawLine, dispatched at :419-424):
each triangle's 3 screen edges draw as ≤0.5-px-distance lines with the
reference's quirks replicated exactly:
  * depth = 1 / lerp(depths[0], depths[1], t) for EVERY edge — always the
    first two raster-order vertices' depths (:268, :307)
  * attributes interpolate between raster vertices 0 and 1 with weights
    (1-t, t, 0) regardless of which edge is drawn (:318-321)
  * pixel centers at +0.5; bbox clamped via float→int truncation
    (:246-249, :262-266)
  * write when alpha != 0 (not > 0, unlike fill mode — :325)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from softwarerenderer_tpu.config import (
    EPSILON,
    DebugMode,
    DepthTest,
    RenderParams,
)
from softwarerenderer_tpu.ops.geometry import unflatten_varyings
from softwarerenderer_tpu.ops.raster import _blend

F32 = jnp.float32


def _depth_passes(mode: DepthTest, new, old):
    """The reference's inverted comparison table (Rasterizer.cs:542-559),
    elementwise — incl. the order-dependent EQUAL/NOT_EQUAL rows."""
    if mode == DepthTest.LESS_EQUAL:
        return new >= old
    if mode in (DepthTest.DISABLED, DepthTest.ALWAYS):
        return jnp.ones_like(new, dtype=bool)
    if mode == DepthTest.LESS:
        return new > old
    if mode == DepthTest.GREATER:
        return new < old
    if mode == DepthTest.GREATER_EQUAL:
        return new <= old
    if mode == DepthTest.EQUAL:
        return jnp.abs(new - old) < F32(EPSILON)
    if mode == DepthTest.NOT_EQUAL:
        return jnp.abs(new - old) >= F32(EPSILON)
    return jnp.ones_like(new, dtype=bool)


def _pack_attrs(tris: Dict):
    keys = sorted(tris["attrs"].keys())
    slices = {}
    off = 0
    parts = []
    for k in keys:
        arr = tris["attrs"][k]
        parts.append(arr)
        slices[k] = (off, off + arr.shape[-1])
        off += arr.shape[-1]
    return jnp.concatenate(parts, axis=-1), slices, keys


def _interp_fragment(av, slices, keys, clip_w, w0f, w1f, w2f):
    """Rasterizer.Interpolate over (H, W) for ONE triangle's attrs av
    (3, K)."""
    rcp_wa = w0f / clip_w[0]
    rcp_wb = w1f / clip_w[1]
    rcp_wc = w2f / clip_w[2]
    wsum = rcp_wa + rcp_wb + rcp_wc
    w = F32(1.0) / jnp.where(wsum == 0, F32(1), wsum)
    wa, wb, wc = rcp_wa * w, rcp_wb * w, rcp_wc * w

    pc = (av[0] * rcp_wa[..., None] + av[1] * rcp_wb[..., None]
          + av[2] * rcp_wc[..., None]) * w[..., None]
    pw = (av[0] * wa[..., None] + av[1] * wb[..., None]
          + av[2] * wc[..., None])
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
    return frag


def render_forward(tris: Dict, fragment_shader: Callable, uniforms: Dict,
                   params: RenderParams,
                   fb_color: jnp.ndarray, fb_depth: jnp.ndarray,
                   per_tri_extra: Optional[Dict] = None,
                   row_offset=0):
    """Sequential blend-exact pass.  Same contract as render_deferred."""
    H, W = fb_depth.shape
    packed, slices, keys = _pack_attrs(tris)
    clo, chi = slices["clip_position"]

    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(F32)
    py = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
          + jnp.asarray(row_offset, jnp.int32)).astype(F32)
    pxc = px + F32(0.5)   # wireframe pixel centers (Rasterizer.cs:270)
    pyc = py + F32(0.5)

    wireframe = params.debug_mode == DebugMode.WIREFRAME
    depth_writes = params.depth_test != DepthTest.DISABLED

    def fill_step(color, depth, s, dv, ia, av, valid, extra):
        a12 = s[1, 1] - s[2, 1]; b12 = s[2, 0] - s[1, 0]
        a20 = s[2, 1] - s[0, 1]; b20 = s[0, 0] - s[2, 0]
        a01 = s[0, 1] - s[1, 1]; b01 = s[1, 0] - s[0, 0]
        w0 = a12 * (px - s[1, 0]) + b12 * (py - s[1, 1])
        w1 = a20 * (px - s[2, 0]) + b20 * (py - s[2, 1])
        w2 = a01 * (px - s[0, 0]) + b01 * (py - s[0, 1])
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
                 ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
        w0f, w1f, w2f = w0 * ia, w1 * ia, w2 * ia
        d = dv[0] * w0f + dv[1] * w1f + dv[2] * w2f
        passes = inside & valid & _depth_passes(params.depth_test, d, depth)

        frag = _interp_fragment(av, slices, keys, av[:, chi - 1],
                                w0f, w1f, w2f)
        if extra is not None:
            frag["tri"] = extra
        src = fragment_shader(frag, uniforms, jnp)
        written = passes & (src[..., 3] > 0)
        color = jnp.where(written[..., None],
                          _blend(src, color, params.blend_mode), color)
        if depth_writes:
            depth = jnp.where(written, d, depth)
        return color, depth

    def wire_step(color, depth, s, dv, ia, av, valid, extra):
        def one_line(i0, i1, carry):
            color, depth = carry
            p0, p1 = s[i0], s[i1]
            min_x = jnp.maximum(jnp.minimum(p0[0], p1[0]), 0).astype(jnp.int32)
            max_x = jnp.minimum(jnp.maximum(p0[0], p1[0]),
                                W - 1).astype(jnp.int32)
            min_y = jnp.maximum(jnp.minimum(p0[1], p1[1]), 0).astype(jnp.int32)
            max_y = jnp.minimum(jnp.maximum(p0[1], p1[1]),
                                H - 1 + row_offset).astype(jnp.int32)
            in_bbox = (px >= min_x) & (px <= max_x) & \
                      (py >= min_y) & (py <= max_y)
            dx = p1[0] - p0[0]
            dy = p1[1] - p0[1]
            len_sq = dx * dx + dy * dy
            rx = pxc - p0[0]
            ry = pyc - p0[1]
            t = jnp.where(len_sq <= 0, 0.0, (rx * dx + ry * dy)
                          / jnp.where(len_sq == 0, F32(1), len_sq))
            t = jnp.clip(t, 0.0, 1.0)
            cx = p0[0] + t * dx
            cy = p0[1] + t * dy
            dist_sq = (pxc - cx) ** 2 + (pyc - cy) ** 2
            covered = in_bbox & (dist_sq <= F32(0.25))
            d = F32(1.0) / (dv[0] * (F32(1.0) - t) + dv[1] * t)
            passes = covered & valid \
                & _depth_passes(params.depth_test, d, depth)
            av_line = jnp.stack([av[0], av[1], av[0]])
            frag = _interp_fragment(av_line, slices, keys,
                                    av_line[:, chi - 1],
                                    F32(1.0) - t, t, jnp.zeros_like(t))
            if extra is not None:
                frag["tri"] = extra
            src = fragment_shader(frag, uniforms, jnp)
            written = passes & (src[..., 3] != 0)
            color = jnp.where(written[..., None],
                              _blend(src, color, params.blend_mode), color)
            new_depth = jnp.where(written, d, depth) if depth_writes \
                else depth
            return color, new_depth

        carry = (color, depth)
        for i0, i1 in ((0, 1), (1, 2), (2, 0)):
            carry = one_line(i0, i1, carry)
        return carry

    step_fn = wire_step if wireframe else fill_step

    def scan_step(carry, xs):
        color, depth = carry
        s, dv, ia, av, valid, extra = xs
        color, depth = step_fn(color, depth, s, dv, ia, av, valid, extra)
        return (color, depth), None

    extras = None
    if per_tri_extra:
        extras = {k: jnp.asarray(v) for k, v in per_tri_extra.items()}
    xs = (tris["screen"], tris["depth"], tris["inv_area"], packed,
          tris["valid"], extras)
    (color, depth), _ = jax.lax.scan(scan_step, (fb_color, fb_depth), xs)
    return color, depth
