"""Tone-mapping operators (beyond the reference, which writes raw
clipped RGB).  Applied as the OUTERMOST post step (after bloom/SSAO/
sky) so overbright emissives, speculars and bloom compress smoothly
into display range instead of clipping.

Pure elementwise VPU work; exposure is a traced uniform
(uniforms["exposure"], default 1.0) so it live-tunes without recompile.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def reinhard(x, xp=np):
    """x / (1 + x) — the classic global operator."""
    return x / (F32(1.0) + x)


def aces(x, xp=np):
    """Narkowicz's ACES filmic fit: punchier shoulder/toe than
    Reinhard."""
    a, b, c, d, e = F32(2.51), F32(0.03), F32(2.43), F32(0.59), F32(0.14)
    return xp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


_OPERATORS = {"reinhard": reinhard, "aces": aces}


def apply_tonemap(color, mode: str, uniforms, xp=np):
    """Exposure-scaled operator over rgb; alpha passes through."""
    fn = _OPERATORS[mode]
    exposure = xp.asarray(uniforms.get("exposure", 1.0), xp.float32)
    rgb = fn(xp.maximum(color[..., :3], F32(0.0)) * exposure, xp=xp)
    return xp.concatenate([rgb, color[..., 3:4]], axis=-1)
