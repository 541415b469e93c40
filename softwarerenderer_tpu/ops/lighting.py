"""Multi-light shading: batched point/directional/spot light accumulation.

The reference LOADS light records from the scene (Light.cs, ModelLoader.cs
:305-322) but never consumes them — its only lighting is the hardcoded
directional half-Lambert in the game's fragment shader (Renderer.cs:
851-858; SURVEY.md §2 "Loaded but never consumed").  This module closes
that gap (BASELINE config 3: "multi-object frustum-culled multi-light
scene"): scene lights pack into fixed-size uniform arrays and every
fragment accumulates all lights in one vectorized pass — no loops over
lights in Python, one (P, L) broadcast on the VPU.

Light model (matching Light.cs's fields):
  directional: L = -direction, no attenuation
  point:       L = normalize(pos - x), atten = 1/(c + l·d + q·d²)
  spot:        point × smooth cone falloff between outer/inner angles
  ambient:     constant color
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from softwarerenderer_tpu.models.scene import Light, LightType
from softwarerenderer_tpu.utils import mathlib as ml

F32 = np.float32


def pack_lights(lights: List[Light], max_lights: int = 8) -> Dict:
    """Scene Light records → fixed-size uniform arrays (padded, masked)."""
    n = min(len(lights), max_lights)
    out = {
        "light_position": np.zeros((max_lights, 3), F32),
        "light_dir": np.zeros((max_lights, 3), F32),
        "light_rgb": np.zeros((max_lights, 3), F32),
        "light_type": np.zeros(max_lights, np.int32),
        "light_atten": np.zeros((max_lights, 3), F32),  # const, lin, quad
        "light_cone": np.zeros((max_lights, 2), F32),   # cos inner, cos outer
        "light_on": np.zeros(max_lights, bool),
    }
    for i, l in enumerate(lights[:n]):
        out["light_position"][i] = l.position
        d = np.asarray(l.direction, F32)
        norm = np.linalg.norm(d)
        out["light_dir"][i] = d / norm if norm > 0 else d
        out["light_rgb"][i] = l.color
        out["light_type"][i] = l.light_type
        out["light_atten"][i] = (l.attenuation_constant,
                                 l.attenuation_linear,
                                 l.attenuation_quadratic)
        out["light_cone"][i] = (np.cos(l.spot_inner), np.cos(l.spot_outer))
        out["light_on"][i] = True
    return out


def accumulate_lights(world_pos, world_normal, uniforms, xp) -> "array":
    """Summed RGB irradiance at each fragment: (..., 3).

    world_pos/world_normal: (..., 3); light arrays from pack_lights ride in
    `uniforms`.  Broadcasts to (..., L, 3) and reduces over L.
    """
    lp = uniforms["light_position"]          # (L, 3)
    ld = uniforms["light_dir"]
    lc = uniforms["light_rgb"]
    lt = uniforms["light_type"]
    la = uniforms["light_atten"]
    cone = uniforms["light_cone"]
    on = uniforms["light_on"]

    p = world_pos[..., None, :]              # (..., 1, 3)
    n = world_normal[..., None, :]

    to_light = lp - p                        # (..., L, 3)
    dist = xp.sqrt(xp.sum(to_light * to_light, axis=-1))
    safe = xp.where(dist == 0, F32(1), dist)
    point_dir = to_light / safe[..., None]

    is_dir = lt == LightType.DIRECTIONAL
    is_amb = lt == LightType.AMBIENT
    ldir = xp.where(is_dir[..., None], -ld, point_dir)

    ndotl = xp.maximum(xp.sum(n * ldir, axis=-1), F32(0.0))

    atten = F32(1.0) / (la[..., 0] + la[..., 1] * dist
                        + la[..., 2] * dist * dist)
    atten = xp.where(is_dir, F32(1.0), atten)

    # spot cone: smoothstep between cos(outer) and cos(inner)
    cos_angle = xp.sum(-ldir * ld, axis=-1)
    t = xp.clip((cos_angle - cone[..., 1])
                / xp.where(cone[..., 0] == cone[..., 1], F32(1),
                           cone[..., 0] - cone[..., 1]), 0.0, 1.0)
    spot = t * t * (F32(3.0) - F32(2.0) * t)
    is_spot = lt == LightType.SPOT
    factor = xp.where(is_spot, spot, F32(1.0))

    contrib = xp.where(is_amb, F32(1.0), ndotl * atten * factor)
    rgb = lc * (contrib * on)[..., None]
    return xp.sum(rgb, axis=-2)


def multi_light_fragment_shader(frag, uniforms, xp):
    """Texture(atlas) × vertex color lit by all packed lights + ambient
    floor, fog as in the game shader (Renderer.cs:848-860)."""
    from softwarerenderer_tpu.ops import texture as tex_ops

    world_normal = frag["data"]["world_normal"]
    world_pos = frag["data"]["world_position"][..., :3]
    from softwarerenderer_tpu.engine.renderer import _frag_atlas_sample
    tex_color = _frag_atlas_sample(frag, uniforms, xp)
    base = frag["color"] * tex_color
    light = accumulate_lights(world_pos, world_normal, uniforms, xp)
    ambient = uniforms.get("ambient", F32(0.1))
    lit_rgb = base[..., :3] * (ambient + light)

    depth = frag["clip_position"][..., 2]
    fog = xp.clip((uniforms["fog_end"] - depth)
                  / (uniforms["fog_end"] - uniforms["fog_start"]),
                  F32(0.0), F32(1.0))
    fog = fog * fog * (F32(3.0) - F32(2.0) * fog)
    rgb = uniforms["fog_color"][..., :3] \
        + (lit_rgb - uniforms["fog_color"][..., :3]) * fog[..., None]
    return xp.concatenate([rgb, base[..., 3:4]], axis=-1)


multi_light_fragment_shader.varyings = (
    "color", "uv", "data.world_normal", "data.world_position")


def lit_scene_vertex_shader(vin, uniforms, xp):
    """scene_vertex_shader + world position varying for point lights."""
    world = ml.transform(ml.homogenize(vin["position"], xp=xp),
                         uniforms["model"], xp=xp)
    view_pos = ml.transform(world, uniforms["view"], xp=xp)
    clip = ml.transform(view_pos, uniforms["projection"], xp=xp)
    world_normal = ml.normalize(
        ml.transform_normal(vin["normal"], uniforms["model"], xp=xp),
        xp=xp, eps=1e-30)
    return {
        "clip_position": clip,
        "color": vin["color"],
        "uv": vin["uv"],
        "normal": vin["normal"],
        # world_position rides as a 4-vector: the reference's Data channel
        # RENORMALIZES every 3-component entry after interpolation
        # (Rasterizer.cs:680-688), which would destroy positions.
        "data": {"world_normal": world_normal,
                 "world_position": world},
    }


multi_light_fragment_shader.tri_extras = (
    "tex_oy", "tex_ox", "tex_h", "tex_w")
# Alpha provenance (engine.opaque_tri_flags): output alpha is vertex
# color.a x texture alpha (material/lighting touch rgb only).
multi_light_fragment_shader.alpha_sources = ("color", "texture")


def pbr_scene_fragment_shader(frag, uniforms, xp):
    """Stylized metalness-workflow shading that CONSUMES the
    metallic / roughness / emissive material properties the reference
    imports but never uses (Material.cs:14-22, ModelLoader.cs:221-281 —
    SURVEY.md §2 "kept unused-by-shaders").

    Blinn-Phong specular with a roughness-driven exponent, metalness
    blending F0 between dielectric 0.04 and the albedo, emissive added
    unfogged-by-light (fog still applies).  Per-triangle 8-bit material
    channels ride the integer extras — no per-pixel table gathers."""
    from softwarerenderer_tpu.engine.renderer import _frag_atlas_sample

    tri = frag["tri"]
    m = tri["mat_m256"].astype(xp.float32) * F32(1 / 256.0)
    r = tri["mat_r256"].astype(xp.float32) * F32(1 / 256.0)
    emissive = xp.stack(
        [tri["mat_er256"], tri["mat_eg256"], tri["mat_eb256"]],
        axis=-1).astype(xp.float32) * F32(1 / 256.0)

    n = frag["data"]["world_normal"]
    n = n / xp.sqrt(xp.maximum(xp.sum(n * n, -1, keepdims=True),
                               F32(1e-30)))
    wp = frag["data"]["world_position"][..., :3]
    v = uniforms["camera_position"] - wp
    v = v / xp.sqrt(xp.maximum(xp.sum(v * v, -1, keepdims=True),
                               F32(1e-30)))
    ld = uniforms["light_direction"]
    l = -ld / xp.sqrt(xp.maximum(xp.sum(ld * ld, -1), F32(1e-30)))
    h = l + v
    h = h / xp.sqrt(xp.maximum(xp.sum(h * h, -1, keepdims=True),
                               F32(1e-30)))
    ndl = xp.maximum(xp.sum(n * l, -1), F32(0.0))
    ndh = xp.maximum(xp.sum(n * h, -1), F32(0.0))

    tex_color = _frag_atlas_sample(frag, uniforms, xp)
    base = frag["color"] * tex_color
    # Fold the MATERIAL base color in (the reference's shaders ignore it;
    # here it tints the albedo like glTF's baseColorFactor).
    mat_rgb = xp.stack(
        [tri["mat_br256"], tri["mat_bg256"], tri["mat_bb256"]],
        axis=-1).astype(xp.float32) * F32(1 / 256.0)
    albedo = base[..., :3] * mat_rgb

    # The game's half-Lambert floor (Renderer.cs:851-858) on the diffuse
    # lobe; roughness sets the Blinn-Phong exponent (clamped for fp32).
    diffuse = xp.maximum(F32(0.25), xp.sum(n * l, -1))
    shininess = xp.clip(F32(2.0) / xp.maximum(r * r, F32(1e-3)),
                        F32(2.0), F32(2048.0))
    spec = xp.power(ndh, shininess) * (shininess + F32(8.0)) * F32(1 / 8.0)
    f0 = F32(0.04) * (F32(1.0) - m[..., None]) + albedo * m[..., None]

    light_rgb = uniforms["light_color"][..., :3]
    lit = (albedo * (F32(1.0) - m[..., None])
           * (F32(0.1) + F32(0.9) * diffuse[..., None])
           + f0 * (spec * ndl)[..., None]) * light_rgb + emissive

    if "env_panorama" in uniforms:
        # Environment reflections: when the frame has a sky panorama
        # (engine aliases it as env_panorama inside the sky branch),
        # metals mirror it along the reflected view ray, faded by
        # roughness.  One extra bilinear panorama fetch per pixel.
        from softwarerenderer_tpu.ops.sky import sample_panorama
        refl = F32(2.0) * xp.sum(n * v, -1, keepdims=True) * n - v
        env = sample_panorama(uniforms["env_panorama"], refl, xp=xp)
        gloss = xp.clip(F32(1.0) - r, 0.0, 1.0) * m
        lit = lit + f0 * env[..., :3] * gloss[..., None]
    if "env_irradiance" in uniforms:
        # Image-based diffuse ambient: the cosine-convolved panorama
        # (sky.irradiance_panorama, computed once host-side) sampled by
        # the surface NORMAL lights the diffuse lobe.
        from softwarerenderer_tpu.ops.sky import sample_panorama
        irr = sample_panorama(uniforms["env_irradiance"], n, xp=xp)
        lit = lit + albedo * (F32(1.0) - m[..., None]) * irr[..., :3]

    depth = frag["clip_position"][..., 2]
    fog = xp.clip((uniforms["fog_end"] - depth)
                  / (uniforms["fog_end"] - uniforms["fog_start"]),
                  F32(0.0), F32(1.0))
    fog = fog * fog * (F32(3.0) - F32(2.0) * fog)
    rgb = uniforms["fog_color"][..., :3] \
        + (lit - uniforms["fog_color"][..., :3]) * fog[..., None]
    return xp.concatenate([rgb, base[..., 3:4]], axis=-1)


pbr_scene_fragment_shader.varyings = (
    "color", "uv", "data.world_normal", "data.world_position")
pbr_scene_fragment_shader.tri_extras = (
    "tex_oy", "tex_ox", "tex_h", "tex_w",
    "mat_m256", "mat_r256", "mat_er256", "mat_eg256", "mat_eb256",
    "mat_br256", "mat_bg256", "mat_bb256")
# Alpha provenance (engine.opaque_tri_flags): output alpha is vertex
# color.a x texture alpha (material/lighting touch rgb only).
pbr_scene_fragment_shader.alpha_sources = ("color", "texture")
