"""Directional shadow maps — a capability beyond the reference (ROADMAP #5).

The reference has no shadows (its single directional light is a hardcoded
dot product, /root/reference/Renderer.cs:851-858).  Here the visibility
machinery already renders depth from ANY camera, so shadows are one extra
depth-only pass:

  1. `directional_light_camera` builds an orthographic light camera over
     the scene's bounding sphere (row-vector .NET conventions, same depth
     semantics as the main camera: stored depth decreases with distance,
     nearest wins the LESS_EQUAL fold).
  2. `render_shadow_depth` runs the binned visibility fold from the light —
     depth only, no shading, one extra jitted stage inside the same frame
     program.
  3. `shadow_factor` projects world positions into the light's screen and
     compares against the map (one 4-byte row-gather per pixel — the same
     gather-lean layout as the texture atlas).

Shaders opt in by multiplying their lit term with
`shadow_factor(frag["data"]["world_position"], uniforms, xp)`; see
`shadowed_scene_fragment_shader` and `engine.render_frame_with_shadows`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from softwarerenderer_tpu.config import RenderParams
from softwarerenderer_tpu.ops import geometry
from softwarerenderer_tpu.ops.binning import visibility_binned
from softwarerenderer_tpu.utils import mathlib as ml

F32 = jnp.float32


def directional_light_camera(light_direction, center, radius, xp=jnp):
    """Ortho (view, projection) for a directional light covering the sphere
    (center, radius).  Returns (view, proj, view_proj)."""
    d = ml.normalize(xp.asarray(light_direction, xp.float32), xp=xp)
    center = xp.asarray(center, xp.float32)
    radius = xp.asarray(radius, xp.float32)
    eye = center - d * (radius * F32(2.0))
    up0 = xp.asarray([0.0, 1.0, 0.0], xp.float32)
    up1 = xp.asarray([1.0, 0.0, 0.0], xp.float32)
    up = xp.where(xp.abs(d[1]) > F32(0.95), up1, up0)
    view = ml.look_at(eye, center, up, xp=xp)
    extent = radius * F32(2.2)
    proj = ml.orthographic(extent, extent, F32(0.05) * radius,
                           radius * F32(4.0), xp=xp)
    return view, proj, ml.transform(view, proj, xp=xp)


def render_shadow_depth(scene: Dict, uniforms: Dict, light_view, light_proj,
                        shadow_size: int = 512,
                        params: Optional[RenderParams] = None):
    """Depth-only render from the light camera → (S, S) shadow map.

    Uses the same geometry pipeline + binned visibility fold as the main
    frame (cull_mode NONE so back faces still occlude)."""
    S = shadow_size
    sp = (params or RenderParams()).replace(
        width=S, height=S, cull_mode=0)
    model_pv = jnp.take(scene["mesh_matrices"], scene["vert_mesh_id"],
                        axis=0)
    u = dict(uniforms)
    u.update(model=model_pv, view=light_view, projection=light_proj)
    vin = {k: scene[k] for k in ("position", "uv", "normal", "color")}
    tri_mask = scene.get("tri_valid")

    def light_vs(vin, uu, xp=jnp):
        world = ml.transform(ml.homogenize(vin["position"], xp=xp),
                             uu["model"], xp=xp)
        view_pos = ml.transform(world, uu["view"], xp=xp)
        clip = ml.transform(view_pos, uu["projection"], xp=xp)
        return {"clip_position": clip}

    tris = geometry.build_triangles(
        light_vs, vin, scene["indices"], u, width=S, height=S,
        cull_mode=0, near_clip=jnp.asarray(1e-4, F32), tri_mask=tri_mask,
        keep_varyings=())
    depth, _ = visibility_binned(
        tris, sp, sp.chunk, tile_h=min(sp.tile_h, S),
        tile_w=min(sp.tile_w, S), span_cap=sp.span_cap,
        tile_group=sp.tile_group)
    return depth


def shadow_factor(world_position, uniforms, xp=jnp, bias: float = 4e-3):
    """Per-pixel lit factor in {0, 1} from the shadow map.

    world_position: (..., 3) or (..., 4); uniforms must carry
    shadow_map (S, S), shadow_view, shadow_proj (render_frame_with_shadows
    populates them).  Points outside the light frustum count as lit."""
    smap = uniforms["shadow_map"]
    S = smap.shape[0]
    wp = xp.asarray(world_position, xp.float32)[..., :3]
    clip = ml.transform(
        ml.homogenize(wp, xp=xp),
        ml.transform(uniforms["shadow_view"], uniforms["shadow_proj"],
                     xp=xp), xp=xp)
    w = xp.where(clip[..., 3] == 0, F32(1.0), clip[..., 3])
    ndc = clip[..., :3] / w[..., None]
    # Same viewport mapping as geometry.setup_triangles (Y flip).
    sx = (ndc[..., 0] * F32(0.5) + F32(0.5)) * F32(S)
    sy = (F32(1.0) - (ndc[..., 1] * F32(0.5) + F32(0.5))) * F32(S)
    # Fragment depth in the light's buffer convention: the stored value is
    # the NEGATED (ndcZ+1)/2 (config.py depth-semantics note), decreasing
    # with distance from the light.
    d_f = -(ndc[..., 2] + F32(1.0)) * F32(0.5)
    xi = xp.clip(sx.astype(xp.int32), 0, S - 1)
    yi = xp.clip(sy.astype(xp.int32), 0, S - 1)
    # 4-byte row gather (gather-lean: see BENCHMARKS.md gather model).
    d_m = xp.take(smap.reshape(S * S, 1), yi * S + xi, axis=0)[..., 0]
    inside = (sx >= 0) & (sx < S) & (sy >= 0) & (sy < S)
    lit = (d_f >= d_m - F32(bias)) | ~inside
    return lit.astype(xp.float32)


def shadowed_scene_fragment_shader(frag, uniforms, xp=jnp):
    """The game shader with the lit term scaled by the shadow factor."""
    from softwarerenderer_tpu.engine.renderer import _frag_atlas_sample

    world_normal = frag["data"]["world_normal"]
    light_dir = uniforms["light_direction"]
    diffuse = xp.maximum(F32(0.25),
                         ml.dot(world_normal, -light_dir, xp=xp))
    shade = shadow_factor(frag["data"]["world_position"], uniforms, xp=xp)
    # shadowed pixels fall to the ambient floor
    diffuse = F32(0.25) + (diffuse - F32(0.25)) * shade
    tex_color = _frag_atlas_sample(frag, uniforms, xp)
    base = frag["color"] * tex_color
    depth = frag["clip_position"][..., 2]
    fog = xp.clip((uniforms["fog_end"] - depth)
                  / (uniforms["fog_end"] - uniforms["fog_start"]),
                  F32(0.0), F32(1.0))
    fog = fog * fog * (F32(3.0) - F32(2.0) * fog)
    lit = base * (F32(0.1) + F32(0.9) * diffuse[..., None]) \
        * uniforms["light_color"]
    rgba = uniforms["fog_color"] + (lit - uniforms["fog_color"]) \
        * fog[..., None]
    return xp.concatenate([rgba[..., :3], base[..., 3:4]], axis=-1)


shadowed_scene_fragment_shader.varyings = (
    "color", "uv", "data.world_normal", "data.world_position")
shadowed_scene_fragment_shader.tri_extras = (
    "tex_oy", "tex_ox", "tex_h", "tex_w")
