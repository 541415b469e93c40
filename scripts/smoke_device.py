"""Manual smoke: device deferred raster vs ref_cpu golden on small scenes."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

from softwarerenderer_tpu import RenderParams, CullMode, DepthTest, BlendMode
from softwarerenderer_tpu.models import primitives
from softwarerenderer_tpu import shaders
from softwarerenderer_tpu.utils import mathlib as ml
from softwarerenderer_tpu.ref_cpu import rasterizer as ref
from softwarerenderer_tpu.ops import geometry, raster

W, H = 160, 128

def uniforms_for(model, eye=(0, 0, 3.0), fov=60.0):
    view = ml.look_at(np.asarray(eye, np.float32), [0, 0, 0], [0, 1, 0])
    proj = ml.perspective_fov(np.deg2rad(fov), W / H, 0.1, 100.0)
    return {
        "model": model.astype(np.float32),
        "view": view, "projection": proj,
        "light_direction": np.asarray([0.5, -1.0, -0.3], np.float32) / np.linalg.norm([0.5, -1.0, -0.3]),
        "light_color": np.ones(4, np.float32),
        "fog_color": np.asarray([0.2, 0.3, 0.4, 1.0], np.float32),
        "fog_start": np.float32(10.0), "fog_end": np.float32(50.0),
        "near_clip": np.float32(0.1),
    }

def run_case(mesh, model, frag_shader, label, vert_shader=shaders.default_vertex_shader):
    u = uniforms_for(model)
    vin = shaders.make_vertex_input(mesh["position"], mesh["uv"], mesh["normal"], mesh["color"])
    # CPU golden
    fb = ref.Framebuffer(W, H)
    fb.clear_color([0.2, 0.3, 0.4, 1.0])
    ref.render_mesh(fb, vin, mesh["indices"], u, vert_shader, frag_shader)
    # Device
    params = RenderParams(width=W, height=H)
    def frame(vin, idx, u):
        tris = geometry.build_triangles(vert_shader, vin, idx, u, width=W, height=H)
        c0 = jnp.broadcast_to(jnp.asarray([0.2, 0.3, 0.4, 1.0], jnp.float32), (H, W, 4))
        d0 = jnp.full((H, W), raster.DEPTH_CLEAR, jnp.float32)
        return raster.render_deferred(tris, frag_shader, u, params, c0, d0)
    color, depth = jax.jit(frame)(vin, mesh["indices"], u)
    color = np.asarray(color); depth = np.asarray(depth)
    cdiff = np.abs(color - fb.color)
    ddiff = np.abs(depth - fb.depth)
    bad = (cdiff.max(-1) > 1e-4).mean()
    print(f"{label}: max cdiff={cdiff.max():.3e} frac-bad-px={bad:.5f} "
          f"max ddiff={ddiff[np.isfinite(fb.depth) & (fb.depth>-1e30)].max() if (fb.depth>-1e30).any() else 0:.3e} "
          f"coverage ref={(fb.depth>-1e30).mean():.3f} dev={(depth>-1e30).mean():.3f}")

soup = primitives.random_triangle_soup(60, seed=1)
run_case(soup, np.eye(4, dtype=np.float32), shaders.flat_color_fragment_shader, "soup60/flat")
cube = primitives.cube(1.2)
rot = ml.matrix_from_yaw_pitch_roll(0.6, 0.4, 0.0)
run_case(cube, rot, shaders.default_fragment_shader, "cube/default-lit")

# near-clip stress: triangles crossing the camera plane
soup2 = primitives.random_triangle_soup(40, seed=3, z_range=(-4.0, 1.0))
run_case(soup2, np.eye(4, dtype=np.float32), shaders.flat_color_fragment_shader, "soup40/nearclip")
print("done")
