from softwarerenderer_tpu.ref_cpu.rasterizer import (  # noqa: F401
    Framebuffer,
    render_mesh,
)
