from softwarerenderer_tpu.ops import texture  # noqa: F401
