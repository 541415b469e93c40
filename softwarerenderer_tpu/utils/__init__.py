from softwarerenderer_tpu.utils import mathlib  # noqa: F401
