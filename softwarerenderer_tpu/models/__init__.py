from softwarerenderer_tpu.models import primitives, scene  # noqa: F401
