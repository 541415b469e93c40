from softwarerenderer_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_frame_sharded,
    shard_scene_triangles,
)
from softwarerenderer_tpu.parallel.ring import (  # noqa: F401
    make_ring_mesh,
    render_frame_ring,
)
from softwarerenderer_tpu.parallel.multiview import (  # noqa: F401
    make_view_mesh,
    render_frame_views,
    stack_views,
)
from softwarerenderer_tpu.parallel.raytrace import (  # noqa: F401
    render_frame_raytraced_sharded,
)
