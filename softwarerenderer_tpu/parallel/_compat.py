"""shard_map compatibility across jax versions.

jax >= 0.8 exposes `jax.shard_map` (keyword `check_vma`); older versions only
have `jax.experimental.shard_map.shard_map` (keyword `check_rep`).  Both
callers here want replication checking off (the renderer's out_specs are
fully sharded and the tri-axis psum handles the reduction).
"""

from __future__ import annotations

try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    def shard_map_unchecked(f, *, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map_unchecked(f, *, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)
