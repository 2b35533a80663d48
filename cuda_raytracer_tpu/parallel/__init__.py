"""Multi-chip parallelism: mesh construction and sharded render steps."""

from .shard import ShardedRenderer, make_render_mesh, render_frame_sharded  # noqa: F401
