"""Multi-chip execution: camera-sharded SPMD over a jax.sharding.Mesh."""

from thor_slam_tpu.parallel.mesh import (
    make_camera_mesh,
    make_sharded_track_step,
    shard_state,
)

__all__ = ["make_camera_mesh", "make_sharded_track_step", "shard_state"]
