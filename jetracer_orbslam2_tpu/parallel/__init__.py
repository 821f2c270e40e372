"""Distributed execution: device meshes, sharded bundle adjustment.

The reference is a single-process single-GPU program with no distributed
backend at all (SURVEY.md §2.9; its only networking is the WebSocket
telemetry server, reference src/WebSocket/WebSocketCom.cpp:85-123).  This
package is new construction: map-scale parallelism — landmark blocks and
their observation edges sharded over a `jax.sharding.Mesh`, with XLA
collectives (`psum`) reducing the camera system over ICI.
"""

from jetracer_orbslam2_tpu.parallel.mesh import make_mesh, map_mesh
from jetracer_orbslam2_tpu.parallel.ba_sharded import (
    ShardedBAProblem,
    prepare_sharded_problem,
    sharded_bundle_adjust,
)

__all__ = [
    "make_mesh",
    "map_mesh",
    "ShardedBAProblem",
    "prepare_sharded_problem",
    "sharded_bundle_adjust",
]
