"""Distributed execution: device meshes, sharded bundle adjustment.

The reference is a single-process single-GPU program with no distributed
backend at all (SURVEY.md §2.9; its only networking is the WebSocket
telemetry server, reference src/WebSocket/WebSocketCom.cpp:85-123).  This
package is new construction: map-scale parallelism — landmark blocks and
their observation edges sharded over a `jax.sharding.Mesh`, with XLA
collectives (`psum`) reducing the camera system over ICI.  Multi-host entry
is `init_distributed()`; the live SLAM map runs BA through
`sharded_local_ba` whenever `models.slam.Slam` owns a mesh.
"""

from jetracer_orbslam2_tpu.parallel.mesh import (
    init_distributed, make_mesh, map_mesh, virtual_mesh)
from jetracer_orbslam2_tpu.parallel.ba_sharded import (
    ShardedBAProblem,
    prepare_sharded_problem,
    sharded_bundle_adjust,
    sharded_local_ba,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "map_mesh",
    "virtual_mesh",
    "ShardedBAProblem",
    "prepare_sharded_problem",
    "sharded_bundle_adjust",
    "sharded_local_ba",
]
