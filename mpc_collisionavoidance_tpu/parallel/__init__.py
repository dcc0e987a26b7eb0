from mpc_collisionavoidance_tpu.parallel.sharding import (
    make_mesh, make_sharded_batch_solver, fleet_metrics, shard_batch,
)

__all__ = ["make_mesh", "make_sharded_batch_solver", "fleet_metrics",
           "shard_batch"]
