from mpc_collisionavoidance_tpu.sim.closed_loop import run_closed_loop, ClosedLoopResult
from mpc_collisionavoidance_tpu.sim import scenarios

__all__ = ["run_closed_loop", "ClosedLoopResult", "scenarios"]
