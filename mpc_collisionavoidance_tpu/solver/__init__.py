from mpc_collisionavoidance_tpu.solver.sqp_rti import (
    RTISolver, SolverState, SolverOutput,
)

__all__ = ["RTISolver", "SolverState", "SolverOutput"]
