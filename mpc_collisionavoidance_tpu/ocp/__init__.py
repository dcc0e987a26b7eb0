from mpc_collisionavoidance_tpu.ocp.spec import OCPSpec, LinearLSCost, SoftPenalty
from mpc_collisionavoidance_tpu.ocp import builders

__all__ = ["OCPSpec", "LinearLSCost", "SoftPenalty", "builders"]
