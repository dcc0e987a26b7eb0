from mpc_collisionavoidance_tpu.models.base import Model
from mpc_collisionavoidance_tpu.models import registry

__all__ = ["Model", "registry"]
