"""Real-time serving layer: the reference's C++/ROS node boundary as a
native client (rt_client/) + device serving engine (rt/server.py)."""

from mpc_collisionavoidance_tpu.rt import protocol  # noqa: F401
