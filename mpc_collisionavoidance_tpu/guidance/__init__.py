"""Guidance layer: the control logic of the reference C++ nodes as pure,
vmappable JAX functions (SURVEY.md section 7, layer 5)."""

from mpc_collisionavoidance_tpu.guidance.controller import (  # noqa: F401
    Commands, GuidanceController, GuidanceState, Measurements)
from mpc_collisionavoidance_tpu.guidance.nodes import (  # noqa: F401
    PFCommands, PFController, PFMeasurements, PFState,
    ThrustMPCCommands, ThrustMPCController, ThrustMPCState,
    ThrustMeasurements)
from mpc_collisionavoidance_tpu.guidance.obstacles import (  # noqa: F401
    ObstacleSlots, intake, lidar_scan, perceive)
from mpc_collisionavoidance_tpu.guidance.waypoints import (  # noqa: F401
    MissionState, SegmentFrame, mission_init, waypoint_manager)
