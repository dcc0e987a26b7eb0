"""The flagship guidance controller: full node behavior as one pure tick.

Composes the mission manager (`guidance/waypoints.py`), the obstacle intake
(`guidance/obstacles.py`) and the RTI solver into the complete per-tick
behavior of the reference `nmpc_guidance_ca1` node (reference
catkin_ws/src/nmpc_ca/src/nmpc_guidance_ca1.cpp, 20 Hz loop :606-640):

measurements + waypoint table + obstacle field
    -> waypoint_manager -> crab-angle state packing -> obstacle slots
    -> one SQP-RTI solve -> (psi_d, r_d, u_d, ye) commands.

The ROS pub/sub seams of the reference (velocity/position/waypoints/
obstacles callbacks :223-250, six publishers :172-184) become function
arguments and a returned `Commands` tuple; the node's mutable members
(`k`, `past_psied`, solver warm start held inside acados) become the
explicit `GuidanceState` carry.  Everything is shape-static and
branch-free, so a fleet of vehicles is `jax.vmap(tick)` and a whole
mission is `jax.lax.scan(tick)`.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mpc_collisionavoidance_tpu.guidance import obstacles as obs
from mpc_collisionavoidance_tpu.guidance.waypoints import (
    MissionState, mission_init, waypoint_manager)
from mpc_collisionavoidance_tpu.ocp.spec import OCPSpec
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver, SolverState
from mpc_collisionavoidance_tpu.utils.angles import wrap_once

# usv_guidance_ca1 state indices (reference state enum :80-93)
IU, IV, IYE, ICHIE, IPSIED, IXNED, IYNED, IPSI = range(8)


class Measurements(NamedTuple):
    """INS feedback (reference velocity/position callbacks :223-241)."""
    u: jnp.ndarray
    v: jnp.ndarray
    nedx: jnp.ndarray
    nedy: jnp.ndarray
    psi: jnp.ndarray


class Commands(NamedTuple):
    """The node's published outputs (reference :587-600)."""
    psi_d: jnp.ndarray       # desired heading = x1[psied] + ak, wrapped
    r_d: jnp.ndarray         # desired yaw rate = u0 (psi_e_d rate)
    u_d: jnp.ndarray         # desired speed (0.7 cruising / 0.0 done)
    ye: jnp.ndarray          # cross-track error (telemetry)
    target: jnp.ndarray      # (2,) current target waypoint
    collision: jnp.ndarray   # any obstacle slot in collision
    solver_status: jnp.ndarray
    active: jnp.ndarray
    ak: jnp.ndarray          # current segment angle (telemetry / plant frame)
    x0: jnp.ndarray          # (8,) packed OCP initial state fed to the solver


class GuidanceState(NamedTuple):
    mission: MissionState
    solver: SolverState
    psi_d_hold: jnp.ndarray  # last published heading (held when inactive,
    r_d_hold: jnp.ndarray    # mirroring the node going silent :487-490)


class GuidanceController:
    """One vehicle's guidance stack; `tick` is pure and vmappable."""

    def __init__(self, spec: OCPSpec, solver: Optional[RTISolver] = None,
                 ipm_iters: int = 12):
        assert spec.model.name == "usv_guidance_ca1", spec.model.name
        self.spec = spec
        self.solver = solver or RTISolver(spec, ipm_iters=ipm_iters)

    # ------------------------------------------------------------------
    def init_state(self, meas: Measurements, waypoints, n_wp,
                   dtype=jnp.float32) -> GuidanceState:
        """Mission seed on a fresh waypoint list (reference :616-632)."""
        mission = mission_init(waypoints, n_wp, meas.psi, dtype)
        x0 = self._pack_x0(meas, mission.past_psied,
                           jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
        return GuidanceState(
            mission=mission,
            solver=self.solver.init_state(x0, dtype=dtype),
            psi_d_hold=jnp.asarray(meas.psi, dtype),
            r_d_hold=jnp.asarray(0.0, dtype),
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _pack_x0(meas: Measurements, past_psied, ye, ak):
        """Measurement -> OCP initial state (reference control() :495-512):
        crab angle beta = atan2(v, u) with the u == 0 -> 0.001 guard
        (velocityCallback :224-228), course error chie = psi + beta - ak
        wrapped once."""
        u = jnp.where(meas.u == 0.0, 0.001, meas.u)
        beta = jnp.arctan2(meas.v, u)
        chie = wrap_once(meas.psi + beta - ak)
        return jnp.stack([u, meas.v, ye, chie, past_psied,
                          meas.nedx, meas.nedy, meas.psi])

    # ------------------------------------------------------------------
    def tick(self, state: GuidanceState, meas: Measurements,
             waypoints, n_wp, obstacle_field, field_valid):
        """One 20 Hz control tick (the body of the reference main loop)."""
        mission, frame = waypoint_manager(
            state.mission, waypoints, n_wp, meas.nedx, meas.nedy)

        slots = obs.perceive(obstacle_field, field_valid,
                             meas.nedx, meas.nedy, meas.psi)

        x0 = self._pack_x0(meas, mission.past_psied, frame.ye, frame.ak)
        solver_state, out = self.solver.step_fn(
            state.solver, x0, slots.p_obs, slots.r_obs)

        # command extraction (reference :583-600): heading from the STAGE-1
        # predicted psi_e_d (input is at derivative level), rate from u0
        psi_d = wrap_once(out.x1[IPSIED] + frame.ak)
        r_d = out.u0[0]
        active = mission.active

        mission = mission._replace(
            past_psied=jnp.where(active, out.x1[IPSIED],
                                 mission.past_psied))
        psi_d_held = jnp.where(active, psi_d, state.psi_d_hold)
        r_d_held = jnp.where(active, r_d, state.r_d_hold)

        cmds = Commands(
            psi_d=psi_d_held, r_d=r_d_held, u_d=frame.u_d,
            ye=frame.ye, target=frame.target,
            collision=jnp.any(slots.collision),
            solver_status=out.status, active=active,
            ak=frame.ak, x0=x0,
        )
        new_state = GuidanceState(mission=mission, solver=solver_state,
                                  psi_d_hold=psi_d_held, r_d_hold=r_d_held)
        return new_state, cmds
