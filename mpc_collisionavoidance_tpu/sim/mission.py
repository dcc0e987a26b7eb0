"""Mission-level closed-loop simulation: the full multi-node ROS graph,
in-process, as one `lax.scan`.

The reference tests its guidance stack by running three processes — the
`obstacle_sim_node` fake LiDAR (reference
catkin_ws/src/simulation/scripts/obstacle_sim_node.py), the
`nmpc_guidance_ca1` node, and an external autopilot — wired over TCPROS at
20 Hz (SURVEY.md section 4.2).  Here the same loop is a single compiled
device program: perception, mission management, the RTI solve and the
plant step compose functionally per tick, a whole mission is `lax.scan`,
and a fleet of missions is `vmap` of that.

The plant integrates the guidance kinematics (usv_guidance_ca1 dynamics,
T1 = 1 s heading response standing in for the inner loop / ASMC of the
2024 paper) with the commanded psi_e_d rate, and tracks the commanded
surge speed through a perfect speed loop (u <- u_d), which lets missions
actually stop at the final waypoint — the reference's kinematic model has
no surge dynamics at all (u_dot = 0, reference
scripts/usv_guidance_ca1/usv_model.py:117-128).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_collisionavoidance_tpu.guidance.controller import (
    Commands, GuidanceController, GuidanceState, Measurements)
from mpc_collisionavoidance_tpu.ops import integrators


class MissionLog(NamedTuple):
    pos: jnp.ndarray        # (T, 2) NED track
    psi: jnp.ndarray        # (T,)
    cmds: Commands          # per-tick command streams (leading T axis)
    final_state: GuidanceState


def run_mission(controller: GuidanceController,
                meas0: Measurements,
                waypoints, n_wp,
                obstacle_field, field_valid,
                n_steps: int = 1200,
                dtype=jnp.float32) -> MissionLog:
    """Run one mission end-to-end; jit/vmap-able as a whole."""
    spec = controller.spec
    plant_step = integrators.make_discrete_dynamics(
        spec.model.f, spec.dt, num_steps=4)

    waypoints = jnp.asarray(waypoints, dtype)
    obstacle_field = jnp.asarray(obstacle_field, dtype)
    field_valid = jnp.asarray(field_valid, bool)
    meas0 = Measurements(*[jnp.asarray(m, dtype) for m in meas0])
    state0 = controller.init_state(meas0, waypoints, n_wp, dtype=dtype)
    params0 = jnp.zeros((spec.model.np_,), dtype)  # dynamics ignore p

    def tick(carry, _):
        st, meas = carry
        st, cmds = controller.tick(st, meas, waypoints, n_wp,
                                   obstacle_field, field_valid)
        # honest plant: integrate the guidance kinematics one tick from the
        # controller-packed state with the commanded psi_e_d rate
        x_next = plant_step(cmds.x0, cmds.r_d[None], params0)
        meas_next = Measurements(
            u=cmds.u_d,                      # perfect inner speed loop
            v=x_next[1],
            nedx=x_next[5], nedy=x_next[6], psi=x_next[7])
        return (st, meas_next), (jnp.stack([meas.nedx, meas.nedy]),
                                 meas.psi, cmds)

    (stN, _), (pos, psi, cmds) = jax.lax.scan(
        tick, (state0, meas0), None, length=n_steps)
    return MissionLog(pos=pos, psi=psi, cmds=cmds, final_state=stN)


def min_obstacle_clearance(log: MissionLog, obstacle_field, field_valid):
    """Per-obstacle minimum center distance over the mission track."""
    field = jnp.asarray(obstacle_field)
    d = jnp.hypot(log.pos[:, None, 0] - field[None, :, 0],
                  log.pos[:, None, 1] - field[None, :, 1])   # (T, M)
    d = jnp.min(d, axis=0)
    return jnp.where(jnp.asarray(field_valid, bool), d, jnp.inf)
