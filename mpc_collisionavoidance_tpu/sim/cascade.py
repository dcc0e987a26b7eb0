"""Cascaded two-solver closed loop: guidance NMPC -> low-level NMPC -> hull.

The reference runs this as two ROS processes at different rates — the
guidance CA node at 20 Hz publishing /guidance/desired_{heading,speed} and
the low-level node at 100 Hz publishing thruster commands (SURVEY.md
section 3.5).  Here the whole cascade is ONE device program: an outer
`lax.scan` over 20 Hz guidance ticks whose body contains GUIDANCE_SUBTICKS
(=5) inner low-level ticks + plant integrations — rates are encoded in the
loop structure, not in wall clocks, and the entire cascade still vmaps
over a fleet.

The plant is the true 3-DOF hydrodynamic hull (SURVEY.md section 2.4
coefficients via models/hydro.py): state (psi, u, v, r, nedx, nedy),
inputs the commanded thrusts, integrated with RK4 at the 100 Hz step.
Thrusters are modeled as tracking the commanded setpoint within a tick,
matching the reference sim's treatment (the thrust-rate dynamics live
inside the low-level OCP model itself).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_collisionavoidance_tpu.guidance.controller import (
    GuidanceController, Measurements)
from mpc_collisionavoidance_tpu.guidance.low_level import (
    THRUST_C, LowLevelController, LowLevelMeasurements)
from mpc_collisionavoidance_tpu.models import hydro
from mpc_collisionavoidance_tpu.ops.integrators import rk4_step

GUIDANCE_SUBTICKS = 5   # 100 Hz inner loop / 20 Hz guidance loop


class HullState(NamedTuple):
    """True vehicle state for the cascaded sim."""
    psi: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    r: jnp.ndarray
    nedx: jnp.ndarray
    nedy: jnp.ndarray


def hull_dynamics(x, thrust, p):
    """(psi, u, v, r, nedx, nedy)' under thrusts (Tport, Tstbd), c = 0.78."""
    psi, u, v, r, _nx, _ny = x
    tu, tr = hydro.thrust_map(thrust[0], thrust[1], THRUST_C)
    du, dv, dr = hydro.uvr_dot(u, v, r, tu, tr)
    return jnp.stack([
        r, du, dv, dr,
        u * jnp.cos(psi) - v * jnp.sin(psi),
        u * jnp.sin(psi) + v * jnp.cos(psi),
    ])


class CascadeLog(NamedTuple):
    pos: jnp.ndarray       # (T, 2) at the guidance rate
    psi: jnp.ndarray       # (T,)
    u: jnp.ndarray         # (T,) surge speed
    psi_d: jnp.ndarray     # (T,) guidance heading command
    u_d: jnp.ndarray       # (T,)
    thrust: jnp.ndarray    # (T, 2) port/stbd at tick end
    ye: jnp.ndarray        # (T,)
    active: jnp.ndarray    # (T,)
    collision: jnp.ndarray # (T,)


def run_cascade(gctrl: GuidanceController,
                llctrl: LowLevelController,
                hull0: HullState,
                waypoints, n_wp,
                obstacle_field, field_valid,
                n_steps: int = 1200,
                ll_dt: float = 0.01,
                dtype=jnp.float32) -> CascadeLog:
    """Run the full cascade for `n_steps` guidance (20 Hz) ticks."""
    waypoints = jnp.asarray(waypoints, dtype)
    obstacle_field = jnp.asarray(obstacle_field, dtype)
    field_valid = jnp.asarray(field_valid, bool)
    hull0 = HullState(*[jnp.asarray(h, dtype) for h in hull0])

    def hull_meas(h: HullState) -> Measurements:
        return Measurements(u=h.u, v=h.v, nedx=h.nedx, nedy=h.nedy, psi=h.psi)

    gstate0 = gctrl.init_state(hull_meas(hull0), waypoints, n_wp, dtype=dtype)
    llstate0 = llctrl.init_state(
        LowLevelMeasurements(psi=hull0.psi, u=hull0.u, v=hull0.v, r=hull0.r),
        dtype=dtype)

    def guidance_tick(carry, _):
        gstate, llstate, h = carry
        gstate, gcmds = gctrl.tick(gstate, hull_meas(h), waypoints, n_wp,
                                   obstacle_field, field_valid)
        # inner 100 Hz loop: solve low-level, apply thrust, integrate hull
        def subtick(carry2, _):
            llstate, h = carry2
            llmeas = LowLevelMeasurements(psi=h.psi, u=h.u, v=h.v, r=h.r)
            llstate, tcmds = llctrl.tick(llstate, llmeas,
                                         gcmds.psi_d, gcmds.u_d)
            thrust = jnp.stack([tcmds.t_port, tcmds.t_stbd])
            xh = jnp.stack([h.psi, h.u, h.v, h.r, h.nedx, h.nedy])
            xh = rk4_step(hull_dynamics, xh, thrust, None, ll_dt)
            return (llstate, HullState(*xh)), thrust

        (llstate, h), thrusts = jax.lax.scan(
            subtick, (llstate, h), None, length=GUIDANCE_SUBTICKS)

        log = (jnp.stack([h.nedx, h.nedy]), h.psi, h.u,
               gcmds.psi_d, gcmds.u_d, thrusts[-1], gcmds.ye,
               gcmds.active, gcmds.collision)
        return (gstate, llstate, h), log

    _, logs = jax.lax.scan(guidance_tick, (gstate0, llstate0, hull0),
                           None, length=n_steps)
    return CascadeLog(*logs)
