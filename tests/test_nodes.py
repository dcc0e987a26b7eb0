"""Node-level closed-loop tests for the full-model controllers
(reference nodes N6 `acados_mpc`, N8 `nmpc_pf`, N15 `nmpc_guidance_ca`):
each composed controller must drive an independently integrated
hydrodynamic plant through its mission."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.guidance.nodes import (
    PFController, PFMeasurements, ThrustMPCController, ThrustMeasurements)
from mpc_collisionavoidance_tpu.guidance.variants import (
    VariantGuidanceController, VariantMeasurements)
from mpc_collisionavoidance_tpu.models import hydro
from mpc_collisionavoidance_tpu.ops.integrators import rk4_step


def _vehicle_tick(veh, t_port, t_stbd, c, dt):
    """Honest 6-state plant (psi, u, v, r, nedx, nedy): the commanded
    thrusts drive the shared 3-DOF EOM — independent of the solver's own
    prediction, unlike the reference sims' solver-as-plant idiom."""

    def f(s, thr, _p):
        psi, u, v, r = s[0], s[1], s[2], s[3]
        tu, tr = hydro.thrust_map(thr[0], thr[1], c)
        ud, vd, rd = hydro.uvr_dot(u, v, r, tu, tr)
        return jnp.stack([r, ud, vd, rd,
                          u * jnp.cos(psi) - v * jnp.sin(psi),
                          u * jnp.sin(psi) + v * jnp.cos(psi)])

    return rk4_step(f, veh, jnp.stack([t_port, t_stbd]), None, dt)


def test_pf_node_tracks_straight_mission():
    """The pf node (full 14-state model driving thrusters directly) must
    pull a laterally offset vehicle onto an eastward path and cruise at
    ~0.7 m/s (reference nmpc_pf.cpp:241-250)."""
    wps = jnp.asarray(np.array([[0.0, 0.0], [40.0, 0.0]]), jnp.float64)
    ctrl = PFController(ipm_iters=10, N=40, Tf=0.4)
    veh0 = jnp.asarray([0.0, 0.001, 0.0, 0.0, 0.0, 1.5], jnp.float64)

    def meas_of(veh):
        return PFMeasurements(u=veh[1], v=veh[2], r=veh[3],
                              nedx=veh[4], nedy=veh[5], psi=veh[0])

    st = ctrl.init_state(meas_of(veh0), wps, 2, dtype=jnp.float64)

    def tick(carry, _):
        st, veh = carry
        st, cmds = ctrl.tick(st, meas_of(veh), wps, 2)
        veh = _vehicle_tick(veh, cmds.t_port, cmds.t_stbd, c=1.0, dt=0.01)
        return (st, veh), (cmds.ye, veh[1], cmds.t_port, cmds.t_stbd,
                           cmds.solver_status)

    (_, vehN), (yes, us, tps, tss, status) = jax.jit(
        lambda c: jax.lax.scan(tick, c, None, length=1200))((st, veh0))
    yes, us = np.asarray(yes), np.asarray(us)
    assert np.all(np.isfinite(yes))
    assert abs(float(yes[-1])) < 0.3, yes[-1]
    assert 0.4 < float(us[-1]) < 1.0, us[-1]
    # thrust bounds respected (model lbx/ubx on Tport/Tstbd)
    assert np.all(np.asarray(tps) <= 36.6) and np.all(np.asarray(tps) >= -30.1)
    assert not np.any(np.asarray(status) == 2)


def test_pf_node_zero_thrust_when_mission_done():
    """Once the final waypoint is captured the node publishes zero thrust
    and zero desired speed (reference nmpc_pf.cpp:259-267)."""
    wps = jnp.asarray(np.array([[0.0, 0.0], [0.8, 0.0]]), jnp.float64)
    ctrl = PFController(ipm_iters=6, N=20, Tf=0.2)
    veh = jnp.asarray([0.0, 0.001, 0.0, 0.0, 0.0, 0.0], jnp.float64)
    meas = PFMeasurements(u=veh[1], v=veh[2], r=veh[3],
                          nedx=veh[4], nedy=veh[5], psi=veh[0])
    st = ctrl.init_state(meas, wps, 2, dtype=jnp.float64)
    # vehicle already within the 1 m capture radius of the final waypoint
    st, cmds = jax.jit(ctrl.tick)(st, meas, wps, 2)
    assert not bool(cmds.active)
    assert float(cmds.t_port) == 0.0 and float(cmds.t_stbd) == 0.0
    assert float(cmds.u_d) == 0.0


def test_thrust_mpc_reaches_cruise_speed():
    """The acados_mpc node tracks u_des = 1.0 m/s with carried thrust
    memory (reference acados_mpc.cpp:127,158-212)."""
    ctrl = ThrustMPCController(ipm_iters=8)   # reference N=20, Tf=1
    veh0 = jnp.asarray([0.0, 0.001, 0.0, 0.0, 0.0, 0.0], jnp.float64)

    def meas_of(veh):
        return ThrustMeasurements(u=veh[1], v=veh[2], r=veh[3])

    st = ctrl.init_state(meas_of(veh0), dtype=jnp.float64)

    def tick(carry, _):
        st, veh = carry
        st, cmds = ctrl.tick(st, meas_of(veh))
        veh = _vehicle_tick(veh, cmds.t_port, cmds.t_stbd, c=0.78, dt=0.05)
        return (st, veh), (veh[1], cmds.solver_status, st.past_t_port)

    (_, vehN), (us, status, mem) = jax.jit(
        lambda c: jax.lax.scan(tick, c, None, length=300))((st, veh0))
    us = np.asarray(us)
    # the closed-loop equilibrium against the honest plant sits near (not
    # exactly at) u_des: the thrust-state weights trade off against the
    # speed error and the reference commits no number to match
    assert abs(float(us[-1]) - 1.0) < 0.1, us[-1]
    assert float(np.std(us[-50:])) < 0.01, "speed not settled"
    assert not np.any(np.asarray(status) == 2)
    # thrust memory is live (nonzero once accelerating)
    assert float(np.max(np.abs(np.asarray(mem)))) > 0.1


def test_guidance_ca_variant_tracks_straight_mission():
    """The first CA guidance node (N15) via the variants table: stage-2
    heading read + far-default obstacle params (see variants.py
    docstring)."""
    wps = np.array([[0.0, -5.0], [0.0, 25.0]])
    ctrl = VariantGuidanceController("usv_guidance_ca", Tf=5.0, N=30,
                                     ipm_iters=10)
    meas = VariantMeasurements(u=0.7, v=0.0, r=0.0, nedx=1.5, nedy=0.0,
                               psi=0.3)
    st = ctrl.init_state(meas, wps, 2, dtype=jnp.float64)

    def plant(meas, psi_d, u_d, dt=0.05, T1=0.5):
        err = jnp.mod(psi_d - meas.psi + jnp.pi, 2 * jnp.pi) - jnp.pi
        psi = meas.psi + dt * err / T1
        return VariantMeasurements(
            u=u_d, v=meas.v * 0.0, r=(psi - meas.psi) / dt,
            nedx=meas.nedx + dt * u_d * jnp.cos(psi),
            nedy=meas.nedy + dt * u_d * jnp.sin(psi),
            psi=psi)

    def tick(carry, _):
        st, meas = carry
        st, cmds = ctrl.tick(st, meas, jnp.asarray(wps, jnp.float64), 2)
        meas = plant(meas, cmds.psi_d, cmds.u_d)
        return (st, meas), (cmds.ye, meas.nedx, cmds.solver_status)

    (_, measN), (yes, xs, status) = jax.jit(
        lambda c: jax.lax.scan(tick, c, None, length=500))((st, meas))
    yes = np.asarray(yes)
    assert np.all(np.isfinite(yes))
    assert abs(float(yes[-1])) < 0.25, yes[-1]
    assert abs(float(np.asarray(xs)[-1])) < 0.3
    assert not np.any(np.asarray(status) == 2)
