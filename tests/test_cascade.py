"""Cascaded control: low-level thrust NMPC + guidance NMPC + hydro hull.

The reference never closes this loop in software (guidance and low-level
run as separate ROS processes against the real boat); these tests are the
in-process equivalent of its field configuration (SURVEY.md section 3.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.guidance import GuidanceController
from mpc_collisionavoidance_tpu.guidance.low_level import (
    LowLevelController, LowLevelMeasurements)
from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim import cascade, scenarios


def test_low_level_tracks_speed_and_heading():
    """Standalone inner loop: hold psi_d = 0.4, u_d = 1.0 against the true
    hull; must converge and respect thrust bounds."""
    ll = LowLevelController(builders.usv_low_level(Tf=1.0, N=50),
                            ipm_iters=8)
    h = cascade.HullState(psi=0.0, u=0.001, v=0.0, r=0.0,
                          nedx=0.0, nedy=0.0)
    st = ll.init_state(LowLevelMeasurements(psi=h.psi, u=h.u, v=h.v, r=h.r),
                       dtype=jnp.float64)

    from mpc_collisionavoidance_tpu.ops.integrators import rk4_step

    def tick(carry, _):
        st, h = carry
        meas = LowLevelMeasurements(psi=h.psi, u=h.u, v=h.v, r=h.r)
        st, cmds = ll.tick(st, meas, 0.4, 1.0)
        xh = jnp.stack([h.psi, h.u, h.v, h.r, h.nedx, h.nedy])
        xh = rk4_step(cascade.hull_dynamics, xh,
                      jnp.stack([cmds.t_port, cmds.t_stbd]), None, 0.01)
        return (st, cascade.HullState(*xh)), (h.u, h.psi, cmds.t_port,
                                              cmds.t_stbd)

    (_, hN), (us, psis, tps, tss) = jax.jit(
        lambda c: jax.lax.scan(tick, c, None, length=600))((st, h))
    us, psis = np.asarray(us), np.asarray(psis)
    assert np.all(np.isfinite(us))
    assert abs(float(us[-1]) - 1.0) < 0.05, float(us[-1])
    assert abs(float(psis[-1]) - 0.4) < 0.05, float(psis[-1])
    # thrust states live inside the solver's box bounds
    assert np.all(np.asarray(tps) <= 35.0 + 1e-6)
    assert np.all(np.asarray(tps) >= -30.0 - 1e-6)


def test_low_level_zero_speed_override():
    """u_d == 0 must hard-zero the published thrusts (reference
    nmpc_low_level.cpp:262-265) regardless of the solver's plan."""
    ll = LowLevelController(builders.usv_low_level(Tf=1.0, N=20),
                            ipm_iters=6)
    meas = LowLevelMeasurements(psi=0.3, u=1.2, v=0.05, r=0.1)
    st = ll.init_state(meas, dtype=jnp.float64)
    st, cmds = jax.jit(ll.tick)(st, meas, 0.0, 0.0)
    assert float(cmds.t_port) == 0.0 and float(cmds.t_stbd) == 0.0
    # but the command memory still carries the solver's stage-1 thrusts
    assert np.isfinite(float(st.past_t_port))


@pytest.mark.slow
def test_cascade_mission_challenge0():
    """Full two-solver cascade drives the hull through the challenge-0 buoy
    line: speeds up to ~0.7 m/s, tracks the path, avoids the buoys."""
    gctrl = GuidanceController(builders.usv_guidance_ca1(Tf=3.0, N=40),
                               ipm_iters=8)
    llctrl = LowLevelController(builders.usv_low_level(Tf=1.0, N=40),
                                ipm_iters=6)
    field, valid = scenarios.challenge0_field()
    wps = np.array([[4.0, -5.0], [4.0, 25.0]])
    hull0 = cascade.HullState(psi=0.0, u=0.001, v=0.0, r=0.0,
                              nedx=0.0, nedy=0.0)

    log = jax.jit(lambda h: cascade.run_cascade(
        gctrl, llctrl, h, wps, 2, field, valid, n_steps=900,
        dtype=jnp.float64))(hull0)
    pos = np.asarray(log.pos)
    assert np.all(np.isfinite(pos))
    # vehicle accelerates to cruise
    assert float(np.max(np.asarray(log.u))) > 0.6
    # makes real progress along the path (north) while avoiding buoys
    assert float(pos[-1, 1]) > 10.0, pos[-1]
    for (ox, oy, r), ok in zip(np.asarray(field), valid):
        if not ok:
            continue
        dmin = float(np.min(np.hypot(pos[:, 0] - ox, pos[:, 1] - oy)))
        # buoy r=1.0 + boat 0.5 inflated, minus 0.2 soft band and the
        # tracking slack of the true (non-kinematic) hull
        assert dmin > 1.1, (ox, oy, dmin)
    assert not np.any(np.asarray(log.collision))
