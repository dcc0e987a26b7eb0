"""Non-CA guidance variant controllers (reference nodes N10-N14): each
variant closes the loop against the ca1 kinematic plant via its own
command convention and must track a straight mission."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.guidance.variants import (
    VariantGuidanceController, VariantMeasurements)

WPS = np.array([[0.0, -5.0], [0.0, 25.0]])   # straight north path at x=0


def _plant_tick(meas: VariantMeasurements, psi_d, u_d, dt=0.05, T1=0.5):
    """Simple vehicle: first-order heading response + kinematics (the role
    the low-level controller/ASMC plays under these guidance nodes)."""
    psi = meas.psi + dt * (wrapd(psi_d - meas.psi)) / T1
    u = u_d
    return VariantMeasurements(
        u=u, v=meas.v * 0.0, r=(psi - meas.psi) / dt,
        nedx=meas.nedx + dt * u * jnp.cos(psi),
        nedy=meas.nedy + dt * u * jnp.sin(psi),
        psi=psi)


def wrapd(a):
    return jnp.mod(a + jnp.pi, 2 * jnp.pi) - jnp.pi


def _rate_plant_tick(meas: VariantMeasurements, r_d, u_d, dt=0.05, T1=0.3):
    """Rate-commanded vehicle for the r_d-only variant (guidance3)."""
    r = meas.r + dt * (r_d - meas.r) / T1
    psi = meas.psi + dt * r
    return VariantMeasurements(
        u=u_d, v=meas.v * 0.0, r=r,
        nedx=meas.nedx + dt * u_d * jnp.cos(psi),
        nedy=meas.nedy + dt * u_d * jnp.sin(psi),
        psi=psi)


HEADING_VARIANTS = ["usv_guidance", "usv_guidance2", "usv_guidance4",
                    "usv_guidance5"]


@pytest.mark.parametrize("name", HEADING_VARIANTS)
def test_variant_tracks_straight_mission(name):
    ctrl = VariantGuidanceController(name, Tf=1.0, N=30, ipm_iters=10)
    meas = VariantMeasurements(u=0.7, v=0.0, r=0.0, nedx=1.5, nedy=0.0,
                               psi=0.3)   # 1.5 m off-path, heading off
    st = ctrl.init_state(meas, WPS, 2, dtype=jnp.float64)

    def tick(carry, _):
        st, meas = carry
        st, cmds = ctrl.tick(st, meas, jnp.asarray(WPS, jnp.float64), 2)
        meas = _plant_tick(meas, cmds.psi_d, cmds.u_d)
        return (st, meas), (cmds.ye, meas.nedx, cmds.solver_status)

    (_, measN), (yes, xs, status) = jax.jit(
        lambda c: jax.lax.scan(tick, c, None, length=500))((st, meas))
    yes = np.asarray(yes)
    assert np.all(np.isfinite(yes)), name
    # converged onto the path: |ye| small at the end
    assert abs(float(yes[-1])) < 0.25, (name, yes[-1])
    assert abs(float(np.asarray(xs)[-1])) < 0.3, name
    assert not np.any(np.asarray(status) == 2), name


def test_guidance3_rate_only_variant():
    """guidance3 publishes only r_d; close the loop through a rate plant."""
    ctrl = VariantGuidanceController("usv_guidance3", Tf=1.0, N=30,
                                     ipm_iters=10)
    meas = VariantMeasurements(u=0.7, v=0.0, r=0.0, nedx=1.5, nedy=0.0,
                               psi=0.3)
    st = ctrl.init_state(meas, WPS, 2, dtype=jnp.float64)

    def tick(carry, _):
        st, meas = carry
        st, cmds = ctrl.tick(st, meas, jnp.asarray(WPS, jnp.float64), 2)
        meas = _rate_plant_tick(meas, cmds.r_d, cmds.u_d)
        return (st, meas), cmds.ye

    (_, _), yes = jax.jit(
        lambda c: jax.lax.scan(tick, c, None, length=600))((st, meas))
    yes = np.asarray(yes)
    assert np.all(np.isfinite(yes))
    assert abs(float(yes[-1])) < 0.3, yes[-1]


def test_variant_table_rejects_ca_models():
    with pytest.raises(ValueError, match="not a plain guidance variant"):
        VariantGuidanceController("usv_guidance_ca1")
