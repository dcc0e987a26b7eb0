"""Fleet mission engine: lane-solver missions must match the vmapped
per-instance missions and complete the challenge-0 course."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.guidance import GuidanceController, Measurements
from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim import mission, scenarios
from mpc_collisionavoidance_tpu.sim.fleet import FleetMissionEngine


def _fleet_inputs(B):
    field, valid = scenarios.challenge0_field()
    wps = np.broadcast_to(np.array([[4.0, -5.0], [4.0, 25.0]]), (B, 2, 2))
    n_wp = np.full((B,), 2)
    meas0 = Measurements(
        u=jnp.full((B,), 0.7), v=jnp.zeros(B),
        nedx=jnp.linspace(-0.5, 0.5, B), nedy=jnp.zeros(B),
        psi=jnp.zeros(B))
    return field, valid, wps, n_wp, meas0


def test_fleet_matches_vmapped_missions():
    """Same mission, same tick count: the lane-engine fleet must agree with
    the oracle-validated vmapped per-instance mission engine."""
    B, T = 3, 120
    spec = builders.usv_guidance_ca1(Tf=2.0, N=25)
    field, valid, wps, n_wp, meas0 = _fleet_inputs(B)

    fleet = FleetMissionEngine(spec, ipm_iters=12)
    logF = jax.jit(lambda m: fleet.run(m, wps, n_wp, field, valid,
                                       n_steps=T, dtype=jnp.float64))(meas0)

    ctrl = GuidanceController(spec, ipm_iters=12)
    runV = jax.vmap(lambda m: mission.run_mission(
        ctrl, m, wps[0], 2, field, valid, n_steps=T, dtype=jnp.float64))
    logV = jax.jit(runV)(meas0)

    # (T, B, 2) vs (B, T, 2)
    np.testing.assert_allclose(np.asarray(logF.pos),
                               np.asarray(logV.pos).transpose(1, 0, 2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(logF.ye),
                               np.asarray(logV.cmds.ye).T, atol=1e-6)


def test_fleet_completes_challenge0():
    B = 4
    spec = builders.usv_guidance_ca1(Tf=3.0, N=40)
    field, valid, wps, n_wp, meas0 = _fleet_inputs(B)
    fleet = FleetMissionEngine(spec, ipm_iters=10)
    log = jax.jit(lambda m: fleet.run(m, wps, n_wp, field, valid,
                                      n_steps=1200))(meas0)
    pos = np.asarray(log.pos)           # (T, B, 2)
    active = np.asarray(log.active)
    assert np.all(np.isfinite(pos))
    # every vehicle finishes near the last waypoint
    assert not np.any(active[-1]), active[-1]
    for b in range(B):
        end = pos[np.argmax(~active[:, b]), b]
        assert np.hypot(end[0] - 4.0, end[1] - 25.0) < 1.3, (b, end)
    # no vehicle enters a buoy
    assert not np.any(np.asarray(log.collision))


def test_fleet_heterogeneous_waypoints():
    """Each vehicle can fly a different course."""
    B = 2
    spec = builders.usv_guidance_ca1(Tf=2.0, N=20)
    field, valid = scenarios.challenge0_field()
    valid = np.zeros_like(valid)        # no obstacles: pure tracking
    wps = np.zeros((B, 2, 2))
    wps[0] = [[0.0, -5.0], [0.0, 25.0]]     # north path at x=0
    wps[1] = [[-5.0, 0.0], [25.0, 0.0]]     # east path at y=0
    meas0 = Measurements(u=jnp.full((B,), 0.7), v=jnp.zeros(B),
                         nedx=jnp.zeros(B), nedy=jnp.zeros(B),
                         psi=jnp.zeros(B))
    fleet = FleetMissionEngine(spec, ipm_iters=10)
    log = jax.jit(lambda m: fleet.run(m, wps, np.full((B,), 2), field,
                                      valid, n_steps=400))(meas0)
    pos = np.asarray(log.pos)
    # vehicle 0 heads north (y grows), vehicle 1 east (x grows)
    assert pos[-1, 0, 1] > 8.0, pos[-1, 0]
    assert pos[-1, 1, 0] > 8.0, pos[-1, 1]
