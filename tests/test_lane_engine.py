"""Lane-batched engine vs the (oracle-validated) per-instance engine.

The per-instance RTI path is itself checked against scipy SLSQP and dense
KKT oracles (test_ipm.py / test_riccati.py); here the lane engine must
reproduce it to tight tolerance across a batch of perturbed instances,
for the flagship (soft constraints, nu=1) and a hard-constrained nu=2
hydrodynamic variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.solver.batch import (
    LaneRTISolver, from_lanes, to_lanes)
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver


def _batch_inputs(sc, B, nx, rng):
    x0s = np.broadcast_to(sc.x0, (B, nx)).copy()
    x0s[:, 2] += 0.2 * rng.standard_normal(B)
    params = np.broadcast_to(sc.params, (B, len(sc.params))).copy()
    lhs = np.broadcast_to(sc.lh, (B, len(sc.lh))).copy()
    return x0s, params, lhs


@pytest.mark.parametrize("steps", [1, 3])
def test_lane_matches_reference_engine_ca1(steps):
    B = 5
    spec = builders.usv_guidance_ca1(Tf=2.0, N=25)
    rng = np.random.default_rng(0)
    sc = scenarios.guidance_ca1_default()
    x0s, params, lhs = _batch_inputs(sc, B, 8, rng)

    # reference engine: vmapped per-instance
    ref = RTISolver(spec, ipm_iters=20)
    stR = jax.vmap(lambda x: ref.init_state(x, dtype=jnp.float64))(
        jnp.asarray(x0s))
    stepR = jax.vmap(ref.step_fn)
    # lane engine
    lane = LaneRTISolver(spec, ipm_iters=20)
    stL = lane.init_state(x0s, dtype=jnp.float64)

    xL = to_lanes(jnp.asarray(x0s, jnp.float64))
    pL = to_lanes(jnp.asarray(params, jnp.float64))
    lhL = to_lanes(jnp.asarray(lhs, jnp.float64))

    for _ in range(steps):
        stR, outR = stepR(stR, jnp.asarray(x0s), jnp.asarray(params),
                          jnp.asarray(lhs))
        stL, outL = lane.step_fn(stL, xL, pL, lhL)

    np.testing.assert_allclose(np.asarray(from_lanes(outL.u0)),
                               np.asarray(outR.u0), atol=2e-6)
    np.testing.assert_allclose(np.asarray(from_lanes(outL.x1)),
                               np.asarray(outR.x1), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(stL.xbar, (2, 1, 0))),  # -> (B, N+1, nx)
        np.asarray(stR.xbar), atol=5e-6)


@pytest.mark.slow
def test_lane_matches_reference_engine_pf_ca():
    """nu=2, hard h rows, state boxes — exercises every constraint family."""
    B = 4
    spec = builders.usv_pf_ca(Tf=1.0, N=15)
    rng = np.random.default_rng(1)
    sc = scenarios.pf_ca_default()
    x0s = np.broadcast_to(sc.x0, (B, 14)).copy()
    x0s[:, 6] += 0.1 * rng.standard_normal(B)   # perturb ye
    params = np.broadcast_to(sc.params, (B, 8)).copy()
    lhs = np.broadcast_to(sc.lh, (B, 4)).copy()

    ref = RTISolver(spec, ipm_iters=25)
    stR = jax.vmap(lambda x: ref.init_state(x, dtype=jnp.float64))(
        jnp.asarray(x0s))
    stR, outR = jax.vmap(ref.step_fn)(stR, jnp.asarray(x0s),
                                      jnp.asarray(params), jnp.asarray(lhs))

    lane = LaneRTISolver(spec, ipm_iters=25)
    stL = lane.init_state(x0s, dtype=jnp.float64)
    stL, outL = lane.step_fn(stL, to_lanes(jnp.asarray(x0s, jnp.float64)),
                             to_lanes(jnp.asarray(params, jnp.float64)),
                             to_lanes(jnp.asarray(lhs, jnp.float64)))

    np.testing.assert_allclose(np.asarray(from_lanes(outL.u0)),
                               np.asarray(outR.u0), atol=5e-6)
    np.testing.assert_allclose(np.asarray(from_lanes(outL.x1)),
                               np.asarray(outR.x1), atol=5e-6)


@pytest.mark.slow
def test_lane_runtime_yref_matches_reference_engine():
    """Runtime stage references through the lane engine: shared (ny,) and
    per-lane (ny, L) yref/yref_e must reproduce the per-instance engine
    fed the equivalent (N, ny) references (the pf family pushes yref every
    tick, reference scripts/usv_pf_ca/main.py:113-133)."""
    B = 4
    spec = builders.usv_pf_ca(Tf=1.0, N=15)
    rng = np.random.default_rng(2)
    sc = scenarios.pf_ca_default()
    x0s = np.broadcast_to(sc.x0, (B, 14)).copy()
    x0s[:, 6] += 0.1 * rng.standard_normal(B)
    params = np.broadcast_to(sc.params, (B, 8)).copy()
    lhs = np.broadcast_to(sc.lh, (B, 4)).copy()
    ny = spec.cost.ny

    # per-lane references: each instance tracks a different surge speed
    yref_b = np.broadcast_to(sc.yref, (B, ny)).copy()
    yref_b[:, 3] = 0.5 + 0.1 * np.arange(B)
    yref_e_b = yref_b[:, :14].copy()

    ref = RTISolver(spec, ipm_iters=25)
    stR = jax.vmap(lambda x: ref.init_state(x, dtype=jnp.float64))(
        jnp.asarray(x0s))
    stR, outR = jax.vmap(
        lambda st, x, p, lh, yr, yre: ref.step_fn(
            st, x, p, lh,
            yref=jnp.tile(yr, (spec.N, 1)), yref_e=yre))(
        stR, jnp.asarray(x0s), jnp.asarray(params), jnp.asarray(lhs),
        jnp.asarray(yref_b), jnp.asarray(yref_e_b))

    lane = LaneRTISolver(spec, ipm_iters=25)
    stL = lane.init_state(x0s, dtype=jnp.float64)
    stL, outL = lane.step_fn(
        stL, to_lanes(jnp.asarray(x0s, jnp.float64)),
        to_lanes(jnp.asarray(params, jnp.float64)),
        to_lanes(jnp.asarray(lhs, jnp.float64)),
        yref=to_lanes(jnp.asarray(yref_b, jnp.float64)),
        yref_e=to_lanes(jnp.asarray(yref_e_b, jnp.float64)))
    np.testing.assert_allclose(np.asarray(from_lanes(outL.u0)),
                               np.asarray(outR.u0), atol=5e-6)

    # shared (ny,) reference — same value in every lane
    yref_s = np.asarray(sc.yref)
    stR2 = jax.vmap(lambda x: ref.init_state(x, dtype=jnp.float64))(
        jnp.asarray(x0s))
    stR2, outR2 = jax.vmap(
        lambda st, x, p, lh: ref.step_fn(
            st, x, p, lh,
            yref=jnp.tile(jnp.asarray(yref_s), (spec.N, 1)),
            yref_e=jnp.asarray(yref_s[:14])))(
        stR2, jnp.asarray(x0s), jnp.asarray(params), jnp.asarray(lhs))
    stL2 = lane.init_state(x0s, dtype=jnp.float64)
    stL2, outL2 = lane.step_fn(
        stL2, to_lanes(jnp.asarray(x0s, jnp.float64)),
        to_lanes(jnp.asarray(params, jnp.float64)),
        to_lanes(jnp.asarray(lhs, jnp.float64)),
        yref=jnp.asarray(yref_s), yref_e=jnp.asarray(yref_s[:14]))
    np.testing.assert_allclose(np.asarray(from_lanes(outL2.u0)),
                               np.asarray(outR2.u0), atol=5e-6)


def test_lane_closed_loop_flagship():
    """Lane engine runs the flagship scenario closed-loop (solver-as-plant)
    and avoids the obstacles, mirroring test_sqp_rti's check."""
    spec = builders.usv_guidance_ca1()
    lane = LaneRTISolver(spec, ipm_iters=15)
    sc = scenarios.guidance_ca1_default()
    B = 3
    x0s = np.broadcast_to(sc.x0, (B, 8)).copy()
    params = np.broadcast_to(sc.params, (B, 16))
    lhs = np.broadcast_to(sc.lh, (B, 8))

    st = lane.init_state(x0s, dtype=jnp.float64)
    xL = to_lanes(jnp.asarray(x0s, jnp.float64))
    pL = to_lanes(jnp.asarray(params, jnp.float64))
    lhL = to_lanes(jnp.asarray(lhs, jnp.float64))

    def tick(carry, _):
        st, x = carry
        st, out = lane.step_fn(st, x, pL, lhL)
        return (st, out.x1), out.x1

    (_, _), xs = jax.lax.scan(tick, (st, xL), None, length=1000)
    xs = np.asarray(xs)  # (steps, nx, L)
    assert np.all(np.isfinite(xs))
    assert abs(xs[-1, 2, 0]) < 0.15
    pos = xs[:, 5:7, 0]
    for i in range(4):
        ox, oy = sc.params[2 * i], sc.params[2 * i + 1]
        dmin = np.min(np.hypot(pos[:, 0] - ox, pos[:, 1] - oy))
        assert dmin > 1.3 - 1e-3, (i, dmin)


@pytest.mark.slow
@pytest.mark.parametrize("steps", [1, 3])
def test_lane_matches_reference_engine_race_cars_dev(steps):
    """race_cars_dev: soft state-box rows (idxsbx) + quadratic slack
    weights + all-soft h — the lane engine's soft-bx path must reproduce
    the oracle-validated per-instance engine (test_soft_box.py)."""
    B = 4
    spec = builders.race_cars_dev(Tf=0.4, N=10)
    rng = np.random.default_rng(7)
    x0s = np.broadcast_to(spec.model.x0, (B, 6)).copy()
    x0s[:, 3] = 0.5 + 0.1 * rng.standard_normal(B)   # rolling speeds
    x0s[:, 1] = 0.05 * rng.standard_normal(B)        # lateral offsets
    params = np.zeros((B, 0))

    ref = RTISolver(spec, ipm_iters=25)
    stR = jax.vmap(lambda x: ref.init_state(x, dtype=jnp.float64))(
        jnp.asarray(x0s))
    lane = LaneRTISolver(spec, ipm_iters=25)
    stL = lane.init_state(x0s, dtype=jnp.float64)
    xL = to_lanes(jnp.asarray(x0s, jnp.float64))
    pL = to_lanes(jnp.asarray(params, jnp.float64))

    for _ in range(steps):
        stR, outR = jax.vmap(ref.step_fn, in_axes=(0, 0, 0, None))(
            stR, jnp.asarray(x0s), jnp.asarray(params), None)
        stL, outL = lane.step_fn(stL, xL, pL, None)

    np.testing.assert_allclose(np.asarray(from_lanes(outL.u0)),
                               np.asarray(outR.u0), atol=5e-6)
    np.testing.assert_allclose(np.asarray(from_lanes(outL.x1)),
                               np.asarray(outR.x1), atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(stL.xbar, (2, 1, 0))),
        np.asarray(stR.xbar), atol=1e-5)


@pytest.mark.parametrize("condense", [1, 2])
def test_lane_prepare_feedback_split_exact(condense):
    """prepare_fn + feedback_fn compose to EXACTLY step_fn on the lane
    engine (the measurement enters only through dx0; VERDICT r3 item 4:
    the RTI split must not be vmap-engine-only)."""
    spec = builders.usv_guidance_ca1(Tf=1.0, N=10)
    sc = scenarios.guidance_ca1_default()
    rng = np.random.default_rng(3)
    B = 6
    x0s, params, lhs = _batch_inputs(sc, B, 8, rng)
    solver = LaneRTISolver(spec, ipm_iters=8, condense=condense)
    xL = to_lanes(jnp.asarray(x0s, jnp.float64))
    pL = to_lanes(jnp.asarray(params, jnp.float64))
    lhL = to_lanes(jnp.asarray(lhs, jnp.float64))
    st0 = solver.init_state(x0s, dtype=jnp.float64)

    # a couple of warm ticks so the split is tested off a non-trivial state
    st, out = solver.step_fn(st0, xL, pL, lhL)
    st, out = solver.step_fn(st, out.x1, pL, lhL)
    x_meas = out.x1 + 0.01  # fresh measurement != predicted state

    st_ref, out_ref = solver.step_fn(st, x_meas, pL, lhL)
    qp = solver.prepare_fn(st, pL, lhL)
    st_split, out_split = solver.feedback_fn(st, qp, x_meas)

    np.testing.assert_allclose(np.asarray(out_split.u0),
                               np.asarray(out_ref.u0), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_split.xbar),
                               np.asarray(st_ref.xbar), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_split.ubar),
                               np.asarray(st_ref.ubar), rtol=0, atol=1e-12)
