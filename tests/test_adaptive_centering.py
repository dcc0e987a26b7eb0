"""Adaptive (Mehrotra-style) centering correctness.

`centering="adaptive"` replaces the fixed sigma=0.1 barrier-reduction
schedule with a per-lane heuristic driven by the previous iteration's
fraction-to-boundary step (ops/ipm_lanes.py).  It is a *convergence-rate*
knob: the central-path fixed point is unchanged, so at sufficient
iterations both schedules must land on the same QP solution.  Measured on
TPU v5e it reaches the float32 gap floor in 8 IPM iterations instead of
10 at the flagship shape (docs/PERF.md); here we pin exactness and
convergence on the CPU f64 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.ops.ipm_lanes import ipm_solve_lanes
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.solver.batch import (
    LaneRTISolver, from_lanes, to_lanes)


def _flagship_qp(B=4, N=16, dtype=jnp.float64):
    spec = builders.usv_guidance_ca1(Tf=5.0 * N / 100, N=N)
    sc = scenarios.guidance_ca1_default()
    rng = np.random.default_rng(3)
    x0s = np.broadcast_to(sc.x0, (B, 8)).copy()
    x0s[:, 2] += 0.2 * rng.standard_normal(B)
    solver = LaneRTISolver(spec, ipm_iters=30)
    st = solver.init_state(x0s, dtype=dtype)
    xL = to_lanes(jnp.asarray(x0s, dtype))
    pL = to_lanes(jnp.asarray(
        np.broadcast_to(sc.params, (B, 16)), dtype))
    lhL = to_lanes(jnp.asarray(np.broadcast_to(sc.lh, (B, 8)), dtype))
    qp = solver._build_qp(st, xL, pL, lhL)
    return solver, qp


@pytest.mark.slow
def test_same_fixed_point_as_fixed_centering():
    """Both schedules follow the same central path to the same solution:
    at high iteration counts dx/du agree to oracle tolerance and every
    lane reports status 0."""
    solver, qp = _flagship_qp()
    solA = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=60,
                           tol=1e-10, centering="fixed")
    solB = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=60,
                           tol=1e-10, centering="adaptive")
    assert np.all(np.asarray(solA.status) == 0)
    assert np.all(np.asarray(solB.status) == 0)
    np.testing.assert_allclose(np.asarray(solB.du), np.asarray(solA.du),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(solB.dx), np.asarray(solA.dx),
                               atol=1e-7)


def test_adaptive_converges_no_slower():
    """On the flagship QP the adaptive schedule's duality gap at every
    iteration count in the production range is within a small factor of
    the fixed schedule's (it was measured strictly faster on TPU; here we
    only pin 'not worse than 10x' to keep the test hardware-agnostic)."""
    solver, qp = _flagship_qp()
    for iters in (8, 12, 20):
        gA = np.asarray(ipm_solve_lanes(qp, solver.idxbu, solver.idxbx,
                                        iters=iters,
                                        centering="fixed").gap)
        gB = np.asarray(ipm_solve_lanes(qp, solver.idxbu, solver.idxbx,
                                        iters=iters,
                                        centering="adaptive").gap)
        assert np.all(gB < np.maximum(10.0 * gA, 1e-12)), (iters, gA, gB)


def test_closed_loop_adaptive_lane_engine():
    """A warm-started closed loop on the adaptive engine stays finite,
    converged, and tracks the path like the fixed engine does."""
    N = 16
    spec = builders.usv_guidance_ca1(Tf=5.0 * N / 100, N=N)
    sc = scenarios.guidance_ca1_default()
    B = 3
    x0s = np.broadcast_to(sc.x0, (B, 8)).copy()
    pL = to_lanes(jnp.asarray(np.broadcast_to(sc.params, (B, 16)),
                              jnp.float64))
    lhL = to_lanes(jnp.asarray(np.broadcast_to(sc.lh, (B, 8)),
                               jnp.float64))

    def rollout(centering):
        solver = LaneRTISolver(spec, ipm_iters=12, centering=centering)
        st = solver.init_state(x0s, dtype=jnp.float64)
        xL = to_lanes(jnp.asarray(x0s, jnp.float64))

        def tick(carry, _):
            st, x = carry
            st, out = solver.step_fn(st, x, pL, lhL)
            return (st, out.x1), (out.x1, out.gap, out.status)

        (_, _), (xs, gaps, status) = jax.lax.scan(
            tick, (st, xL), None, length=400)
        return map(np.asarray, (xs, gaps, status))

    xs, gaps, status = rollout("adaptive")
    xsF, _, _ = rollout("fixed")
    assert np.all(np.isfinite(xs))
    assert np.all(status[-1] == 0)
    assert np.all(gaps[-1] < 1e-7)
    # same closed-loop trajectory as the fixed engine (both fully
    # converge every tick at 12 f64 iterations, so the controller is
    # schedule-independent)
    np.testing.assert_allclose(xs, xsF, atol=1e-4)


def test_bad_centering_rejected():
    spec = builders.usv_guidance_ca1(Tf=1.0, N=10)
    with pytest.raises(ValueError, match="centering"):
        LaneRTISolver(spec, centering="newton-probe")
    with pytest.raises(ValueError, match="fused"):
        LaneRTISolver(spec, centering="adaptive", riccati="fused")
    with pytest.raises(ValueError, match="fused"):
        LaneRTISolver(spec, centering="mehrotra", riccati="fused")


@pytest.mark.slow
def test_mehrotra_same_fixed_point():
    """The full predictor-corrector follows the same central path to the
    same solution as the fixed schedule (it changes sigma and adds the
    second-order correction, not the KKT fixed point)."""
    solver, qp = _flagship_qp()
    solA = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=60,
                           tol=1e-10, centering="fixed")
    solM = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=60,
                           tol=1e-10, centering="mehrotra")
    assert np.all(np.asarray(solM.status) == 0)
    np.testing.assert_allclose(np.asarray(solM.du), np.asarray(solA.du),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(solM.dx), np.asarray(solA.dx),
                               atol=1e-7)


def test_mehrotra_converges_faster_per_iteration():
    """The affine-probe schedule must reach the fixed schedule's 60-iter
    answer in far fewer iterations on this QP (the point of paying 2
    Riccati sweeps per iteration)."""
    solver, qp = _flagship_qp()
    gF = np.asarray(ipm_solve_lanes(qp, solver.idxbu, solver.idxbx,
                                    iters=12, centering="fixed").gap)
    gM = np.asarray(ipm_solve_lanes(qp, solver.idxbu, solver.idxbx,
                                    iters=12, centering="mehrotra").gap)
    assert np.all(gM < np.maximum(gF, 1e-12)), (gF, gM)


def test_mehrotra_per_instance_engine():
    """RTISolver(centering='mehrotra') (the ops/ipm.py path): one RTI tick
    agrees with the fixed engine at convergence-depth iteration counts."""
    from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver

    spec = builders.usv_guidance_ca1(Tf=1.0, N=12)
    sc = scenarios.guidance_ca1_default()
    x0 = jnp.asarray(sc.x0, jnp.float64)
    p = jnp.asarray(sc.params, jnp.float64)
    lh = jnp.asarray(sc.lh, jnp.float64)
    outs = {}
    for cent, iters in (("fixed", 60), ("mehrotra", 25)):
        s = RTISolver(spec, ipm_iters=iters, ipm_tol=1e-10, centering=cent)
        st = s.init_state(x0, dtype=jnp.float64)
        _, out = s.step_fn(st, x0, p, lh)
        assert int(out.status) == 0, cent
        outs[cent] = np.asarray(out.utraj)
    np.testing.assert_allclose(outs["mehrotra"], outs["fixed"], atol=1e-7)
