"""Parity package: converged SQP vs the dense NLP oracle, KKT reporting.

This is the library-level home of the BASELINE.md parity criterion:
control-trajectory deviation < 1e-3 against an independent solve of the
same OCP.
"""

import jax.numpy as jnp
import pytest
import numpy as np

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.parity import kkt_report, solve_ocp_nlp_dense
from mpc_collisionavoidance_tpu.parity.acados_oracle import acados_available
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver


def test_flagship_matches_dense_nlp_oracle():
    """Converged SQP vs SLSQP on the flagship OCP (soft constraints active:
    the obstacle at (4,4) cuts the path)."""
    spec = builders.usv_guidance_ca1(Tf=1.0, N=10)
    sc = scenarios.guidance_ca1_default()
    solver = RTISolver(spec, ipm_iters=30)
    st = solver.init_state(sc.x0, dtype=jnp.float64)
    st, out = solver.solve_converged(st, jnp.asarray(sc.x0),
                                     jnp.asarray(sc.params),
                                     jnp.asarray(sc.lh), sqp_iters=50)

    oracle = solve_ocp_nlp_dense(spec, sc.x0, sc.params, sc.lh,
                                 x_init=np.asarray(out.xtraj),
                                 u_init=np.asarray(out.utraj))
    assert oracle.success, oracle.message
    du = np.max(np.abs(np.asarray(out.utraj) - oracle.utraj))
    dx = np.max(np.abs(np.asarray(out.xtraj) - oracle.xtraj))
    assert du < 1e-3, du          # BASELINE.md parity criterion
    assert dx < 1e-3, dx
    # objective agreement too (same OCP, same optimum)
    assert np.isfinite(oracle.objective)


def test_oracle_from_cold_start_agrees():
    """Oracle started from the trivial initialization must find the same
    optimum (guards against the warm-started comparison being circular)."""
    spec = builders.usv_guidance_ca1(Tf=1.0, N=8)
    sc = scenarios.guidance_ca1_default()
    warm = solve_ocp_nlp_dense(spec, sc.x0, sc.params, sc.lh)
    assert warm.success, warm.message
    solver = RTISolver(spec, ipm_iters=30)
    st = solver.init_state(sc.x0, dtype=jnp.float64)
    _, out = solver.solve_converged(st, jnp.asarray(sc.x0),
                                    jnp.asarray(sc.params),
                                    jnp.asarray(sc.lh), sqp_iters=50)
    du = np.max(np.abs(np.asarray(out.utraj) - warm.utraj))
    assert du < 1e-3, du


def test_kkt_report_flags_converged_and_violating():
    spec = builders.usv_guidance_ca1(Tf=1.0, N=15)
    sc = scenarios.guidance_ca1_default()
    solver = RTISolver(spec, ipm_iters=25)
    st = solver.init_state(sc.x0, dtype=jnp.float64)
    st, out = solver.solve_converged(st, jnp.asarray(sc.x0),
                                     jnp.asarray(sc.params),
                                     jnp.asarray(sc.lh), sqp_iters=40)
    rep = kkt_report(solver, st, sc.x0, sc.params, sc.lh)
    assert rep.ok(tol=1e-6, band_tol=1e-5), rep

    # a fresh (unconverged) iterate must NOT report ok
    st0 = solver.init_state(sc.x0, dtype=jnp.float64)
    rep0 = kkt_report(solver, st0, sc.x0, sc.params, sc.lh)
    assert not rep0.ok(), rep0
    assert rep0.rti_step_norm > 1e-3


def test_acados_bridge_gates_cleanly():
    """The zero-egress image has no acados; the bridge must say so rather
    than crash at import."""
    assert acados_available() is False


@pytest.mark.slow
def test_full_horizon_kkt_certificate_flagship():
    """N=100 (the TRUE reference horizon) correctness, certified
    independently of engine-vs-engine agreement: the converged float64
    SQP solution on the flagship scenario — including a mid-avoidance
    state where obstacle rows are ACTIVE — is an NLP-KKT point
    (dynamics-feasible shooting gap, in-bounds, within the soft band,
    and a fixed point of one further RTI step)."""
    spec = builders.usv_guidance_ca1()            # Tf=5, N=100
    solver = RTISolver(spec, ipm_iters=30, ipm_tol=1e-10)
    sc = scenarios.guidance_ca1_default()
    params, lh = jnp.asarray(sc.params), jnp.asarray(sc.lh)

    # start-of-mission state (4 m cross-track).  Full-step SQP CYCLES on
    # this cold start at N=100 (period-2, step norm 0.49 — see
    # solve_converged's step_alpha note); damping converges it.
    st = solver.init_state(sc.x0, dtype=jnp.float64)
    st, _ = solver.solve_converged(st, jnp.asarray(sc.x0), params, lh,
                                   sqp_iters=100, step_alpha=0.5)
    rep = kkt_report(solver, st, sc.x0, sc.params, sc.lh)
    assert rep.ok(tol=1e-6, band_tol=1e-6), rep

    # mid-avoidance: on the path line 5 m before the first buoy, where the
    # swerve is dynamically feasible and the optimal trajectory grazes the
    # constraint boundary (hmin ~ 1.535 vs lh = 1.5).  Starting closer
    # (e.g. 2 m) makes avoidance infeasible and the optimum legitimately
    # pays the LINEAR slack cost instead — a valid KKT point that this
    # feasibility-style certificate would flag.
    x_mid = np.array([0.7, 0.0, 0.0, 0.0, 0.0, 4.0, -1.0, np.pi / 2])
    st2 = solver.init_state(x_mid, dtype=jnp.float64)
    st2, _ = solver.solve_converged(st2, jnp.asarray(x_mid), params, lh,
                                    sqp_iters=100, step_alpha=0.5)
    rep2 = kkt_report(solver, st2, x_mid, sc.params, sc.lh)
    assert rep2.ok(tol=1e-6, band_tol=1e-6), rep2
    # the avoidance problem is genuinely active: the predicted trajectory
    # comes within 0.3 m of the lh = 1.5 boundary of a buoy
    hmin = np.min(np.asarray(jnp.stack([
        spec.model.h(x, jnp.asarray(sc.params, jnp.float64))
        for x in st2.xbar[:-1]]))[:, :4])
    assert hmin < 1.8, hmin


@pytest.mark.slow
def test_full_horizon_kkt_certificate_pf_ca():
    """Same full-horizon certificate for the 14-state hull with HARD
    constraint rows (usv_pf_ca at its true Tf=1, N=100)."""
    spec = builders.usv_pf_ca()                   # Tf=1, N=100
    solver = RTISolver(spec, ipm_iters=30, ipm_tol=1e-10)
    sc = scenarios.pf_ca_default()
    yref = jnp.tile(jnp.asarray(sc.yref, jnp.float64), (spec.N, 1))
    yref_e = jnp.asarray(sc.yref_e, jnp.float64)
    st = solver.init_state(sc.x0, dtype=jnp.float64)
    st, _ = solver.solve_converged(st, jnp.asarray(sc.x0),
                                   jnp.asarray(sc.params),
                                   jnp.asarray(sc.lh), sqp_iters=100,
                                   step_alpha=0.5, yref=yref, yref_e=yref_e)
    rep = kkt_report(solver, st, sc.x0, sc.params, sc.lh,
                     yref=yref, yref_e=yref_e)
    assert rep.ok(tol=1e-6, band_tol=1e-6), rep
