"""Parity package: converged SQP vs the dense NLP oracle, KKT reporting.

This is the library-level home of the BASELINE.md parity criterion:
control-trajectory deviation < 1e-3 against an independent solve of the
same OCP.
"""

import jax.numpy as jnp
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
