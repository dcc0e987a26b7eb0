"""SQP-RTI solver tests: NLP-KKT verification of the converged SQP fixed
point, RTI warm-start behavior, and the flagship closed loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.sim.closed_loop import run_closed_loop
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver


@pytest.fixture(scope="module")
def ca1_small():
    """Flagship OCP at a reduced horizon for fast converged-SQP oracle tests."""
    return builders.usv_guidance_ca1(Tf=1.0, N=20)


def test_rti_step_shapes_and_status(ca1_small):
    spec = ca1_small
    solver = RTISolver(spec)
    sc = scenarios.guidance_ca1_default()
    st = solver.init_state(sc.x0, dtype=jnp.float64)
    st, out = solver.step_fn(st, jnp.asarray(sc.x0), jnp.asarray(sc.params),
                             jnp.asarray(sc.lh))
    assert out.u0.shape == (1,)
    assert out.xtraj.shape == (spec.N + 1, 8)
    assert int(out.status) == 0
    # input bound respected
    assert float(jnp.max(jnp.abs(out.utraj))) <= 0.5 + 1e-7


def test_converged_sqp_satisfies_nlp_kkt(ca1_small):
    """At the SQP fixed point the nonlinear-dynamics residual must vanish and
    the QP step must go to zero — i.e. the iterate solves the NLP's KKT."""
    spec = ca1_small
    solver = RTISolver(spec, ipm_iters=25)
    sc = scenarios.guidance_ca1_default()
    st = solver.init_state(sc.x0, dtype=jnp.float64)
    params = jnp.asarray(sc.params)
    lh = jnp.asarray(sc.lh)

    st, out = solver.solve_converged(st, jnp.asarray(sc.x0), params, lh,
                                     sqp_iters=40)
    # nonlinear rollout feasibility of the converged trajectory
    from mpc_collisionavoidance_tpu.ops import integrators
    F = integrators.make_discrete_dynamics(spec.model.f, spec.dt)
    xt, ut = out.xtraj, out.utraj
    roll = jax.vmap(F, in_axes=(0, 0, None))(xt[:-1], ut, params)
    dyn_res = float(jnp.max(jnp.abs(roll - xt[1:])))
    assert dyn_res < 1e-8

    # taking one more RTI step changes nothing (fixed point)
    st2, out2 = solver.step_fn(st, jnp.asarray(sc.x0), params, lh)
    assert float(jnp.max(jnp.abs(out2.utraj - out.utraj))) < 1e-6

    # constraint satisfaction: all obstacle distances >= lh - 0.2 slack band
    d = jax.vmap(lambda x: spec.model.h(x, params))(xt[:-1])
    viol = jnp.asarray(sc.lh)[None, :] - d
    assert float(jnp.max(viol)) < 0.2 + 1e-6


def test_rti_warm_start_reduces_step(ca1_small):
    """Repeated RTI calls at the same x0 must contract toward the fixed point."""
    solver = RTISolver(ca1_small)
    sc = scenarios.guidance_ca1_default()
    st = solver.init_state(sc.x0, dtype=jnp.float64)
    params, lh = jnp.asarray(sc.params), jnp.asarray(sc.lh)
    x0 = jnp.asarray(sc.x0)

    st1, o1 = solver.step_fn(st, x0, params, lh)
    st2, o2 = solver.step_fn(st1, x0, params, lh)
    st3, o3 = solver.step_fn(st2, x0, params, lh)
    d12 = float(jnp.max(jnp.abs(o2.utraj - o1.utraj)))
    d23 = float(jnp.max(jnp.abs(o3.utraj - o2.utraj)))
    assert d23 < d12


def test_closed_loop_flagship_tracks_and_avoids():
    """The reference experiment (scripts/usv_guidance_ca1/main.py): from 4 m
    cross-track error, converge to the path and clear all four obstacles
    with at most the 0.2 m soft band of violation."""
    spec = builders.usv_guidance_ca1()        # Tf=5, N=100
    solver = RTISolver(spec, ipm_iters=15)
    sc = scenarios.guidance_ca1_default(n_steps=1000)

    run = jax.jit(lambda: run_closed_loop(
        solver, sc.x0, sc.params, sc.lh, n_steps=1000))
    res = run()

    simX = np.asarray(res.simX)
    assert np.all(np.isfinite(simX))
    # cross-track error converges after the transient
    assert abs(simX[-1, 2]) < 0.15, simX[-1]
    # obstacle clearance: min distance to each real obstacle >= 1.5 - 0.2
    pos = simX[:, 5:7]
    for i in range(4):
        ox, oy = sc.params[2 * i], sc.params[2 * i + 1]
        dmin = np.min(np.hypot(pos[:, 0] - ox, pos[:, 1] - oy))
        assert dmin > 1.5 - 0.2 - 1e-3, (i, dmin)
    # solver healthy nearly everywhere
    assert np.mean(np.asarray(res.status) == 0) > 0.95


def test_rti_prepare_feedback_split_exact():
    """prepare_fn + feedback_fn == step_fn exactly (the measured state
    enters only through the dx0 pinning residual), including when the
    fresh measurement differs from the predicted state — the acados
    RTI preparation/feedback schedule (SURVEY.md section 7 hard part 4)."""
    spec = builders.usv_guidance_ca1(Tf=2.0, N=25)
    solver = RTISolver(spec, ipm_iters=15)
    sc = scenarios.guidance_ca1_default()
    params = jnp.asarray(sc.params, jnp.float64)
    lh = jnp.asarray(sc.lh, jnp.float64)
    st = solver.init_state(jnp.asarray(sc.x0), dtype=jnp.float64)

    # a couple of warm-up ticks so xbar != x0 everywhere
    x = jnp.asarray(sc.x0, jnp.float64)
    for _ in range(2):
        st, out = solver.step_fn(st, x, params, lh)
        x = out.x1

    # fresh measurement deviates from the stage-1 prediction
    x_meas = x + 0.01 * jnp.arange(8, dtype=jnp.float64)

    st_j, out_j = solver.step_fn(st, x_meas, params, lh)
    qp = solver.prepare_fn(st, params, lh)
    st_s, out_s = solver.feedback_fn(st, qp, x_meas)

    np.testing.assert_array_equal(np.asarray(out_s.u0), np.asarray(out_j.u0))
    np.testing.assert_array_equal(np.asarray(out_s.xtraj),
                                  np.asarray(out_j.xtraj))
    np.testing.assert_array_equal(np.asarray(st_s.xbar),
                                  np.asarray(st_j.xbar))


def test_solve_converged_damped_output_matches_state(ca1_small):
    """With step_alpha != 1 the returned SolverOutput must describe the
    DAMPED iterate actually carried in the returned state, not the
    undamped trial step of the last iteration (they differ whenever the
    SQP has not fully converged)."""
    spec = ca1_small
    solver = RTISolver(spec, ipm_iters=15)
    sc = scenarios.guidance_ca1_default()
    st0 = solver.init_state(sc.x0, dtype=jnp.float64)
    params = jnp.asarray(sc.params, jnp.float64)
    lh = jnp.asarray(sc.lh, jnp.float64)

    # few iterations on purpose: far from the fixed point, where the
    # trial step and the damped iterate disagree materially
    st, out = solver.solve_converged(st0, jnp.asarray(sc.x0), params, lh,
                                     sqp_iters=3, step_alpha=0.5)
    np.testing.assert_array_equal(np.asarray(out.xtraj), np.asarray(st.xbar))
    np.testing.assert_array_equal(np.asarray(out.utraj), np.asarray(st.ubar))
    np.testing.assert_array_equal(np.asarray(out.u0), np.asarray(st.ubar[0]))
    np.testing.assert_array_equal(np.asarray(out.x1), np.asarray(st.xbar[1]))
