"""Soft state-box constraint tests (acados idxsbx/lsbx/usbx semantics).

The reference exercises soft state bounds only in the race-car dev variant
(reference scripts/race_cars/acados_settings_dev.py:32-85: nsbx=1 on the
track-width state, quadratic Zl=Zu=1 slack weights, all h rows softened).
Verified here at the QP level against the SLSQP dense oracle and at the
NLP level via converged SQP.
"""

import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.ops import linearize
from mpc_collisionavoidance_tpu.ops.ipm import ipm_solve
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver

from tests.test_ipm import qp_to_dense, solve_dense


def test_layout_partition():
    """race_cars_dev: the single state-box row moves from hard to soft."""
    base = builders.race_cars()
    dev = builders.race_cars_dev()

    lay_b = linearize.make_row_layout(base)
    lay_d = linearize.make_row_layout(dev)
    assert lay_b.E_x.shape == (1, 6) and lay_b.E_xs.shape == (0, 6)
    assert lay_d.E_x.shape == (0, 6) and lay_d.E_xs.shape == (1, 6)
    # the softened row selects state n (index 1, the track-width state)
    np.testing.assert_array_equal(lay_d.E_xs[0],
                                  np.eye(6)[1])
    np.testing.assert_array_equal(lay_d.lbx_s, [-12.0])
    np.testing.assert_array_equal(lay_d.ubx_s, [12.0])
    # all 5 h rows soft in dev, 2 in base
    assert lay_d.soft_h.size == 5 and lay_d.hard_h.size == 0
    assert lay_b.soft_h.size == 2 and lay_b.hard_h.size == 3


def test_soft_box_qp_matches_slsqp():
    """Build the dev QP at an iterate that violates the track bound and
    check the IPM solution against the SLSQP dense oracle."""
    spec = builders.race_cars_dev(Tf=0.2, N=5)
    layout = linearize.make_row_layout(spec)
    m = spec.model
    N = spec.N

    rng = np.random.default_rng(21)
    xbar = np.zeros((N + 1, m.nx))
    xbar[:, 3] = 1.0                        # rolling at v=1
    # far off-track: violates both the h track-width row (|n|<=0.12, soft)
    # and the ±12 state box (soft via idxsbx) beyond what one QP step can
    # recover, so the box slack must engage
    xbar[:, 1] = np.linspace(13.5, 14.6, N + 1)
    xbar += 0.01 * rng.standard_normal(xbar.shape)
    ubar = 0.1 * rng.standard_normal((N, m.nu))
    x0 = xbar[0]

    yref = jnp.broadcast_to(jnp.asarray(spec.cost.yref), (N, spec.cost.ny))
    qp = linearize.build_qp(spec, layout,
                            jnp.asarray(xbar), jnp.asarray(ubar),
                            jnp.asarray(x0), yref,
                            jnp.asarray(spec.cost.yref_e),
                            jnp.zeros((0,)), None)
    # 6 soft rows: 5 h + 1 box
    assert qp.Cx.shape == (N, 6, m.nx)

    sol = ipm_solve(qp, iters=30)
    assert int(sol.status) == 0, (float(sol.gap), float(sol.eq_res))

    # SLSQP stalls below ftol=1e-9 on this badly-scaled QP (objective ~235),
    # so the oracle is only good to ~2e-3 in du; the sharp check is that the
    # IPM point is feasible and at least as optimal as the oracle's.
    nz, obj, cons, split = qp_to_dense(qp)
    import scipy.optimize
    res = scipy.optimize.minimize(
        obj, np.zeros(nz), constraints=cons, method="SLSQP",
        options={"maxiter": 600, "ftol": 1e-9})
    assert res.success, res.message
    dx_d, du_d, _, _ = split(res.x)
    np.testing.assert_allclose(np.asarray(sol.dx), dx_d, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sol.du), du_d, atol=5e-3)
    z_ipm = np.concatenate([np.asarray(sol.dx).ravel(),
                            np.asarray(sol.du).ravel(),
                            np.asarray(sol.sl).ravel(),
                            np.asarray(sol.su).ravel()])
    assert obj(z_ipm) <= res.fun + 1e-6
    eq, ineq = cons[0]["fun"](z_ipm), cons[1]["fun"](z_ipm)
    assert np.abs(eq).max() < 1e-8
    assert ineq.min() > -1e-8

    # the box-soft slack must actually engage: the stage-1.. states start
    # beyond ubx=12, so upper slacks of the last soft row are positive
    assert float(jnp.max(sol.su[:, -1])) > 1e-3


def test_race_cars_dev_converged_sqp():
    """Converged SQP (the dev file's nlp_solver_type='SQP') from a state
    outside the track bound: the solver must pull n back inside the soft
    band instead of failing."""
    spec = builders.race_cars_dev(Tf=0.4, N=10)
    solver = RTISolver(spec, ipm_iters=20)
    x0 = np.array([-2.0, 12.4, 0.0, 1.0, 0.0, 0.0])   # n outside ubx=12
    st = solver.init_state(x0, dtype=jnp.float64)
    params = jnp.zeros((0,))

    st, out = solver.solve_converged(st, jnp.asarray(x0), params,
                                     sqp_iters=25)
    assert int(out.status) == 0
    n_traj = np.asarray(out.xtraj)[:, 1]
    # quadratic slack (Zl=Zu=1) makes violations expensive: beyond stage 0
    # (pinned) the trajectory must drive steadily back toward the band
    # (full re-entry needs more than this 0.4 s horizon allows — the
    # turn-rate path alpha <- C2*delta limits dn/dt)
    assert np.all(n_traj[3:] <= 12.4)
    assert n_traj[-1] <= 12.1
    assert n_traj[-1] < n_traj[2] - 0.2
    # controls respect the hard input box
    assert float(jnp.max(jnp.abs(out.utraj[:, 0]))) <= 10 + 1e-8
    assert float(jnp.max(jnp.abs(out.utraj[:, 1]))) <= 2 + 1e-8
