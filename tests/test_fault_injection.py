"""Fault injection: NaN quarantine is per-instance.

SURVEY.md section 5 (failure detection): the reference's only failure
handling is a logged nonzero acados status with the stale command left in
effect.  Here a poisoned instance must (a) be flagged status=2, and
(b) NOT contaminate the other instances of the same batched solve — the
fleet keeps flying when one vehicle's sensor emits garbage.
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


def _inputs(B):
    sc = scenarios.guidance_ca1_default()
    rng = np.random.default_rng(5)
    x0s = np.broadcast_to(sc.x0, (B, 8)).astype(np.float64).copy()
    x0s[:, 2] += 0.1 * rng.standard_normal(B)
    params = np.broadcast_to(sc.params, (B, 16)).astype(np.float64)
    lhs = np.broadcast_to(sc.lh, (B, 8)).astype(np.float64)
    return x0s, params, lhs


def test_lane_engine_nan_quarantine():
    B, bad = 8, 3
    spec = builders.usv_guidance_ca1(Tf=2.0, N=25)
    lane = LaneRTISolver(spec, ipm_iters=15)
    x0s, params, lhs = _inputs(B)

    clean_state = lane.init_state(x0s, dtype=jnp.float64)
    _, clean = lane.step_fn(clean_state, to_lanes(jnp.asarray(x0s)),
                            to_lanes(jnp.asarray(params)),
                            to_lanes(jnp.asarray(lhs)))

    x0s_bad = x0s.copy()
    x0s_bad[bad, 0] = np.nan                     # poisoned measurement
    state = lane.init_state(x0s, dtype=jnp.float64)
    _, out = lane.step_fn(state, to_lanes(jnp.asarray(x0s_bad)),
                          to_lanes(jnp.asarray(params)),
                          to_lanes(jnp.asarray(lhs)))

    status = np.asarray(out.status)
    assert status[bad] == 2, status
    ok = np.arange(B) != bad
    assert np.all(status[ok] != 2), status
    # healthy lanes are numerically IDENTICAL to the clean batch
    np.testing.assert_array_equal(
        np.asarray(from_lanes(out.u0))[ok],
        np.asarray(from_lanes(clean.u0))[ok])
    assert np.all(np.isfinite(np.asarray(from_lanes(out.u0))[ok]))


def test_vmap_engine_nan_quarantine():
    B, bad = 6, 0
    spec = builders.usv_guidance_ca1(Tf=2.0, N=25)
    solver = RTISolver(spec, ipm_iters=15)
    x0s, params, lhs = _inputs(B)
    x0s_bad = x0s.copy()
    x0s_bad[bad, 1] = np.nan

    states = jax.vmap(lambda x: solver.init_state(x, dtype=jnp.float64))(
        jnp.asarray(x0s))
    _, outs = jax.vmap(solver.step_fn)(states, jnp.asarray(x0s_bad),
                                       jnp.asarray(params),
                                       jnp.asarray(lhs))
    status = np.asarray(outs.status)
    assert status[bad] == 2
    assert np.all(status[np.arange(B) != bad] != 2)
    assert np.all(np.isfinite(np.asarray(outs.u0)[np.arange(B) != bad]))


@pytest.mark.slow
def test_dense_engine_nan_quarantine():
    """The dense (qpOASES-role) backend flags a NaN-poisoned problem with
    status 2 as well."""
    spec = builders.usv_guidance_ca1(Tf=1.0, N=10)
    solver = RTISolver(spec, ipm_iters=20, qp_backend="dense")
    sc = scenarios.guidance_ca1_default()
    x0 = np.asarray(sc.x0, np.float64).copy()
    st = solver.init_state(x0, dtype=jnp.float64)
    _, ok_out = solver.step_fn(st, jnp.asarray(x0),
                               jnp.asarray(sc.params), jnp.asarray(sc.lh))
    assert int(ok_out.status) in (0, 1)
    x0[4] = np.nan
    _, bad_out = solver.step_fn(st, jnp.asarray(x0),
                                jnp.asarray(sc.params), jnp.asarray(sc.lh))
    assert int(bad_out.status) == 2
