"""Property sweeps: randomized problems against engine-independence and
NLP-KKT invariants (no external oracle needed — two independent QP engines
plus the direct KKT verifier take its place, so the sweep can be wide)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.ops.dense_qp import dense_qp_solve
from mpc_collisionavoidance_tpu.ops.ipm import ipm_solve
from mpc_collisionavoidance_tpu.parity.kkt import kkt_report
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver

from tests.test_ipm import make_qp

# heavy tier: excluded from the default fast run (pytest.ini)
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("seed", range(30, 42))
def test_random_qp_engine_independence(seed):
    """Stagewise-Riccati and full-condensing engines solve the same KKT
    system by entirely different factorizations: on random QPs (hard +
    soft rows, random active sets) they must agree and be feasible."""
    rng = np.random.default_rng(seed)
    qp = make_qp(rng, seed_scale=1.0 + (seed % 3))
    s_ric = ipm_solve(qp, iters=30)
    s_den = dense_qp_solve(qp, iters=30)
    assert int(s_ric.status) == 0, seed
    assert int(s_den.status) == 0, seed
    np.testing.assert_allclose(np.asarray(s_den.du), np.asarray(s_ric.du),
                               atol=2e-5, err_msg=f"seed {seed}")
    # hard-row feasibility of both solutions
    for sol in (s_ric, s_den):
        g = (np.einsum("kab,kb->ka", np.asarray(qp.Gx),
                       np.asarray(sol.dx)[:-1])
             + np.einsum("kab,kb->ka", np.asarray(qp.Gu),
                         np.asarray(sol.du))
             - np.asarray(qp.gl))
        assert g.min() > -1e-6, (seed, g.min())
        # soft band: value within [slh - sl, suh + su] (+tol)
        gv = (np.asarray(qp.hofs)
              + np.einsum("kab,kb->ka", np.asarray(qp.Cx),
                          np.asarray(sol.dx)[:-1]))
        assert (gv - (np.asarray(qp.slh) - np.asarray(sol.sl))).min() > -1e-6
        assert ((np.asarray(qp.suh) + np.asarray(sol.su)) - gv).min() > -1e-6


@pytest.mark.parametrize("seed", range(4))
def test_flagship_random_x0_satisfies_nlp_kkt(seed):
    """Converged SQP from randomized initial states must land on an
    NLP-KKT point (dynamics-feasible, in-bounds, within the soft band,
    and a fixed point of one more RTI step)."""
    spec = builders.usv_guidance_ca1(Tf=1.0, N=20)
    solver = RTISolver(spec, ipm_iters=25)
    sc = scenarios.guidance_ca1_default()
    rng = np.random.default_rng(100 + seed)
    x0 = np.asarray(sc.x0, np.float64).copy()
    x0[2] += 1.5 * rng.standard_normal()          # cross-track error
    x0[0] = 0.4 + 0.6 * rng.random()              # surge
    st = solver.init_state(x0, dtype=jnp.float64)
    params, lh = jnp.asarray(sc.params), jnp.asarray(sc.lh)
    st, out = solver.solve_converged(st, jnp.asarray(x0), params, lh,
                                     sqp_iters=40)
    rep = kkt_report(solver, st, jnp.asarray(x0), params, lh)
    assert rep.ok(tol=1e-6, band_tol=1e-6), (seed, rep)
