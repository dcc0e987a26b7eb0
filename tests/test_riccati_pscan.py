"""Parallel-scan Riccati vs the sequential lane sweep (exact same LQR)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.ops.riccati_lanes import (
    LaneLQR, lqr_solve_lanes)
from mpc_collisionavoidance_tpu.ops.riccati_pscan import lqr_solve_pscan

# heavy tier: excluded from the default fast run (pytest.ini)
pytestmark = pytest.mark.slow


def _random_lqr(N, nx, nu, L, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, dtype)

    Qr = rng.standard_normal((N + 1, nx, nx, L)) * 0.2
    Q = jnp.asarray(np.einsum("nikl,njkl->nijl", Qr, Qr)
                    + 0.3 * np.eye(nx)[None, :, :, None], dtype)
    Rr = rng.standard_normal((N, nu, nu, L)) * 0.2
    R = jnp.asarray(np.einsum("nikl,njkl->nijl", Rr, Rr)
                    + 0.4 * np.eye(nu)[None, :, :, None], dtype)
    A = jnp.asarray(0.9 * np.eye(nx)[None, :, :, None]
                    + 0.05 * rng.standard_normal((N, nx, nx, L)), dtype)
    return LaneLQR(A=A, B=arr(N, nx, nu, L), c=arr(N, nx, L), Q=Q,
                   S=arr(N, nu, nx, L) * 0.1, R=R,
                   qx=arr(N + 1, nx, L), qu=arr(N, nu, L),
                   dx0=arr(nx, L))


@pytest.mark.parametrize("N,nx,nu", [(1, 3, 1), (2, 3, 1), (7, 8, 1),
                                     (16, 8, 2), (33, 5, 2)])
def test_pscan_matches_sequential(N, nx, nu):
    d = _random_lqr(N, nx, nu, L=4, seed=N)
    dx_ref, du_ref = lqr_solve_lanes(d)
    dx, du = lqr_solve_pscan(d)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               rtol=1e-8, atol=1e-9)


def test_pscan_long_horizon_f32():
    """N = 100 (flagship length) in float32: agreement within f32 noise."""
    d = _random_lqr(100, 8, 1, L=8, seed=3, dtype=jnp.float32)
    dx_ref, du_ref = lqr_solve_lanes(d)
    dx, du = lqr_solve_pscan(d)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               rtol=2e-3, atol=2e-4)


def test_lane_engine_with_pscan_backend():
    """Full flagship RTI tick with riccati='pscan' vs 'lax'."""
    import jax

    from mpc_collisionavoidance_tpu.ocp import builders
    from mpc_collisionavoidance_tpu.sim import scenarios
    from mpc_collisionavoidance_tpu.solver.batch import (
        LaneRTISolver, to_lanes)

    spec = builders.usv_guidance_ca1(Tf=2.0, N=25)
    sc = scenarios.guidance_ca1_default()
    B = 8
    x0s = np.broadcast_to(sc.x0, (B, 8))
    xL = to_lanes(jnp.asarray(x0s, jnp.float64))
    pL = to_lanes(np.broadcast_to(sc.params, (B, 16)))
    lhL = to_lanes(np.broadcast_to(sc.lh, (B, 8)))

    outs = {}
    for backend in ("lax", "pscan"):
        solver = LaneRTISolver(spec, ipm_iters=15, riccati=backend)
        st = solver.init_state(x0s, dtype=jnp.float64)
        st, out = jax.jit(solver.step_fn)(st, xL, pL, lhL)
        outs[backend] = np.asarray(out.u0)
    np.testing.assert_allclose(outs["pscan"], outs["lax"],
                               rtol=1e-8, atol=1e-10)
