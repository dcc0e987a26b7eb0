"""Pallas Riccati kernel vs the lax.scan lane implementation (interpret
mode on CPU; the same kernel compiles for real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.kernels.riccati_pallas import (
    LANE_BLOCK, fits_vmem, lqr_solve_lanes_pallas)
from mpc_collisionavoidance_tpu.ops.riccati_lanes import (
    LaneLQR, lqr_solve_lanes)


def _random_lqr(N, nx, nu, L, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, dtype)

    # SPD cost blocks, mildly contractive dynamics
    Qr = rng.standard_normal((N + 1, nx, nx, L)) * 0.2
    Q = jnp.asarray(np.einsum("nikl,njkl->nijl", Qr, Qr)
                    + 0.5 * np.eye(nx)[None, :, :, None], dtype)
    Rr = rng.standard_normal((N, nu, nu, L)) * 0.2
    R = jnp.asarray(np.einsum("nikl,njkl->nijl", Rr, Rr)
                    + 0.5 * np.eye(nu)[None, :, :, None], dtype)
    A = jnp.asarray(0.9 * np.eye(nx)[None, :, :, None]
                    + 0.05 * rng.standard_normal((N, nx, nx, L)), dtype)
    return LaneLQR(A=A, B=arr(N, nx, nu, L), c=arr(N, nx, L), Q=Q,
                   S=arr(N, nu, nx, L) * 0.1, R=R,
                   qx=arr(N + 1, nx, L), qu=arr(N, nu, L),
                   dx0=arr(nx, L))


@pytest.mark.parametrize("nx,nu", [(8, 1), (8, 2), (4, 1)])
def test_pallas_matches_lax(nx, nu):
    d = _random_lqr(N=12, nx=nx, nu=nu, L=LANE_BLOCK)
    dx_ref, du_ref = lqr_solve_lanes(d)
    dx, du = lqr_solve_lanes_pallas(d, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               rtol=2e-4, atol=2e-5)


def test_pallas_multiblock_lanes():
    """Two lane blocks -> grid of 2 programs; block boundaries must be
    invisible in the result."""
    d = _random_lqr(N=6, nx=5, nu=1, L=2 * LANE_BLOCK, seed=3)
    dx_ref, du_ref = lqr_solve_lanes(d)
    dx, du = lqr_solve_lanes_pallas(d, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               rtol=2e-4, atol=2e-5)


def test_fits_vmem_policy():
    # budget = ~100 MB of the v5e core's 128 MB VMEM with double-buffered
    # inputs (the per-call CompilerParams raise the compiler's 16 MB
    # scoped default to match)
    assert fits_vmem(100, 8, 1)          # flagship (~18 MB)
    assert fits_vmem(100, 14, 2)         # full hull (~51 MB)
    assert not fits_vmem(100, 24, 2)     # beyond VMEM: fall back to lax


def test_lane_engine_with_pallas_backend():
    """Full LaneRTISolver tick with the Pallas Riccati backend (interpret)
    vs the lax backend: identical controls on the flagship OCP."""
    import jax

    from mpc_collisionavoidance_tpu.ocp import builders
    from mpc_collisionavoidance_tpu.sim import scenarios
    from mpc_collisionavoidance_tpu.solver.batch import (
        LaneRTISolver, to_lanes)

    spec = builders.usv_guidance_ca1(Tf=2.0, N=10)
    sc = scenarios.guidance_ca1_default()
    B = LANE_BLOCK
    x0s = np.broadcast_to(sc.x0, (B, 8)).astype(np.float32)
    xL = to_lanes(jnp.asarray(x0s))
    pL = to_lanes(np.broadcast_to(sc.params, (B, 16)).astype(np.float32))
    lhL = to_lanes(np.broadcast_to(sc.lh, (B, 8)).astype(np.float32))

    outs = {}
    for backend in ("lax", "pallas_interpret"):
        solver = LaneRTISolver(spec, ipm_iters=6, riccati=backend)
        st = solver.init_state(x0s)
        st, out = jax.jit(solver.step_fn)(st, xL, pL, lhL)
        outs[backend] = np.asarray(out.u0)
    np.testing.assert_allclose(outs["pallas_interpret"], outs["lax"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("L", [1, 130])
def test_pallas_ragged_lanes(L):
    """Any lane count is accepted: the wrapper pads (edge mode) to a
    block multiple and slices back — the B=1 single-vehicle real-time
    path must ride the same kernel as fleet batches (VERDICT r3 item 1)."""
    d = _random_lqr(N=6, nx=5, nu=1, L=L, seed=7)
    dx_ref, du_ref = lqr_solve_lanes(d)
    dx, du = lqr_solve_lanes_pallas(d, interpret=True)
    assert dx.shape == dx_ref.shape and du.shape == du_ref.shape
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               rtol=2e-4, atol=2e-5)
