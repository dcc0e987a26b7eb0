"""Riccati LQR solve vs a dense KKT-system oracle (numpy, float64)."""

import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.ops.riccati import LQRData, lqr_solve


def random_lqr(rng, N=7, nx=4, nu=2):
    A = 0.9 * rng.standard_normal((N, nx, nx)) / np.sqrt(nx)
    B = rng.standard_normal((N, nx, nu))
    c = 0.1 * rng.standard_normal((N, nx))
    Qs = rng.standard_normal((N + 1, nx, nx))
    Q = np.einsum("kij,kil->kjl", Qs, Qs) / nx + 0.5 * np.eye(nx)
    Rs = rng.standard_normal((N, nu, nu))
    R = np.einsum("kij,kil->kjl", Rs, Rs) / nu + 0.5 * np.eye(nu)
    S = 0.1 * rng.standard_normal((N, nu, nx))
    qx = rng.standard_normal((N + 1, nx))
    qu = rng.standard_normal((N, nu))
    dx0 = rng.standard_normal(nx)
    return LQRData(*[jnp.asarray(a) for a in (A, B, c, Q, S, R, qx, qu, dx0)])


def dense_lqr_solve(d: LQRData):
    """Stack the equality-constrained QP into one dense KKT system."""
    A = np.asarray(d.A); B = np.asarray(d.B); c = np.asarray(d.c)
    Q = np.asarray(d.Q); S = np.asarray(d.S); R = np.asarray(d.R)
    qx = np.asarray(d.qx); qu = np.asarray(d.qu); dx0 = np.asarray(d.dx0)
    N, nx, nu = B.shape
    nw = (N + 1) * nx + N * nu

    def ix(k):  # dx_k slice
        return slice(k * nx, (k + 1) * nx)

    def iu(k):  # du_k slice
        return slice((N + 1) * nx + k * nu, (N + 1) * nx + (k + 1) * nu)

    H = np.zeros((nw, nw)); g = np.zeros(nw)
    for k in range(N + 1):
        H[ix(k), ix(k)] += Q[k]; g[ix(k)] += qx[k]
    for k in range(N):
        H[iu(k), iu(k)] += R[k]; g[iu(k)] += qu[k]
        H[iu(k), ix(k)] += S[k]; H[ix(k), iu(k)] += S[k].T

    neq = (N + 1) * nx
    E = np.zeros((neq, nw)); e = np.zeros(neq)
    E[:nx, ix(0)] = np.eye(nx); e[:nx] = dx0
    for k in range(N):
        r = slice((k + 1) * nx, (k + 2) * nx)
        E[r, ix(k + 1)] = -np.eye(nx)
        E[r, ix(k)] = A[k]; E[r, iu(k)] = B[k]
        e[r] = -c[k]

    KKT = np.block([[H, E.T], [E, np.zeros((neq, neq))]])
    rhs = np.concatenate([-g, e])
    sol = np.linalg.solve(KKT, rhs)
    w = sol[:nw]
    dx = w[: (N + 1) * nx].reshape(N + 1, nx)
    du = w[(N + 1) * nx:].reshape(N, nu)
    return dx, du


def test_riccati_matches_dense_kkt():
    rng = np.random.default_rng(7)
    for trial in range(3):
        d = random_lqr(rng)
        dx_r, du_r = lqr_solve(d)
        dx_d, du_d = dense_lqr_solve(d)
        np.testing.assert_allclose(np.asarray(dx_r), dx_d, atol=1e-9, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(du_r), du_d, atol=1e-9, rtol=1e-8)


def test_riccati_dynamics_feasible():
    rng = np.random.default_rng(11)
    d = random_lqr(rng, N=10, nx=5, nu=1)
    dx, du = lqr_solve(d)
    dx = np.asarray(dx); du = np.asarray(du)
    np.testing.assert_allclose(dx[0], np.asarray(d.dx0), atol=1e-12)
    for k in range(10):
        pred = np.asarray(d.A[k]) @ dx[k] + np.asarray(d.B[k]) @ du[k] + np.asarray(d.c[k])
        np.testing.assert_allclose(dx[k + 1], pred, atol=1e-10)
