"""Interior-point QP solver tests.

Three oracle layers (SURVEY.md section 4: the reference has no tests — we
build the pyramid it lacks):
1. equality-only QPs must reproduce the Riccati solution exactly,
2. inequality/soft QPs are checked against scipy SLSQP on the dense
   reformulation (an implementation-independent solver),
3. KKT optimality conditions of the exact QP are verified directly.
"""

import jax.numpy as jnp
import numpy as np
import scipy.optimize

from mpc_collisionavoidance_tpu.ops.ipm import QPData, ipm_solve
from mpc_collisionavoidance_tpu.ops.riccati import LQRData, lqr_solve


def make_qp(rng, N=5, nx=3, nu=2, nI=2, nS=2, seed_scale=1.0):
    A = 0.8 * rng.standard_normal((N, nx, nx)) / np.sqrt(nx)
    B = rng.standard_normal((N, nx, nu))
    c = 0.1 * rng.standard_normal((N, nx))
    Qs = rng.standard_normal((N + 1, nx, nx))
    Q = np.einsum("kij,kil->kjl", Qs, Qs) / nx + 0.6 * np.eye(nx)
    Rs = rng.standard_normal((N, nu, nu))
    R = np.einsum("kij,kil->kjl", Rs, Rs) / nu + 0.6 * np.eye(nu)
    S = 0.05 * rng.standard_normal((N, nu, nx))
    qx = seed_scale * rng.standard_normal((N + 1, nx))
    qu = seed_scale * rng.standard_normal((N, nu))
    dx0 = 0.3 * rng.standard_normal(nx)

    # hard rows: mix of x and u rows with bounds loose enough to be feasible
    Gx = rng.standard_normal((N, nI, nx)) * 0.5
    Gu = rng.standard_normal((N, nI, nu)) * 0.5
    gl = -0.3 - 0.3 * rng.random((N, nI))

    # soft rows
    Cx = rng.standard_normal((N, nS, nx)) * 0.5
    hofs = 0.2 * rng.standard_normal((N, nS))
    slh = hofs - 0.1 - 0.2 * rng.random((N, nS))   # lower bounds near value
    suh = hofs + 0.1 + 0.2 * rng.random((N, nS))
    zl = 0.5 + rng.random(nS)
    Zl = 0.3 * rng.random(nS)
    zu = 0.5 + rng.random(nS)
    Zu = 0.3 * rng.random(nS)
    lsh = np.full(nS, -0.05)
    ush = np.zeros(nS)

    return QPData(*[jnp.asarray(a) for a in (
        A, B, c, dx0, Q, S, R, qx, qu, Gx, Gu, gl,
        Cx, hofs, slh, suh, zl, Zl, zu, Zu, lsh, ush)])


def qp_to_dense(qp: QPData):
    """Flatten to z = [dx(0..N); du(0..N-1); sl; su] with callables for scipy."""
    A, B, c = np.asarray(qp.A), np.asarray(qp.B), np.asarray(qp.c)
    N, nx, nu = B.shape
    nS = qp.hofs.shape[-1]
    n_dx = (N + 1) * nx
    n_du = N * nu
    n_s = N * nS
    nz = n_dx + n_du + 2 * n_s

    def split(z):
        dx = z[:n_dx].reshape(N + 1, nx)
        du = z[n_dx:n_dx + n_du].reshape(N, nu)
        sl = z[n_dx + n_du:n_dx + n_du + n_s].reshape(N, nS)
        su = z[n_dx + n_du + n_s:].reshape(N, nS)
        return dx, du, sl, su

    Q, S, R = np.asarray(qp.Q), np.asarray(qp.S), np.asarray(qp.R)
    qx, qu = np.asarray(qp.qx), np.asarray(qp.qu)
    zl, Zl = np.asarray(qp.zl), np.asarray(qp.Zl)
    zu, Zu = np.asarray(qp.zu), np.asarray(qp.Zu)

    def obj(z):
        dx, du, sl, su = split(z)
        val = 0.0
        for k in range(N + 1):
            val += 0.5 * dx[k] @ Q[k] @ dx[k] + qx[k] @ dx[k]
        for k in range(N):
            val += 0.5 * du[k] @ R[k] @ du[k] + qu[k] @ du[k]
            val += du[k] @ S[k] @ dx[k]
            val += zl @ sl[k] + 0.5 * sl[k] @ (Zl * sl[k])
            val += zu @ su[k] + 0.5 * su[k] @ (Zu * su[k])
        return val

    cons = []
    # dynamics equalities
    def eq_fun(z):
        dx, du, _, _ = split(z)
        res = [dx[0] - np.asarray(qp.dx0)]
        for k in range(N):
            res.append(A[k] @ dx[k] + B[k] @ du[k] + c[k] - dx[k + 1])
        return np.concatenate(res)

    cons.append({"type": "eq", "fun": eq_fun})

    Gx, Gu, gl = np.asarray(qp.Gx), np.asarray(qp.Gu), np.asarray(qp.gl)
    Cx, hofs = np.asarray(qp.Cx), np.asarray(qp.hofs)
    slh, suh = np.asarray(qp.slh), np.asarray(qp.suh)
    lsh, ush = np.asarray(qp.lsh), np.asarray(qp.ush)

    def ineq_fun(z):
        dx, du, sl, su = split(z)
        res = []
        for k in range(N):
            res.append(Gx[k] @ dx[k] + Gu[k] @ du[k] - gl[k])
            gv = hofs[k] + Cx[k] @ dx[k]
            res.append(gv - slh[k] + sl[k])
            res.append(suh[k] - gv + su[k])
            res.append(sl[k] - lsh)
            res.append(su[k] - ush)
        return np.concatenate(res)

    cons.append({"type": "ineq", "fun": ineq_fun})
    return nz, obj, cons, split


def solve_dense(qp, nz, obj, cons):
    z0 = np.zeros(nz)
    res = scipy.optimize.minimize(
        obj, z0, constraints=cons, method="SLSQP",
        options={"maxiter": 400, "ftol": 1e-12})
    assert res.success, res.message
    return res


def test_equality_only_matches_riccati():
    rng = np.random.default_rng(0)
    qp = make_qp(rng, nI=1, nS=1)
    # disable: hard rows trivially satisfied, soft rows unbounded
    qp = qp._replace(
        Gx=jnp.zeros_like(qp.Gx), Gu=jnp.zeros_like(qp.Gu),
        gl=-jnp.ones_like(qp.gl),
        Cx=jnp.zeros_like(qp.Cx), hofs=jnp.zeros_like(qp.hofs),
        slh=-jnp.ones_like(qp.slh) * 10, suh=jnp.ones_like(qp.suh) * 10,
    )
    sol = ipm_solve(qp, iters=25)
    dx_l, du_l = lqr_solve(LQRData(qp.A, qp.B, qp.c, qp.Q, qp.S, qp.R,
                                   qp.qx, qp.qu, qp.dx0))
    assert float(sol.gap) < 1e-8
    np.testing.assert_allclose(np.asarray(sol.dx), np.asarray(dx_l),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(du_l),
                               atol=2e-6, rtol=1e-5)


def test_ipm_matches_slsqp_with_constraints():
    rng = np.random.default_rng(1)
    qp = make_qp(rng)
    sol = ipm_solve(qp, iters=30)
    assert int(sol.status) == 0, (float(sol.gap), float(sol.eq_res))

    nz, obj, cons, split = qp_to_dense(qp)
    res = solve_dense(qp, nz, obj, cons)
    dx_d, du_d, sl_d, su_d = split(res.x)

    np.testing.assert_allclose(np.asarray(sol.dx), dx_d, atol=5e-6)
    np.testing.assert_allclose(np.asarray(sol.du), du_d, atol=5e-6)
    # objective must match at least as well
    z_ipm = np.concatenate([np.asarray(sol.dx).ravel(),
                            np.asarray(sol.du).ravel(),
                            np.asarray(sol.sl).ravel(),
                            np.asarray(sol.su).ravel()])
    assert obj(z_ipm) <= obj(res.x) + 1e-7


def test_ipm_active_hard_constraints():
    """Tighten hard bounds so several rows are active at the optimum."""
    rng = np.random.default_rng(2)
    qp = make_qp(rng, seed_scale=2.0)
    qp = qp._replace(gl=jnp.asarray(-0.05 - 0.05 * rng.random(qp.gl.shape)))
    sol = ipm_solve(qp, iters=30)
    assert int(sol.status) == 0
    # feasibility of hard rows
    g = (np.einsum("kab,kb->ka", np.asarray(qp.Gx), np.asarray(sol.dx)[:-1])
         + np.einsum("kab,kb->ka", np.asarray(qp.Gu), np.asarray(sol.du))
         - np.asarray(qp.gl))
    assert g.min() > -1e-7

    nz, obj, cons, split = qp_to_dense(qp)
    res = solve_dense(qp, nz, obj, cons)
    dx_d, du_d, _, _ = split(res.x)
    np.testing.assert_allclose(np.asarray(sol.dx), dx_d, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol.du), du_d, atol=1e-5)


def test_ipm_soft_exact_penalty_band():
    """With Zl=0 (pure L1, the flagship setting) the optimal lower slack is
    max(slh - g, lsh): verify the analytic slack against the IPM's."""
    rng = np.random.default_rng(3)
    qp = make_qp(rng)
    qp = qp._replace(Zl=jnp.zeros_like(qp.Zl), Zu=jnp.zeros_like(qp.Zu))
    sol = ipm_solve(qp, iters=30)
    assert int(sol.status) == 0
    gv = (np.asarray(qp.hofs)
          + np.einsum("kab,kb->ka", np.asarray(qp.Cx), np.asarray(sol.dx)[:-1]))
    sl_expect = np.maximum(np.asarray(qp.slh) - gv, np.asarray(qp.lsh))
    su_expect = np.maximum(gv - np.asarray(qp.suh), np.asarray(qp.ush))
    np.testing.assert_allclose(np.asarray(sol.sl), sl_expect, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol.su), su_expect, atol=1e-5)


def test_ipm_batched_vmap():
    import jax

    rng = np.random.default_rng(4)
    qps = [make_qp(rng) for _ in range(4)]
    batched = QPData(*[jnp.stack([np.asarray(getattr(q, f)) for q in qps])
                       for f in QPData._fields])
    sols = jax.vmap(lambda qp: ipm_solve(qp, iters=30))(batched)
    for i, q in enumerate(qps):
        s = ipm_solve(q, iters=30)
        np.testing.assert_allclose(np.asarray(sols.dx[i]), np.asarray(s.dx),
                                   atol=1e-8)
