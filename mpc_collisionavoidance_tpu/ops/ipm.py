"""Primal-dual interior-point method for stage-structured QPs with soft
constraints — the TPU-native role of HPIPM (reference qp_solver
"PARTIAL_CONDENSING_HPIPM", scripts/usv_guidance_ca1/acados_settings.py:190).

QP form (per SQP iteration, all quantities from linearization at the current
trajectory iterate):

    min   sum_k 0.5 w_k'H_k w_k + g_k'w_k
          + sum_k [ zl'sl_k + 0.5 sl_k'Zl sl_k + zu'su_k + 0.5 su_k'Zu su_k ]
    s.t.  dx_{k+1} = A_k dx_k + B_k du_k + c_k,      dx_0 = dx0
          Gx_k dx_k + Gu_k du_k - gl_k >= 0                       (hard rows)
          hofs_k + Cx_k dx_k - slh_k + sl_k >= 0                  (soft lower)
          suh_k - hofs_k - Cx_k dx_k + su_k >= 0                  (soft upper)
          sl_k >= lsh,  su_k >= ush                               (slack bounds)

matching acados/HPIPM soft-constraint semantics (zl/Zl/zu/Zu slack costs and
lsh/ush slack bounds, reference scripts/usv_guidance_ca1/
acados_settings.py:105-108,154-178).

Algorithm: infeasible-start primal-dual path following with
- slack/dual elimination of every inequality family into a modified stage
  Hessian/gradient (the HPIPM "soft constraint elimination"),
- one Riccati `lax.scan` sweep per IPM iteration (ops/riccati.py),
- a single fraction-to-boundary step size per instance,
- a FIXED iteration count so the whole solve is one straight-line XLA
  program: `vmap` over thousands of scenario instances gives batched
  solves with zero host round-trips (the reference's one-solve-per-tick
  CPU loop, src/nmpc_guidance_ca1.cpp:577, becomes a tensor program).

All inequality slacks t are independent variables (infeasible start is
allowed); residuals r_t = g(w) - t contract by (1-alpha) per iteration.
Masked (absent) hard rows are encoded as zero rows with gl = -1 so they
contribute exactly nothing while keeping shapes static.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_collisionavoidance_tpu.ops.riccati import LQRData, lqr_solve


class QPData(NamedTuple):
    """Stage-structured QP with hard rows and softened rows."""

    # dynamics
    A: jnp.ndarray     # (N, nx, nx)
    B: jnp.ndarray     # (N, nx, nu)
    c: jnp.ndarray     # (N, nx)
    dx0: jnp.ndarray   # (nx,)
    # cost
    Q: jnp.ndarray     # (N+1, nx, nx)
    S: jnp.ndarray     # (N, nu, nx)
    R: jnp.ndarray     # (N, nu, nu)
    qx: jnp.ndarray    # (N+1, nx)
    qu: jnp.ndarray    # (N, nu)
    # hard inequality rows: Gx dx + Gu du - gl >= 0
    Gx: jnp.ndarray    # (N, nI, nx)
    Gu: jnp.ndarray    # (N, nI, nu)
    gl: jnp.ndarray    # (N, nI)
    # soft rows: value g = hofs + Cx dx, relaxed slh <= g <= suh
    Cx: jnp.ndarray    # (N, nS, nx)
    hofs: jnp.ndarray  # (N, nS)
    slh: jnp.ndarray   # (N, nS)
    suh: jnp.ndarray   # (N, nS)
    zl: jnp.ndarray    # (nS,) linear lower-slack cost (already dt-scaled)
    Zl: jnp.ndarray    # (nS,)
    zu: jnp.ndarray    # (nS,)
    Zu: jnp.ndarray    # (nS,)
    lsh: jnp.ndarray   # (nS,) slack lower bounds
    ush: jnp.ndarray   # (nS,)


class IPMSolution(NamedTuple):
    dx: jnp.ndarray        # (N+1, nx)
    du: jnp.ndarray        # (N, nu)
    sl: jnp.ndarray        # (N, nS) lower slacks
    su: jnp.ndarray        # (N, nS)
    gap: jnp.ndarray       # final complementarity measure (scalar)
    eq_res: jnp.ndarray    # final dynamics residual inf-norm (scalar)
    status: jnp.ndarray    # 0 ok, 1 not converged, 2 NaN


def _bmv(M, v):
    """Batched (stage-wise) matrix-vector: (N,a,b) x (N,b) -> (N,a)."""
    return jnp.einsum("kab,kb->ka", M, v)


def _bmtv(M, v):
    """(N,a,b) x (N,a) -> (N,b)  (transpose matvec)."""
    return jnp.einsum("kab,ka->kb", M, v)


def _weighted_gram(M, w, Mb=None):
    """(N,r,a),(N,r)[,(N,r,b)] -> sum_i w_i M_i M_i' : (N,a,b)."""
    Mb = M if Mb is None else Mb
    return jnp.einsum("kra,kr,krb->kab", M, w, Mb)


def ipm_solve(qp: QPData, iters: int = 18, tau: float = 0.995,
              sigma: float = 0.1, tol: float = 1e-7,
              mu0: float = 1.0) -> IPMSolution:
    """Solve the QP with `iters` fixed path-following iterations."""
    N, nI = qp.gl.shape
    nS = qp.hofs.shape[-1]
    dtype = qp.A.dtype
    n_total = N * (nI + 4 * nS)
    n_total = max(n_total, 1)

    def g_hard(dx, du):
        return _bmv(qp.Gx, dx[:-1]) + _bmv(qp.Gu, du) - qp.gl

    def g_soft_val(dx):
        return qp.hofs + _bmv(qp.Cx, dx[:-1])

    # ----- initialization -----
    dx = jnp.zeros((N + 1, qp.A.shape[-1]), dtype)
    du = jnp.zeros((N, qp.B.shape[-1]), dtype)
    gv0 = g_soft_val(dx)
    s_margin = jnp.asarray(0.1, dtype)
    sl = jnp.maximum(qp.slh - gv0, qp.lsh) + s_margin
    su = jnp.maximum(gv0 - qp.suh, qp.ush) + s_margin
    t_min = jnp.asarray(0.1, dtype)
    tg = jnp.maximum(g_hard(dx, du), t_min)
    tl = jnp.maximum(gv0 - qp.slh + sl, t_min)
    tu = jnp.maximum(qp.suh - gv0 + su, t_min)
    tsl = jnp.maximum(sl - qp.lsh, t_min)
    tsu = jnp.maximum(su - qp.ush, t_min)
    lg, ll, lu, lsl, lsu = (mu0 / t for t in (tg, tl, tu, tsl, tsu))

    # Once the duality measure reaches this floor the iterate is frozen:
    # pushing an IPM past ~sqrt(eps) of the dtype makes lambda/t ratios
    # overflow for active rows and poisons the solution with NaNs.
    gap_floor = jnp.asarray(1e-13 if dtype == jnp.float64 else 3e-7, dtype)

    def body(carry, _):
        dx, du, sl, su, tg, tl, tu, tsl, tsu, lg, ll, lu, lsl, lsu = carry

        gv = g_soft_val(dx)
        r_tg = g_hard(dx, du) - tg
        r_tl = (gv - qp.slh + sl) - tl
        r_tu = (qp.suh - gv + su) - tu
        r_tsl = (sl - qp.lsh) - tsl
        r_tsu = (su - qp.ush) - tsu

        gap = (jnp.sum(lg * tg) + jnp.sum(ll * tl) + jnp.sum(lu * tu)
               + jnp.sum(lsl * tsl) + jnp.sum(lsu * tsu)) / n_total
        mu = sigma * gap

        ag = lg / tg
        al, au, asl, asu = ll / tl, lu / tu, lsl / tsl, lsu / tsu

        # soft-row elimination scalars
        beta_l = qp.Zl + al + asl
        beta_u = qp.Zu + au + asu
        k_l = mu / tl + mu / tsl - qp.zl - qp.Zl * sl - al * r_tl - asl * r_tsl
        k_u = mu / tu + mu / tsu - qp.zu - qp.Zu * su - au * r_tu - asu * r_tsu
        abar_l = al * (qp.Zl + asl) / beta_l
        abar_u = au * (qp.Zu + asu) / beta_u
        qtil_l = mu / tl - al * r_tl - al * k_l / beta_l
        qtil_u = mu / tu - au * r_tu - au * k_u / beta_u

        # modified stage Hessians
        Qbar_path = (qp.Q[:-1]
                     + _weighted_gram(qp.Gx, ag)
                     + _weighted_gram(qp.Cx, abar_l + abar_u))
        Qbar = jnp.concatenate([Qbar_path, qp.Q[-1:]], axis=0)
        Rbar = qp.R + _weighted_gram(qp.Gu, ag)
        Sbar = qp.S + jnp.einsum("kru,kr,krx->kux", qp.Gu, ag, qp.Gx)

        # modified gradients (stationarity residuals, dual terms eliminated)
        hard_vec = mu / tg - ag * r_tg
        qx_path = (qp.qx[:-1] + _bmv(qp.Q[:-1], dx[:-1]) + _bmtv(qp.S, du)
                   - _bmtv(qp.Gx, hard_vec)
                   - _bmtv(qp.Cx, qtil_l) + _bmtv(qp.Cx, qtil_u))
        qx_N = qp.qx[-1] + qp.Q[-1] @ dx[-1]
        qxbar = jnp.concatenate([qx_path, qx_N[None]], axis=0)
        qubar = (qp.qu + _bmv(qp.S, dx[:-1]) + _bmv(qp.R, du)
                 - _bmtv(qp.Gu, hard_vec))

        # dynamics residual
        cbar = _bmv(qp.A, dx[:-1]) + _bmv(qp.B, du) + qp.c - dx[1:]
        ddx0 = qp.dx0 - dx[0]

        Ddx, Ddu = lqr_solve(LQRData(qp.A, qp.B, cbar, Qbar, Sbar, Rbar,
                                     qxbar, qubar, ddx0))

        # recover slack and dual steps
        Dgv = _bmv(qp.Cx, Ddx[:-1])
        Dsl = (k_l - al * Dgv) / beta_l
        Dsu = (k_u + au * Dgv) / beta_u
        Dtg = _bmv(qp.Gx, Ddx[:-1]) + _bmv(qp.Gu, Ddu) + r_tg
        Dtl = Dgv + Dsl + r_tl
        Dtu = -Dgv + Dsu + r_tu
        Dtsl = Dsl + r_tsl
        Dtsu = Dsu + r_tsu
        Dlg = (mu - lg * tg) / tg - ag * Dtg
        Dll = (mu - ll * tl) / tl - al * Dtl
        Dlu = (mu - lu * tu) / tu - au * Dtu
        Dlsl = (mu - lsl * tsl) / tsl - asl * Dtsl
        Dlsu = (mu - lsu * tsu) / tsu - asu * Dtsu

        # fraction-to-boundary step size (single alpha per instance)
        def ratio(z, Dz):
            r = jnp.where(Dz < 0, -z / jnp.where(Dz < 0, Dz, -1.0), jnp.inf)
            return jnp.min(r, initial=jnp.inf)

        alpha_max = jnp.minimum(
            jnp.minimum(jnp.minimum(ratio(tg, Dtg), ratio(tl, Dtl)),
                        jnp.minimum(ratio(tu, Dtu), ratio(tsl, Dtsl))),
            jnp.minimum(jnp.minimum(ratio(tsu, Dtsu), ratio(lg, Dlg)),
                        jnp.minimum(jnp.minimum(ratio(ll, Dll), ratio(lu, Dlu)),
                                    jnp.minimum(ratio(lsl, Dlsl),
                                                ratio(lsu, Dlsu)))),
        )
        alpha = jnp.minimum(1.0, tau * alpha_max).astype(dtype)

        # freeze the iterate once converged (see gap_floor note above); a
        # NaN-poisoned step is also rejected so earlier progress survives
        step_ok = jnp.isfinite(alpha) & jnp.all(jnp.isfinite(Ddx)) \
            & jnp.all(jnp.isfinite(Ddu))
        keep = (gap <= gap_floor) | ~step_ok

        def upd(old, delta):
            return jnp.where(keep, old, old + alpha * delta)

        new = (upd(dx, Ddx), upd(du, Ddu),
               upd(sl, Dsl), upd(su, Dsu),
               upd(tg, Dtg), upd(tl, Dtl), upd(tu, Dtu),
               upd(tsl, Dtsl), upd(tsu, Dtsu),
               upd(lg, Dlg), upd(ll, Dll), upd(lu, Dlu),
               upd(lsl, Dlsl), upd(lsu, Dlsu))
        return new, gap

    carry = (dx, du, sl, su, tg, tl, tu, tsl, tsu, lg, ll, lu, lsl, lsu)
    carry, gaps = jax.lax.scan(body, carry, None, length=iters)
    dx, du, sl, su, tg, tl, tu, tsl, tsu, lg, ll, lu, lsl, lsu = carry

    gap = (jnp.sum(lg * tg) + jnp.sum(ll * tl) + jnp.sum(lu * tu)
           + jnp.sum(lsl * tsl) + jnp.sum(lsu * tsu)) / n_total
    cbar = _bmv(qp.A, dx[:-1]) + _bmv(qp.B, du) + qp.c - dx[1:]
    eq_res = jnp.max(jnp.abs(cbar), initial=0.0)
    eq_res = jnp.maximum(eq_res, jnp.max(jnp.abs(qp.dx0 - dx[0]), initial=0.0))

    # eq_res participates: a NaN-poisoned problem (e.g. NaN measurement in
    # dx0) freezes the iterate at a finite value but leaves a non-finite
    # residual — that must surface as status 2, not "merely unconverged"
    finite = (jnp.isfinite(gap) & jnp.isfinite(eq_res)
              & jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(du)))
    # status tolerance is dtype-aware: in float32 the gap floors at
    # ~3e-7, so a 1e-7 request would label fully-converged solves as
    # status 1 (observed in bench/CLI runs); the freeze threshold
    # above is unchanged
    eff_tol = tol if dtype == jnp.float64 else max(tol, 5e-7)
    converged = (gap < eff_tol) & (eq_res < 1e3 * eff_tol)
    status = jnp.where(finite, jnp.where(converged, 0, 1), 2)
    return IPMSolution(dx=dx, du=du, sl=sl, su=su, gap=gap,
                       eq_res=eq_res, status=status)
