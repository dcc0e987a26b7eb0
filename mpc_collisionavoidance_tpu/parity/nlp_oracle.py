"""Dense NLP oracle: the OCP re-solved by scipy SLSQP, slacks and all.

Independent of every solver-side code path (no Riccati, no IPM, no lane
layout): the full trajectory is one dense decision vector, dynamics are
equality constraints on the same RK4 integrator, and the acados soft-
constraint semantics (zl/Zl linear+quadratic penalties, lsh/ush slack
bounds; reference scripts/usv_guidance_ca1/acados_settings.py:105-178) are
reproduced with explicit slack variables.  Gradients/Jacobians come from
jax in float64, so SLSQP converges tightly and the <1e-3 control parity
target of BASELINE.md is meaningful.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.ocp.spec import OCPSpec
from mpc_collisionavoidance_tpu.ops import integrators


class OracleSolution(NamedTuple):
    xtraj: np.ndarray   # (N+1, nx), includes the pinned x0
    utraj: np.ndarray   # (N, nu)
    sl: np.ndarray      # (N, nS)
    su: np.ndarray      # (N, nS)
    objective: float
    success: bool
    message: str


def solve_ocp_nlp_dense(spec: OCPSpec, x0, params,
                        lh: Optional[np.ndarray] = None,
                        x_init=None, u_init=None,
                        maxiter: int = 400) -> OracleSolution:
    """Solve the OCP as a dense NLP with scipy SLSQP (float64).

    Needs float64 gradients for SLSQP's tolerances to mean anything; x64
    mode is enabled for the duration of the solve and restored after (the
    oracle runs offline, never inside a jitted/production path)."""
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        return _solve_dense_x64(spec, x0, params, lh, x_init, u_init,
                                maxiter)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def _solve_dense_x64(spec, x0, params, lh, x_init, u_init, maxiter):
    from scipy.optimize import minimize

    m = spec.model
    N, nx, nu = spec.N, m.nx, m.nu
    nS = len(spec.soft.idxsh) if spec.soft is not None else 0
    soft_idx = np.asarray(spec.soft.idxsh, dtype=np.int64) if nS else None
    hard_idx = np.asarray(spec.hard_h_rows(), dtype=np.int64)
    scale = float(spec.stage_scale)
    x0 = np.asarray(x0, np.float64)
    params = jnp.asarray(params, jnp.float64)
    lh_full = np.asarray(m.lh if lh is None else lh, np.float64)
    uh_full = np.asarray(m.uh, np.float64)

    F = integrators.make_discrete_dynamics(m.f, spec.dt,
                                           spec.integrator_steps)

    nz = N * nx + N * nu + 2 * N * nS

    def split(z):
        xs = z[: N * nx].reshape(N, nx)              # x_1 .. x_N
        us = z[N * nx: N * (nx + nu)].reshape(N, nu)
        sl = z[N * (nx + nu): N * (nx + nu) + N * nS].reshape(N, nS)
        su = z[N * (nx + nu) + N * nS:].reshape(N, nS)
        return xs, us, sl, su

    Vx = jnp.asarray(spec.cost.Vx, jnp.float64)
    Vu = jnp.asarray(spec.cost.Vu, jnp.float64)
    W = jnp.asarray(spec.cost.W, jnp.float64)
    yref = jnp.asarray(spec.cost.yref, jnp.float64)
    Vx_e = jnp.asarray(spec.cost.Vx_e, jnp.float64)
    W_e = jnp.asarray(spec.cost.W_e, jnp.float64)
    yref_e = jnp.asarray(spec.cost.yref_e, jnp.float64)
    if nS:
        zl = jnp.asarray(spec.soft.zl, jnp.float64)
        Zl = jnp.asarray(spec.soft.Zl, jnp.float64)
        zu = jnp.asarray(spec.soft.zu, jnp.float64)
        Zu = jnp.asarray(spec.soft.Zu, jnp.float64)

    def objective(z):
        xs, us, sl, su = split(z)
        x_all = jnp.concatenate([jnp.asarray(x0)[None], xs[:-1]], axis=0)
        y = (x_all @ Vx.T + us @ Vu.T) - yref            # stages 0..N-1
        cost = 0.5 * scale * jnp.sum((y @ W) * y)
        ye = Vx_e @ xs[-1] - yref_e
        cost = cost + 0.5 * jnp.dot(ye, W_e @ ye)
        if nS:
            cost = cost + scale * jnp.sum(sl @ zl + su @ zu)
            cost = cost + 0.5 * scale * jnp.sum((sl * sl) @ Zl
                                                + (su * su) @ Zu)
        return cost

    def dynamics_defect(z):
        xs, us, _, _ = split(z)
        x_all = jnp.concatenate([jnp.asarray(x0)[None], xs[:-1]], axis=0)
        rolled = jax.vmap(F, in_axes=(0, 0, None))(x_all, us, params)
        return (rolled - xs).reshape(-1)

    def ineq(z):
        """All inequality rows, >= 0 feasible."""
        xs, us, sl, su = split(z)
        x_all = jnp.concatenate([jnp.asarray(x0)[None], xs[:-1]], axis=0)
        rows = []
        if len(m.idxbu):
            usel = us[:, np.asarray(m.idxbu, np.int64)]
            rows += [(usel - jnp.asarray(m.lbu)).reshape(-1),
                     (jnp.asarray(m.ubu) - usel).reshape(-1)]
        if len(m.idxbx):
            xsel = x_all[1:, np.asarray(m.idxbx, np.int64)]  # stages 1..N-1
            rows += [(xsel - jnp.asarray(m.lbx)).reshape(-1),
                     (jnp.asarray(m.ubx) - xsel).reshape(-1)]
        if m.nh:
            hval = jax.vmap(lambda x: m.h(x, params))(x_all)  # (N, nh)
            if len(hard_idx):
                hh = hval[:, hard_idx]
                rows += [(hh - lh_full[hard_idx]).reshape(-1),
                         (uh_full[hard_idx] - hh).reshape(-1)]
            if nS:
                hs = hval[:, soft_idx]
                rows += [(hs - lh_full[soft_idx] + sl).reshape(-1),
                         (uh_full[soft_idx] - hs + su).reshape(-1),
                         (sl - jnp.asarray(spec.soft.lsh)).reshape(-1),
                         (su - jnp.asarray(spec.soft.ush)).reshape(-1)]
        if not rows:
            return jnp.zeros((1,))
        return jnp.concatenate(rows)

    obj_g = jax.jit(jax.grad(objective))
    dyn_j = jax.jit(jax.jacrev(dynamics_defect))
    ineq_j = jax.jit(jax.jacrev(ineq))
    obj_f = jax.jit(objective)
    dyn_f = jax.jit(dynamics_defect)
    ineq_f = jax.jit(ineq)

    z0 = np.zeros(nz)
    xs0 = (np.broadcast_to(x0, (N, nx)) if x_init is None
           else np.asarray(x_init, np.float64)[1:])
    z0[: N * nx] = xs0.reshape(-1)
    if u_init is not None:
        z0[N * nx: N * (nx + nu)] = np.asarray(u_init).reshape(-1)
    if nS:
        # feasible slack start: cover current violation, respect bounds
        h0 = np.asarray(jax.vmap(lambda x: m.h(jnp.asarray(x), params))(
            np.concatenate([x0[None], xs0[:-1]])))
        viol = lh_full[soft_idx][None, :] - h0[:, soft_idx]
        sl0 = np.maximum(viol, np.asarray(spec.soft.lsh)[None, :]) + 0.05
        z0[N * (nx + nu): N * (nx + nu) + N * nS] = sl0.reshape(-1)
        z0[N * (nx + nu) + N * nS:] = np.maximum(
            np.asarray(spec.soft.ush), 0.0).repeat(N)

    res = minimize(
        lambda z: float(obj_f(z)), z0, jac=lambda z: np.asarray(obj_g(z)),
        method="SLSQP",
        constraints=[
            dict(type="eq", fun=lambda z: np.asarray(dyn_f(z)),
                 jac=lambda z: np.asarray(dyn_j(z))),
            dict(type="ineq", fun=lambda z: np.asarray(ineq_f(z)),
                 jac=lambda z: np.asarray(ineq_j(z))),
        ],
        options=dict(maxiter=maxiter, ftol=1e-12),
    )
    xs, us, sl, su = split(res.x)
    xtraj = np.concatenate([x0[None], np.asarray(xs)])
    return OracleSolution(xtraj=xtraj, utraj=np.asarray(us),
                          sl=np.asarray(sl), su=np.asarray(su),
                          objective=float(res.fun), success=bool(res.success),
                          message=str(res.message))
