"""NLP feasibility / fixed-point reporting for solver iterates.

The reference surfaces solver health as a single acados status int
(reference scripts/usv_guidance_ca1/main.py:135-137); production debugging
needs more.  `kkt_report` measures, for any iterate:

- nonlinear dynamics defect (shooting-gap) max-norm,
- initial-state pin residual,
- box-bound violations,
- nonlinear constraint violation beyond the soft band,
- the RTI fixed-point step norm (one more linearize+QP must not move a
  converged iterate — the practical KKT test for an SQP method).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.ops import integrators
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver, SolverState


class KKTReport(NamedTuple):
    dyn_residual: float      # max |F(x_k, u_k) - x_{k+1}|
    x0_residual: float       # max |x_0 - x0_measured|
    bound_violation: float   # max box-bound violation (0 if feasible)
    h_violation: float       # max soft-band-adjusted h violation
    rti_step_norm: float     # max |Delta u| of one extra RTI step

    def ok(self, tol=1e-6, band_tol=1e-6):
        return (self.dyn_residual < tol and self.x0_residual < tol
                and self.bound_violation < tol
                and self.h_violation < band_tol
                and self.rti_step_norm < 100 * tol)


def kkt_report(solver: RTISolver, state: SolverState, x0, params,
               lh=None, yref=None, yref_e=None) -> KKTReport:
    """`yref`/`yref_e`: the runtime references the iterate was solved
    against (None = the builder's static ones) — the fixed-point RTI step
    must re-solve the SAME problem."""
    spec = solver.spec
    m = spec.model
    xt, ut = state.xbar, state.ubar
    params = jnp.asarray(params, xt.dtype)
    x0 = jnp.asarray(x0, xt.dtype)

    F = integrators.make_discrete_dynamics(m.f, spec.dt,
                                           spec.integrator_steps)
    roll = jax.vmap(F, in_axes=(0, 0, None))(xt[:-1], ut, params)
    dyn = float(jnp.max(jnp.abs(roll - xt[1:])))
    x0r = float(jnp.max(jnp.abs(xt[0] - x0)))

    bviol = 0.0
    if len(m.idxbu):
        usel = ut[:, np.asarray(m.idxbu, np.int64)]
        bviol = max(bviol,
                    float(jnp.max(jnp.asarray(m.lbu) - usel)),
                    float(jnp.max(usel - jnp.asarray(m.ubu))))
    if len(m.idxbx):
        xsel = xt[1:-1, np.asarray(m.idxbx, np.int64)]
        bviol = max(bviol,
                    float(jnp.max(jnp.asarray(m.lbx) - xsel)),
                    float(jnp.max(xsel - jnp.asarray(m.ubx))))
    bviol = max(bviol, 0.0)

    hviol = 0.0
    if m.nh:
        lh_full = jnp.asarray(m.lh if lh is None else lh, xt.dtype)
        hval = jax.vmap(lambda x: m.h(x, params))(xt[:-1])
        viol = lh_full[None, :] - hval
        if spec.soft is not None:
            band = jnp.zeros((m.nh,), xt.dtype).at[
                np.asarray(spec.soft.idxsh, np.int64)].set(
                -jnp.asarray(spec.soft.lsh, xt.dtype))
            viol = viol - band[None, :]
        hviol = max(float(jnp.max(viol)), 0.0)

    _, out2 = solver.step_fn(state, x0, params, lh, yref=yref,
                             yref_e=yref_e)
    step = float(jnp.max(jnp.abs(out2.utraj - ut)))

    return KKTReport(dyn_residual=dyn, x0_residual=x0r,
                     bound_violation=bviol, h_violation=hviol,
                     rti_step_norm=step)
