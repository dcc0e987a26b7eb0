"""Closed-loop receding-horizon simulation engine.

Reproduces the reference's offline experiment loop (reference
scripts/usv_guidance_ca1/main.py:116-186) as a single `lax.scan` over control
ticks — so a whole 1000-step closed-loop run is ONE device program, and a
batch of scenarios is one `vmap` of it (the reference runs one scenario per
process on one CPU core).

Plant models:
- ``"solver_prediction"`` (reference semantics): the next measured state is
  the solver's own stage-1 prediction, x0 <- solver.get(1, "x")
  (reference main.py:169-174) — the solver doubles as the simulator.
- ``"integrator"``: honest plant — integrate the model dynamics one tick
  with the applied input u0 (4 RK4 substeps), optionally with additive
  state disturbance.

Metrics mirror reference main.py:147-165: per-step heading error chie and
cross-track error ye, MAE/MSE accumulated after a 400-step transient and
normalized by 600 (main.py:202-205).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mpc_collisionavoidance_tpu.ops import integrators
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver, SolverState


class ClosedLoopResult(NamedTuple):
    simX: jnp.ndarray      # (n_steps, nx) measured state per tick
    simU: jnp.ndarray      # (n_steps, nu) applied input per tick
    status: jnp.ndarray    # (n_steps,) solver status per tick
    psi_mae: jnp.ndarray   # scalar metrics (after-transient), reference names
    psi_mse: jnp.ndarray
    ye_mae: jnp.ndarray
    ye_mse: jnp.ndarray
    final_state: SolverState


def run_closed_loop(solver: RTISolver,
                    x0,
                    params,
                    lh=None,
                    n_steps: int = 1000,
                    plant: str = "solver_prediction",
                    transient: int = 400,
                    metric_norm: float = 600.0,
                    err_idx=(3, 2),
                    disturbance: Optional[jnp.ndarray] = None,
                    yref=None,
                    yref_e=None,
                    yref_fn=None,
                    dtype=jnp.float64) -> ClosedLoopResult:
    """Run the receding-horizon loop; jit/vmap-able as a whole.

    `err_idx` selects (heading-error, cross-track-error) state indices for
    the metric accumulation (3 and 2 for the ca1 state layout, reference
    main.py:156-159).

    `yref_fn(x, k) -> (yref (N, ny), yref_e (nx,))` optionally recomputes
    the stage references every tick from the current measured state — the
    reference's receding progress reference (race car
    scripts/race_cars/main.py:74-83 ramps s from s0 to s0 + 3 across the
    horizon each tick).  Overrides `yref`/`yref_e`.
    """
    spec = solver.spec
    x0 = jnp.asarray(x0, dtype)
    params = jnp.asarray(params, dtype)
    state0 = solver.init_state(x0, dtype=dtype)

    if plant == "integrator":
        plant_step = integrators.make_discrete_dynamics(
            spec.model.f, spec.dt, num_steps=4)

    if disturbance is not None:
        disturbance = jnp.asarray(disturbance, dtype)

    def tick(carry, k):
        st, x = carry
        if yref_fn is not None:
            yref_k, yref_e_k = yref_fn(x, k)
        else:
            yref_k, yref_e_k = yref, yref_e
        st, out = solver.step_fn(st, x, params, lh, yref=yref_k,
                                  yref_e=yref_e_k)
        if plant == "solver_prediction":
            x_next = out.x1
        else:
            x_next = plant_step(x, out.u0, params)
            if disturbance is not None:
                # constant (nx,) offset or per-step (n_steps, nx) sequence
                d = disturbance if disturbance.ndim == 1 else disturbance[k]
                x_next = x_next + d
        errs = jnp.stack([x[err_idx[0]], x[err_idx[1]]])
        return (st, x_next), (x, out.u0, out.status, errs)

    (stN, _), (simX, simU, status, errs) = jax.lax.scan(
        tick, (state0, x0), jnp.arange(n_steps))

    mask = (jnp.arange(n_steps) > transient).astype(dtype)
    psi_err, ye_err = errs[:, 0], errs[:, 1]
    psi_mae = jnp.sum(jnp.abs(psi_err) * mask) / metric_norm
    ye_mae = jnp.sum(jnp.abs(ye_err) * mask) / metric_norm
    psi_mse = jnp.sum(psi_err**2 * mask) / metric_norm
    ye_mse = jnp.sum(ye_err**2 * mask) / metric_norm

    return ClosedLoopResult(simX=simX, simU=simU, status=status,
                            psi_mae=psi_mae, psi_mse=psi_mse,
                            ye_mae=ye_mae, ye_mse=ye_mse,
                            final_state=stN)
