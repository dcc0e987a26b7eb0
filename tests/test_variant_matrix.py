"""Closed-loop smoke matrix over the ENTIRE 13-variant model zoo.

The reference validates each variant with its own hand-run main.py
experiment (SURVEY.md section 4); here every variant runs the same
receding-horizon harness (solver-as-plant, reference
scripts/<v>/main.py:169-174) at a reduced horizon: trajectories must stay
finite, respect the control bounds, and keep the solver healthy.  This is
the "does every OCP in the zoo actually solve" gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.models import registry
from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim.closed_loop import run_closed_loop
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver

# shrunken horizons (same dt as the full config) keep the matrix fast
SMOKE = {
    # variant: (Tf, N, n_steps, ipm_iters) — race_cars needs deeper
    # IPM convergence (5 hard constraint rows incl. track width)
    "race_cars": (0.4, 20, 60, 16),
    "usv_acados": (0.5, 10, 80, 10),
    "usv_guidance": (0.2, 20, 80, 10),
    "usv_guidance2": (0.2, 20, 80, 10),
    "usv_guidance3": (0.2, 20, 80, 10),
    "usv_guidance4": (0.2, 20, 80, 10),
    "usv_guidance5": (0.2, 20, 80, 10),
    "usv_guidance_ca": (1.0, 20, 80, 10),
    "usv_guidance_ca1": (1.0, 20, 80, 10),
    "usv_low_level": (0.2, 20, 80, 10),
    "usv_pf": (0.2, 20, 80, 10),
    "usv_pf_ca": (0.2, 20, 80, 10),
    "usv_position_control": (0.5, 10, 80, 10),
}


def _far_params(m):
    """Sentinel obstacle table: all centers far away (reference
    acados_settings.py:185 uses 100)."""
    return np.full((m.np_,), 100.0) if m.np_ else np.zeros((0,))


@pytest.mark.parametrize("name", sorted(SMOKE))
def test_variant_closed_loop_smoke(name):
    Tf, N, n_steps, ipm_iters = SMOKE[name]
    spec = builders.build(name, Tf=Tf, N=N)
    m = spec.model
    solver = RTISolver(spec, ipm_iters=ipm_iters)
    params = _far_params(m)

    res = jax.jit(lambda x0, p: run_closed_loop(
        solver, x0, p, n_steps=n_steps))(jnp.asarray(m.x0),
                                         jnp.asarray(params))
    simX = np.asarray(res.simX)
    simU = np.asarray(res.simU)
    status = np.asarray(res.status)

    assert np.all(np.isfinite(simX)), f"{name}: non-finite states"
    assert np.all(np.isfinite(simU)), f"{name}: non-finite controls"
    # control box respected at every tick
    if len(m.idxbu):
        usel = simU[:, np.asarray(m.idxbu, np.int64)]
        assert np.all(usel >= np.asarray(m.lbu)[None] - 1e-5), name
        assert np.all(usel <= np.asarray(m.ubu)[None] + 1e-5), name
    # solver healthy on the vast majority of ticks (status 2 = NaN never)
    assert np.all(status != 2), f"{name}: numerical failure"
    assert np.mean(status == 0) > 0.5, (name, np.mean(status == 0))


def test_zoo_is_complete():
    """Every reference variant (SURVEY.md section 2.4) is in the registry
    and in this smoke matrix."""
    expected = {
        "usv_acados", "usv_low_level", "usv_position_control", "usv_pf",
        "usv_pf_ca", "usv_guidance", "usv_guidance2", "usv_guidance3",
        "usv_guidance4", "usv_guidance5", "usv_guidance_ca",
        "usv_guidance_ca1", "race_cars",
    }
    assert set(registry.names()) == expected
    assert set(SMOKE) == expected


def test_disturbance_sweep_batched():
    """The 2024 paper's theme — NMPC under disturbances — as a batched
    scenario sweep: vmap the whole closed loop over a batch of random
    per-step current disturbances and check the tracking degradation is
    bounded and monotone-ish in disturbance size."""
    from mpc_collisionavoidance_tpu.sim import scenarios

    spec = builders.build("usv_guidance_ca1", Tf=1.0, N=20)
    solver = RTISolver(spec, ipm_iters=10)
    sc = scenarios.guidance_ca1_default()
    # pure-tracking comparison: obstacles at the far sentinel so the
    # metric measures disturbance rejection, not avoidance maneuvering
    params = np.full(16, 100.0)
    lh = np.zeros(8)
    n_steps, B = 300, 4
    rng = np.random.default_rng(7)
    # random NED current pushing on (xned, yned) each tick, growing scale
    scales = np.array([0.0, 0.002, 0.004, 0.008])
    dist = np.zeros((B, n_steps, 8))
    dist[:, :, 5:7] = scales[:, None, None] * rng.standard_normal(
        (B, n_steps, 2))

    run = jax.vmap(lambda d: run_closed_loop(
        solver, sc.x0, params, lh, n_steps=n_steps,
        plant="integrator", transient=100, metric_norm=n_steps - 100,
        disturbance=d))
    res = jax.jit(run)(jnp.asarray(dist))
    ye_mae = np.asarray(res.ye_mae)
    assert np.all(np.isfinite(np.asarray(res.simX)))
    # undisturbed tracking is the best; heavy disturbance degrades but
    # stays bounded (no blowup)
    assert ye_mae[0] <= ye_mae[-1] + 1e-9
    assert ye_mae[-1] < 1.0, ye_mae
