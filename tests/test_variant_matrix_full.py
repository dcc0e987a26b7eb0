"""FULL-SCALE closed-loop tier over the entire variant zoo.

Unlike the fast smoke matrix (tests/test_variant_matrix.py, shrunken
horizons), every variant here runs at its TRUE reference configuration —
the (Tf, N) of SURVEY.md section 2.4 and the scenario of its
scripts/<variant>/main.py — with a >= 90% solver-convergence bar and a
per-variant tracking acceptance criterion (the quantity the reference
experiment demonstrates: heading/speed step response, cross-track
regulation, point stabilization, racing progress).

Simulation lengths are the reference Nsim, capped at the point where the
tracked quantity has visibly settled (the pf family's reference T = 40 s
run spends 3000 of its 4000 ticks in steady state).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.sim.closed_loop import run_closed_loop
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver

# heavy tier: excluded from the default fast run (pytest.ini)
pytestmark = pytest.mark.slow


def _run(name, sc, n_steps=None, ipm_iters=18, centering="fixed",
         mu0=1.0, **builder_kw):
    spec = builders.build(name, **builder_kw)     # builder defaults = §2.4
    m = spec.model
    solver = RTISolver(spec, ipm_iters=ipm_iters, centering=centering,
                       mu0=mu0)
    params = (jnp.asarray(sc.params, jnp.float64) if np.size(sc.params)
              else jnp.zeros(m.np_))
    lh = jnp.asarray(sc.lh, jnp.float64) if np.size(sc.lh) else None
    yref = (None if sc.yref is None
            else jnp.tile(jnp.asarray(sc.yref, jnp.float64), (spec.N, 1)))
    yref_e = None if sc.yref_e is None else jnp.asarray(
        sc.yref_e, jnp.float64)
    res = jax.jit(lambda x0: run_closed_loop(
        solver, x0, params, lh, n_steps=n_steps or sc.n_steps,
        yref=yref, yref_e=yref_e))(jnp.asarray(sc.x0, jnp.float64))
    simX = np.asarray(res.simX)
    simU = np.asarray(res.simU)
    status = np.asarray(res.status)
    assert np.all(np.isfinite(simX)), f"{name}: non-finite states"
    assert np.all(np.isfinite(simU)), f"{name}: non-finite controls"
    conv = float(np.mean(status == 0))
    assert conv >= 0.9, f"{name}: converged frac {conv:.2f} < 0.9"
    return simX, simU, spec


def test_full_scale_acados_speed():
    """u steps from rest toward u_ref = 1.3 (reference usv_acados, N=20).

    The LINEAR_LS cost trades the u error (Q_u = 1e3) against thrust
    magnitude (Q_T = 1e-1 on Tport/Tstbd): near u = 1.25 the drag needs
    Tu ~ 31 N with dTu/du = 25, so the stationary trade-off sits at
    u* = 1.3 - (0.132 * 31.2 * 25) / 2000 ~ 1.2485 — an intentional
    steady-state offset of the reference's weights, not a solver error."""
    simX, _, _ = _run("usv_acados", scenarios.acados_speed_default())
    assert abs(simX[-1, 0] - 1.2485) < 0.01, simX[-1, 0]


def test_full_scale_low_level():
    """psi -> 1.0 rad, u -> 0.8 m/s (reference usv_low_level, N=100)."""
    simX, _, _ = _run("usv_low_level", scenarios.low_level_default())
    assert abs(simX[-1, 0] - 1.0) < 0.05, simX[-1, 0]    # psi
    assert abs(simX[-1, 3] - 0.8) < 0.05, simX[-1, 3]    # u


def test_full_scale_position_control():
    """boat reaches (5, 1) (reference usv_position_control, N=20).

    The 1e5 position weights make this QP ill-conditioned: the fixed
    sigma=0.1 schedule at mu0=1 needs ~30 iterations just to GROW the
    duals to the 1e4-scale active-set multipliers.  The HPIPM-parity
    schedule — Mehrotra predictor-corrector + gradient-scaled initial
    barrier (centering='mehrotra', mu0='auto') — clears the 90%
    convergence bar at the tier-default iteration count (measured 95%
    vs 64% for fixed@18), with no per-variant iteration override."""
    simX, _, _ = _run("usv_position_control",
                      scenarios.position_control_default(),
                      centering="mehrotra", mu0="auto")
    d = np.hypot(simX[-1, 0] - 5.0, simX[-1, 1] - 1.0)
    assert d < 0.5, f"final distance to target {d:.2f}"


def test_full_scale_pf():
    """14-state single-layer path following: ye -> 0, u -> 0.7
    (reference usv_pf, N=100)."""
    simX, _, _ = _run("usv_pf", scenarios.pf_default(), n_steps=1500)
    assert abs(simX[-1, 6]) < 0.1, simX[-1, 6]           # ye
    assert abs(simX[-1, 3] - 0.7) < 0.1, simX[-1, 3]     # u


def test_full_scale_pf_ca():
    """pf + 4 HARD obstacle constraints: track while clearing every
    obstacle (reference usv_pf_ca, N=100)."""
    simX, _, _ = _run("usv_pf_ca", scenarios.pf_ca_default(), n_steps=1500)
    assert abs(simX[-1, 6]) < 0.15, simX[-1, 6]
    sc = scenarios.pf_ca_default()
    pos = simX[:, 10:12]
    obs = np.asarray(sc.params).reshape(4, 2)
    d = np.linalg.norm(pos[:, None, :] - obs[None], axis=-1)
    assert d.min() > 0.5 - 1e-3, f"hard clearance violated: {d.min():.3f}"


@pytest.mark.parametrize("name,factory,ye_idx", [
    ("usv_guidance", scenarios.guidance_default, 7),
    ("usv_guidance2", scenarios.guidance2_default, 8),
    ("usv_guidance3", scenarios.guidance3_default, 8),
])
def test_full_scale_guidance_kinematic(name, factory, ye_idx):
    """Kinematic guidance variants regulate cross-track error to zero on
    their reference segments (N=100, Tf=1)."""
    simX, _, _ = _run(name, factory())
    assert abs(simX[-1, ye_idx]) < 0.1, simX[-1, ye_idx]


@pytest.mark.parametrize("name,factory", [
    ("usv_guidance4", scenarios.guidance4_default),
    ("usv_guidance5", scenarios.guidance5_default),
])
def test_full_scale_guidance_error_model(name, factory):
    """Error-model guidance variants: ye and chie -> 0 (N=100, Tf=1)."""
    simX, _, _ = _run(name, factory())
    assert abs(simX[-1, 2]) < 0.1, simX[-1, 2]           # ye
    assert abs(simX[-1, 3]) < 0.1, simX[-1, 3]           # chie


def test_full_scale_guidance_ca():
    """First CA variant (HARD distance rows, N=100, Tf=5)."""
    simX, _, _ = _run("usv_guidance_ca", scenarios.guidance_ca_default())
    assert abs(simX[-1, 2]) < 0.15, simX[-1, 2]          # ye


def test_full_scale_guidance_ca1():
    """Flagship (soft distance rows, N=100, Tf=5): regulates ye and clears
    the 4 on-path obstacles within the 0.2 m soft band."""
    sc = scenarios.guidance_ca1_default()
    simX, _, _ = _run("usv_guidance_ca1", sc)
    assert abs(simX[-1, 2]) < 0.1, simX[-1, 2]
    pos = simX[:, 5:7]
    obs = np.asarray(sc.params).reshape(8, 2)[:4]
    rad = np.asarray(sc.lh)[:4]
    d = np.linalg.norm(pos[:, None, :] - obs[None], axis=-1) - rad[None]
    assert d.min() > -0.2, f"soft clearance violated: {d.min():.3f}"


def test_full_scale_race_car():
    """Race car at N=50 with the reference's receding progress reference
    (sref = s0 + 3 ramped across the horizon, reference
    scripts/race_cars/main.py:74-83): the car accelerates and makes
    progress while honoring the track-width/accel constraint band."""
    spec = builders.build("race_cars")
    m = spec.model
    solver = RTISolver(spec, ipm_iters=18)
    ny, nx, N = spec.cost.ny, m.nx, spec.N

    def yref_fn(x, k):
        s0 = x[0]
        ramp = s0 + 3.0 * jnp.arange(N) / N
        yref = jnp.zeros((N, ny)).at[:, 0].set(ramp)
        yref_e = jnp.zeros(nx).at[0].set(s0 + 3.0)
        return yref, yref_e

    res = jax.jit(lambda x0: run_closed_loop(
        solver, x0, jnp.zeros(0), n_steps=500,
        yref_fn=yref_fn))(jnp.asarray(m.x0, jnp.float64))
    simX = np.asarray(res.simX)
    status = np.asarray(res.status)
    assert np.all(np.isfinite(simX))
    assert np.mean(status == 0) >= 0.9
    assert simX[-1, 0] > 2.0, f"no racing progress: s={simX[-1, 0]:.2f}"
    assert np.max(simX[:, 3]) > 0.5, "car never accelerated"
    # track width |n| <= 0.12 (soft band ~ slack-priced, allow 20%)
    assert np.max(np.abs(simX[:, 1])) < 0.12 * 1.2
