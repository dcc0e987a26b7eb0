"""usv_pf_ca reference scenario: the full 14-state hydrodynamic hull
driving thrusters directly, path following with 4 hard obstacle
constraints (reference scripts/usv_pf_ca/main.py:73-116)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.sim.closed_loop import run_closed_loop
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver

# pf_ca state layout: (psi, sinpsi, cospsi, u, v, r, ye, x1, y1, ak,
#                      nedx, nedy, Tport, Tstbd)
IYE, INEDX, INEDY = 6, 10, 11


def test_pf_ca_tracks_and_avoids():
    """Reduced-horizon version of the reference experiment: from the
    origin, converge to the x = 4 line and clear the four r = 0.5 buoys
    with the full hull + thrust dynamics in the loop."""
    spec = builders.usv_pf_ca(Tf=1.0, N=50)
    solver = RTISolver(spec, ipm_iters=12)
    sc = scenarios.pf_ca_default()
    yref = jnp.broadcast_to(jnp.asarray(sc.yref), (spec.N, 16))

    res = jax.jit(lambda x, p, lh: run_closed_loop(
        solver, x, p, lh, n_steps=1500, err_idx=(0, IYE),
        transient=800, metric_norm=700.0,
        yref=yref, yref_e=jnp.asarray(sc.yref_e)))(
        jnp.asarray(sc.x0), jnp.asarray(sc.params), jnp.asarray(sc.lh))

    simX = np.asarray(res.simX)
    assert np.all(np.isfinite(simX))
    # real progress north along the path
    assert simX[-1, INEDY] > 8.0, simX[-1, [INEDX, INEDY]]
    # cruises at the commanded 0.7 m/s between maneuvers
    assert abs(float(np.median(simX[800:, 3])) - 0.7) < 0.05
    # cross-track MAE bounded (buoys sit ON the path: maneuvers included)
    assert float(res.ye_mae) < 1.0, float(res.ye_mae)
    # hard constraints: distance to every buoy >= its radius (no soft band)
    pos = simX[:, [INEDX, INEDY]]
    for i in range(4):
        ox, oy = sc.params[2 * i], sc.params[2 * i + 1]
        dmin = float(np.min(np.hypot(pos[:, 0] - ox, pos[:, 1] - oy)))
        assert dmin > float(sc.lh[i]) - 5e-2, (i, dmin)
    # thrust states stay inside the box (Tport in [-30, 36.5], pf bounds)
    assert np.all(simX[:, 12] <= 36.5 + 1e-3)
    assert np.all(simX[:, 12] >= -30.0 - 1e-3)
    # solver healthy
    status = np.asarray(res.status)
    assert np.all(status != 2)
    assert np.mean(status == 0) > 0.8, np.mean(status == 0)


def test_acados_speed_nmpc_reaches_reference():
    """The velocity/thrust NMPC (N6) must accelerate the 5-state hull model
    from rest to u_ref = 1.3 m/s under its thrust-rate bounds."""
    spec = builders.usv_acados()                 # Tf=1, N=20
    solver = RTISolver(spec, ipm_iters=10)
    sc = scenarios.acados_speed_default()
    yref = jnp.broadcast_to(jnp.asarray(sc.yref), (spec.N, 7))

    res = jax.jit(lambda x: run_closed_loop(
        solver, x, jnp.zeros(0), n_steps=400, err_idx=(0, 1),
        transient=200, metric_norm=200.0,
        yref=yref, yref_e=jnp.asarray(sc.yref_e)))(jnp.asarray(sc.x0))
    simX = np.asarray(res.simX)
    assert np.all(np.isfinite(simX))
    # converges toward the commanded 1.3 m/s but settles just under the
    # piecewise-drag cliff at u = 1.25 (Xu/Xuu jump there, reference
    # scripts/usv_pf_ca/usv_model.py:137-138) where added drag outweighs
    # the quadratic tracking cost — the same equilibrium the reference
    # physics produces
    assert 1.2 < float(simX[-1, 0]) < 1.35, simX[-1, 0]
    # thrust states respect [-30, 35] (usv_acados bounds)
    assert np.all(simX[:, 3] <= 35.0 + 1e-3)
    assert np.all(simX[:, 3] >= -30.0 - 1e-3)


def test_pf_path_following_no_obstacles():
    """usv_pf (N8 single-layer path following): full hull drives thrusters
    to converge onto the x = 4 line at 0.7 m/s."""
    spec = builders.usv_pf(Tf=1.0, N=50)
    solver = RTISolver(spec, ipm_iters=10)
    sc = scenarios.pf_default()
    yref = jnp.broadcast_to(jnp.asarray(sc.yref), (spec.N, 16))

    res = jax.jit(lambda x: run_closed_loop(
        solver, x, jnp.zeros(0), n_steps=1200, err_idx=(0, IYE),
        transient=700, metric_norm=500.0,
        yref=yref, yref_e=jnp.asarray(sc.yref_e)))(jnp.asarray(sc.x0))
    simX = np.asarray(res.simX)
    assert np.all(np.isfinite(simX))
    assert abs(float(simX[-1, IYE])) < 0.1, simX[-1, IYE]          # on path
    assert abs(float(np.median(simX[700:, 3])) - 0.7) < 0.05       # cruise
    assert float(res.ye_mae) < 0.2


def test_guidance_ca_jerk_variant_scenario():
    """usv_guidance_ca (N15): 9-state jerk-input guidance with HARD
    distance rows and runtime lh = radius + 0.2 (reference
    scripts/usv_guidance_ca/main.py:73-122)."""
    spec = builders.usv_guidance_ca(Tf=5.0, N=50)
    solver = RTISolver(spec, ipm_iters=12)
    sc = scenarios.guidance_ca_default()

    res = jax.jit(lambda x, p, lh: run_closed_loop(
        solver, x, p, lh, n_steps=800, err_idx=(3, 2),
        transient=400, metric_norm=400.0))(
        jnp.asarray(sc.x0), jnp.asarray(sc.params), jnp.asarray(sc.lh))
    simX = np.asarray(res.simX)
    assert np.all(np.isfinite(simX))
    # converges toward the path (state layout: u,v,ye,chie,psied,x,y,psi,pdd)
    assert abs(float(simX[-1, 2])) < 0.3, simX[-1, 2]
    # hard clearance: never inside lh = 0.7 of any real obstacle
    pos = simX[:, 5:7]
    for i in range(4):
        ox, oy = sc.params[2 * i], sc.params[2 * i + 1]
        dmin = float(np.min(np.hypot(pos[:, 0] - ox, pos[:, 1] - oy)))
        assert dmin > 0.7 - 5e-2, (i, dmin)
    assert np.all(np.asarray(res.status) != 2)
