"""Synthetic track geometry + curved-track race-car closed loop.

Covers the reference's track machinery (getTrack table + kapparef_s
bspline inside the dynamics + time2spatial transforms, reference
scripts/race_cars/bycicle_model.py:46-55, time2spatial.py:40-99) that the
straight-track smoke tests never exercise: with real curvature the
track-width and lateral-acceleration constraints go ACTIVE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.utils import track as trk


def test_track_table_consistency():
    """The synthetic table is a closed C1 loop: psi advances exactly 2*pi,
    position closes, and x'/y' match cos/sin psi."""
    t = trk.make_synthetic_track()
    ds = t.length / len(t.s0)
    assert np.isclose(t.psiref[0], 0.0)
    # closure: one more step past the last sample lands at the start
    x_end = t.xref[-1] + np.cos(t.psiref[-1]) * ds
    y_end = t.yref[-1] + np.sin(t.psiref[-1]) * ds
    psi_end = t.psiref[-1] + t.kapparef[-1] * ds
    assert abs(x_end - t.xref[0]) < 1e-6
    assert abs(y_end - t.yref[0]) < 1e-6
    assert abs(psi_end - 2 * np.pi) < 0.05
    # tangent consistency at interior samples
    dx = np.diff(t.xref) / ds
    dy = np.diff(t.yref) / ds
    err = np.hypot(dx - np.cos(t.psiref[:-1]), dy - np.sin(t.psiref[:-1]))
    assert np.max(err) < 0.2    # linear drift removal allows small slack
    # curvature is non-trivial and sign-changing (chicane)
    assert t.kapparef.max() > 1.0 and t.kapparef.min() < -0.2


def test_kappa_interpolant():
    """Catmull-Rom hits the knots exactly, is periodic, and is finite on
    dense/batched/lane-shaped inputs."""
    t = trk.make_synthetic_track()
    kfn = trk.make_kappa_fn(t)
    at_knots = np.asarray(kfn(jnp.asarray(t.s0)))
    assert np.allclose(at_knots, t.kapparef, atol=1e-9)
    # periodicity: s + length and s - length give the same kappa
    s = jnp.linspace(0.0, t.length, 257)
    assert np.allclose(np.asarray(kfn(s + t.length)), np.asarray(kfn(s)),
                       atol=1e-9)
    assert np.allclose(np.asarray(kfn(s - t.length)), np.asarray(kfn(s)),
                       atol=1e-9)
    # lane-engine shape (N, L)
    sNL = jnp.broadcast_to(s[:16][:, None], (16, 8))
    assert np.all(np.isfinite(np.asarray(kfn(sNL))))


def test_frenet_roundtrip():
    """orig2proj(proj2orig(s, n)) recovers (s, n, alpha) for offsets within
    the track band."""
    t = trk.make_synthetic_track()
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.uniform(0, t.length, 64))
    n = jnp.asarray(rng.uniform(-0.1, 0.1, 64))
    alpha = jnp.asarray(rng.uniform(-0.5, 0.5, 64))
    x, y, psi, _ = jax.vmap(
        lambda si, ni, ai: trk.transform_proj2orig(t, si, ni, ai))(
            s, n, alpha)
    s2, n2, a2, _ = jax.vmap(
        lambda xi, yi, pi: trk.transform_orig2proj(t, xi, yi, pi))(
            x, y, psi)
    # arc-length wraps at the seam: compare circular distance
    ds = np.minimum(np.abs(np.asarray(s2 - s)),
                    t.length - np.abs(np.asarray(s2 - s)))
    assert np.max(ds) < 0.02
    assert np.max(np.abs(np.asarray(n2 - n))) < 0.02
    assert np.max(np.abs(np.asarray(a2 - alpha))) < 0.05


@pytest.mark.slow
def test_race_car_curved_track_closed_loop():
    """Full race on the synthetic circuit (N=50, receding progress
    reference): the car completes a lap; the track-width and lateral-
    acceleration constraints go ACTIVE and are honored within the soft
    band (reference bycicle_model.py:113-167 constraint set)."""
    from mpc_collisionavoidance_tpu.ocp import builders
    from mpc_collisionavoidance_tpu.sim.closed_loop import run_closed_loop
    from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver

    t = trk.make_synthetic_track()
    spec = builders.build("race_cars", track=t)
    m = spec.model
    solver = RTISolver(spec, ipm_iters=18)
    ny, nx, N = spec.cost.ny, m.nx, spec.N

    def yref_fn(x, k):
        s0 = x[0]
        ramp = s0 + 3.0 * jnp.arange(N) / N
        yref = jnp.zeros((N, ny)).at[:, 0].set(ramp)
        yref_e = jnp.zeros(nx).at[0].set(s0 + 3.0)
        return yref, yref_e

    x0 = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float64)
    res = jax.jit(lambda x: run_closed_loop(
        solver, x, jnp.zeros(0), n_steps=700, yref_fn=yref_fn))(x0)
    simX = np.asarray(res.simX)
    status = np.asarray(res.status)
    assert np.all(np.isfinite(simX))
    assert np.mean(status == 0) >= 0.9
    # completes at least one full lap
    assert simX[-1, 0] > t.length, f"s final {simX[-1, 0]:.2f} < lap"
    # constraints go active: the car actually uses the track width...
    n_max = np.max(np.abs(simX[:, 1]))
    assert n_max > 0.05, f"track width never exercised (|n| max {n_max:.3f})"
    # ...but honors it within the soft band (zl-priced slack)
    assert n_max < 0.12 * 1.25, f"|n| max {n_max:.3f} blew the band"
    # lateral acceleration reaches a meaningful fraction of the 4 m/s^2
    # bound in the turns and never exceeds it beyond the slack band
    C2, C1, mcar = 15.5, 0.5, 0.043
    Cm1, Cm2, Cr0, Cr2 = 0.28, 0.05, 0.011, 0.006
    v, D, delta = simX[:, 3], simX[:, 4], simX[:, 5]
    Fxd = (Cm1 - Cm2 * v) * D - Cr2 * v * v - Cr0 * np.tanh(5 * v)
    a_lat = C2 * v * v * delta + Fxd * np.sin(C1 * delta) / mcar
    assert np.max(np.abs(a_lat)) > 1.0, "a_lat constraint never stressed"
    assert np.max(np.abs(a_lat)) < 4.0 * 1.25

    # Cartesian reconstruction of the raced line stays near the centerline
    xs, ys, _, _ = jax.vmap(
        lambda si, ni: trk.transform_proj2orig(t, si, ni))(
            jnp.asarray(simX[:, 0]), jnp.asarray(simX[:, 1]))
    assert np.all(np.isfinite(np.asarray(xs)))
    assert np.all(np.isfinite(np.asarray(ys)))
