"""Unit tests for the model zoo: shapes, hand-computed dynamics values, and
Jacobian sanity for every variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.models import registry
from mpc_collisionavoidance_tpu.models import hydro

ALL = registry.names()


@pytest.mark.parametrize("name", ALL)
def test_shapes_and_finiteness(name):
    m = registry.get(name)
    rng = np.random.default_rng(0)
    x = jnp.asarray(m.x0) + 0.01 * rng.standard_normal(m.nx)
    u = jnp.asarray(0.1 * rng.standard_normal(m.nu))
    p = jnp.asarray(100.0 * np.ones(m.np_))
    xdot = m.f(x, u, p)
    assert xdot.shape == (m.nx,)
    assert bool(jnp.all(jnp.isfinite(xdot)))
    if m.h is not None:
        hv = m.h(x, p)
        assert hv.shape == (m.nh,)
        assert bool(jnp.all(jnp.isfinite(hv)))
        J = jax.jacfwd(lambda xx: m.h(xx, p))(x)
        assert J.shape == (m.nh, m.nx)
        assert bool(jnp.all(jnp.isfinite(J)))


@pytest.mark.parametrize("name", ALL)
def test_dynamics_jacobians_finite(name):
    m = registry.get(name)
    rng = np.random.default_rng(1)
    x = jnp.asarray(m.x0) + 0.01 * rng.standard_normal(m.nx)
    u = jnp.asarray(0.1 * rng.standard_normal(m.nu))
    p = jnp.asarray(100.0 * np.ones(m.np_))
    Jx = jax.jacfwd(lambda xx: m.f(xx, u, p))(x)
    Ju = jax.jacfwd(lambda uu: m.f(x, uu, p))(u)
    assert Jx.shape == (m.nx, m.nx) and Ju.shape == (m.nx, m.nu)
    assert bool(jnp.all(jnp.isfinite(Jx))) and bool(jnp.all(jnp.isfinite(Ju)))


def test_guidance_ca1_dynamics_hand_value():
    """Check the flagship dynamics against a hand-evaluated point
    (reference scripts/usv_guidance_ca1/usv_model.py:117-128)."""
    m = registry.get("usv_guidance_ca1")
    u, v, ye, chie, psied, xned, yned, psi = 0.7, 0.1, 0.5, 0.3, 0.2, 1.0, 2.0, 0.4
    U = 0.05
    x = jnp.array([u, v, ye, chie, psied, xned, yned, psi])
    xdot = np.asarray(m.f(x, jnp.array([U]), jnp.zeros(16)))

    beta = np.arctan2(v, u + 0.001)
    psie = chie - beta
    expect = np.array([
        0.0,
        0.0,
        u * np.sin(psie) + v * np.cos(psie),
        (psied - psie) / 1.0,
        U,
        u * np.cos(psi) - v * np.sin(psi),
        u * np.sin(psi) + v * np.cos(psi),
        (psied - psie) / 1.0,
    ])
    np.testing.assert_allclose(xdot, expect, rtol=1e-12)


def test_guidance_ca1_distances():
    m = registry.get("usv_guidance_ca1")
    p = np.arange(16, dtype=float)  # obstacles at (0,1),(2,3),...,(14,15)
    x = np.zeros(8)
    x[5], x[6] = 3.0, 4.0  # (xned, yned)
    d = np.asarray(m.h(jnp.asarray(x), jnp.asarray(p)))
    expect = [np.hypot(3.0 - p[2 * i], 4.0 - p[2 * i + 1]) for i in range(8)]
    np.testing.assert_allclose(d, expect, rtol=1e-12)


def test_hydro_piecewise_drag_switch():
    """Xu/Xuu switch at u = 1.25 (reference scripts/usv_pf_ca/usv_model.py:137-138)."""
    lo = hydro.uvr_dot(jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(0.0),
                       jnp.asarray(0.0), jnp.asarray(0.0))[0]
    hi = hydro.uvr_dot(jnp.asarray(1.3), jnp.asarray(0.0), jnp.asarray(0.0),
                       jnp.asarray(0.0), jnp.asarray(0.0))[0]
    # below the switch: udot = (Xu*u)/ (m - Xu_dot) with Xu=-25
    np.testing.assert_allclose(float(lo), (-25.0 * 1.0) / (30.0 + 2.25), rtol=1e-12)
    # above: Xu=64.55, Xuu=-70.92 -> (64.55*1.3 - 70.92*1.3*1.3)/(32.25)
    np.testing.assert_allclose(
        float(hi), (64.55 * 1.3 - 70.92 * 1.3 * 1.3) / 32.25, rtol=1e-12)


def test_full_model_matches_reference_groupings():
    """usv_acados EOM at a generic point vs an independent numpy transcription
    of reference scripts/usv_acados/usv_model.py:116-122 (c = 0.78)."""
    m = registry.get("usv_acados")
    u, v, r, tp, ts = 0.9, -0.2, 0.3, 5.0, 4.0
    c = 0.78
    xdot = np.asarray(m.f(jnp.array([u, v, r, tp, ts]),
                          jnp.array([1.0, -2.0]), jnp.zeros(0)))
    Xu, Xuu = -25.0, 0.0
    yv_factor = 1.1 + 0.0045 * (1.01 / 0.09) - 0.1 * (0.27 / 0.09) \
        + 0.016 * ((0.27 / 0.09) ** 2)
    Yv = 0.5 * (-40 * 1000 * abs(v)) * yv_factor
    Nr = -0.52 * np.sqrt(u * u + v * v)
    Tu = tp + c * ts
    Tr = (tp - c * ts) * 0.41 / 2
    mref, Iz = 30.0, 4.1
    Xud, Yvd, Yrd, Nvd, Nrd = -2.25, -23.13, -1.31, -16.41, -2.79
    Yvv, Yvr, Nrv, Nrr = -99.99, -5.49, -8.8, -3.49
    du = (Tu - (-mref + 2 * Yvd) * v - (Yrd + Nvd) * r * r
          - (-Xu * u - Xuu * abs(u) * u)) / (mref - Xud)
    dv = (-(mref - Xud) * u * r - (-Yv - Yvv * abs(v) - Yvr * abs(r)) * v) / (mref - Yvd)
    dr = (Tr - (-2 * Yvd * u * v - (Yrd + Nvd) * r * u + Xud * u * r)
          - (-Nr * r - Nrv * abs(v) * r - Nrr * abs(r) * r)) / (Iz - Nrd)
    np.testing.assert_allclose(xdot, [du, dv, dr, 1.0, -2.0], rtol=1e-12)
