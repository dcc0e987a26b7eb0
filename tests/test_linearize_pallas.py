"""Fused Pallas linearization kernel (rollout + VDE Jacobians + constraint
linearization, kernels/linearize_pallas.py) vs the `jax.linearize` lax path
(interpret mode on CPU; the same kernel compiles for real TPU — validated
at N=100 flagship + pf_ca shapes, see docs/PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.kernels.linearize_pallas import (
    LANE_BLOCK, STAGE_BLOCK, linearize_lanes_pallas)
from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.ops import kmath


def _lax_reference(spec, xs, ubar, params):
    """Same math as solver/batch.py::_build_qp's lax linearization path."""
    m = spec.model
    nx, nu = m.nx, m.nu
    h_step = spec.dt / spec.integrator_steps
    dtype = xs.dtype

    def F(xu):
        x, u = xu[:nx], xu[nx:]
        for _ in range(spec.integrator_steps):
            k1 = m.f(x, u, params)
            k2 = m.f(x + 0.5 * h_step * k1, u, params)
            k3 = m.f(x + 0.5 * h_step * k2, u, params)
            k4 = m.f(x + h_step * k3, u, params)
            x = x + (h_step / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return x

    xu = jnp.concatenate([xs, ubar], axis=0)
    xn, lin = jax.linearize(F, xu)
    basis = jnp.broadcast_to(
        jnp.eye(nx + nu, dtype=dtype)[:, :, None, None],
        (nx + nu,) + xu.shape)
    J = jnp.transpose(jax.vmap(lin)(basis), (1, 0, 2, 3))
    if m.nh:
        hbar, linh = jax.linearize(lambda xv: m.h(xv, params), xs)
        basis_x = jnp.broadcast_to(
            jnp.eye(nx, dtype=dtype)[:, :, None, None], (nx,) + xs.shape)
        C = jnp.transpose(jax.vmap(linh)(basis_x), (1, 0, 2, 3))
    else:
        hbar = jnp.zeros((0,) + xs.shape[1:], dtype)
        C = jnp.zeros((0, nx) + xs.shape[1:], dtype)
    return xn, J, hbar, C


def _random_traj(spec, N, L, seed=0, dtype=jnp.float64):
    # f64 in interpret mode: validates kernel math/masking exactly (the
    # hull EOM at random states is stiff enough that f32 op-order noise
    # reaches ~0.3% relative); the compiled f32 kernel was validated on
    # real TPU vs the lax path at N=100 to 2e-7 (docs/PERF.md)
    m = spec.model
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.normal(size=(m.nx, N, L)) * 0.5, dtype)
    ub = jnp.asarray(rng.normal(size=(m.nu, N, L)) * 0.2, dtype)
    params = jnp.asarray(rng.uniform(2.0, 50.0, size=(m.np_, L)), dtype)
    return xs, ub, params


# usv_guidance_ca1: atan2 crab angle + 8 soft distance rows (the flagship);
# usv_pf_ca: 14-state hull with jnp.where piecewise drag + hard rows;
# usv_acados: no params, no h rows (exercises the has_p=False branch)
@pytest.mark.parametrize("name", [
    "usv_guidance_ca1",
    pytest.param("usv_pf_ca", marks=pytest.mark.slow),
    "usv_acados"])
def test_kernel_matches_lax(name):
    spec = getattr(builders, name)(Tf=1.0, N=12)   # 12 % 8 != 0: one
    m = spec.model                                  # masked partial block
    xs, ub, params = _random_traj(spec, N=spec.N, L=LANE_BLOCK,
                                  seed=hash(name) % 1000)
    xn, J, hbar, C = linearize_lanes_pallas(
        xs, ub, params, f=m.f, h=m.h, dt=spec.dt,
        integrator_steps=spec.integrator_steps, nh=m.nh, interpret=True)
    xn_r, J_r, hbar_r, C_r = _lax_reference(spec, xs, ub, params)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xn_r),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hbar), np.asarray(hbar_r),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(C), np.asarray(C_r),
                               rtol=2e-4, atol=2e-5)


def test_multiblock_grid():
    """2 lane blocks x 2 stage blocks: grid boundaries must be invisible."""
    spec = builders.usv_guidance_ca1(Tf=1.0, N=2 * STAGE_BLOCK)
    m = spec.model
    xs, ub, params = _random_traj(spec, N=spec.N, L=2 * LANE_BLOCK, seed=7)
    xn, J, hbar, C = linearize_lanes_pallas(
        xs, ub, params, f=m.f, h=m.h, dt=spec.dt,
        integrator_steps=spec.integrator_steps, nh=m.nh, interpret=True)
    xn_r, J_r, hbar_r, C_r = _lax_reference(spec, xs, ub, params)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(C), np.asarray(C_r),
                               rtol=2e-4, atol=2e-5)


def test_atan2_poly_accuracy():
    """kmath.atan2_poly (the Mosaic-lowerable minimax polynomial that
    unblocks fusing the guidance models' crab angle) vs jnp.arctan2 over
    random points and the axis conventions."""
    rng = np.random.default_rng(0)
    y = rng.standard_normal(20000) * np.exp(rng.uniform(-6, 6, 20000))
    x = rng.standard_normal(20000) * np.exp(rng.uniform(-6, 6, 20000))
    got = np.asarray(kmath.atan2_poly(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    assert np.max(np.abs(got - ref)) < 2e-8   # f64 on CPU tests
    # axes: (0,+x)->0, (0,-x)->pi, (+-y,0)->+-pi/2, (0,0)->0
    pts = [(0.0, 2.0), (0.0, -2.0), (3.0, 0.0), (-3.0, 0.0), (0.0, 0.0)]
    for yy, xx in pts:
        assert float(kmath.atan2_poly(yy, xx)) == pytest.approx(
            float(np.arctan2(yy, xx)), abs=1e-9)


def test_kernel_safe_dispatch():
    """kmath.atan2 is exact outside kernel_safe() and polynomial inside."""
    y, x = jnp.asarray(0.3), jnp.asarray(-0.7)
    exact = kmath.atan2(y, x)
    assert float(exact) == float(jnp.arctan2(y, x))
    with kmath.kernel_safe():
        poly = kmath.atan2(y, x)
    assert float(poly) == pytest.approx(float(exact), abs=1e-8)
    assert not kmath.in_kernel_safe_mode()


def test_lane_engine_with_pallas_linearize():
    """Full LaneRTISolver tick with linearize='pallas_interpret' vs the lax
    linearization: identical controls on the flagship OCP."""
    from mpc_collisionavoidance_tpu.sim import scenarios
    from mpc_collisionavoidance_tpu.solver.batch import (
        LaneRTISolver, to_lanes)

    spec = builders.usv_guidance_ca1(Tf=2.0, N=10)
    sc = scenarios.guidance_ca1_default()
    B = LANE_BLOCK
    x0s = np.broadcast_to(sc.x0, (B, 8)).astype(np.float32)
    xL = to_lanes(jnp.asarray(x0s))
    pL = to_lanes(np.broadcast_to(sc.params, (B, 16)).astype(np.float32))
    lhL = to_lanes(np.broadcast_to(sc.lh, (B, 8)).astype(np.float32))

    outs = {}
    for lin in ("lax", "pallas_interpret"):
        solver = LaneRTISolver(spec, ipm_iters=6, linearize=lin)
        st = solver.init_state(x0s)
        st, out = jax.jit(solver.step_fn)(st, xL, pL, lhL)
        outs[lin] = np.asarray(out.u0)
    np.testing.assert_allclose(outs["pallas_interpret"], outs["lax"],
                               rtol=1e-4, atol=1e-5)


def test_kernel_ragged_lanes():
    """L=1 (single vehicle) and L=3: padded internally to one 128-lane
    block; outputs sliced back to the true lane count."""
    spec = builders.usv_guidance_ca1(Tf=1.0, N=12)
    m = spec.model
    for L in (1, 3):
        xs, ub, params = _random_traj(spec, N=spec.N, L=L, seed=42 + L)
        xn, J, hbar, C = linearize_lanes_pallas(
            xs, ub, params, f=m.f, h=m.h, dt=spec.dt,
            integrator_steps=spec.integrator_steps, nh=m.nh,
            interpret=True)
        xn_r, J_r, hbar_r, C_r = _lax_reference(spec, xs, ub, params)
        assert xn.shape == xn_r.shape and J.shape == J_r.shape
        np.testing.assert_allclose(np.asarray(xn), np.asarray(xn_r),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_r),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(C), np.asarray(C_r),
                                   rtol=2e-4, atol=2e-5)
