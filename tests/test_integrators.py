"""RK4 integrator + sensitivity tests against analytic solutions."""

import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.ops import integrators


def test_rk4_linear_system_exact_order():
    """On xdot = a*x the RK4 step must match the 4th-order Taylor expansion
    of exp(a*dt) exactly."""
    a = -1.7

    def f(x, u, p):
        return a * x

    dt = 0.05
    x0 = jnp.array([2.0])
    x1 = integrators.rk4_step(f, x0, jnp.zeros(0), jnp.zeros(0), dt)
    z = a * dt
    taylor4 = 1 + z + z**2 / 2 + z**3 / 6 + z**4 / 24
    np.testing.assert_allclose(float(x1[0]), 2.0 * taylor4, rtol=1e-14)


def test_rk4_convergence_order():
    """Halving dt must cut the global error ~16x on a smooth nonlinear ODE."""

    def f(x, u, p):
        return jnp.sin(x) + u

    u = jnp.array([0.3])
    p = jnp.zeros(0)
    x0 = jnp.array([0.5])

    def integrate(n_steps, T=1.0):
        F = integrators.make_discrete_dynamics(
            lambda x, uu, pp: f(x, uu[0], pp), T, num_steps=n_steps)
        return F(x0, u, p)

    ref = integrate(512)
    e1 = abs(float(integrate(8)[0] - ref[0]))
    e2 = abs(float(integrate(16)[0] - ref[0]))
    assert e1 / e2 > 12.0  # ~16 for order 4


def test_sensitivities_match_finite_differences():
    from mpc_collisionavoidance_tpu.models import registry

    m = registry.get("usv_guidance_ca1")
    G = integrators.make_discrete_dynamics_with_sens(m.f, 0.05)
    rng = np.random.default_rng(3)
    x = jnp.asarray(m.x0 + 0.1 * rng.standard_normal(m.nx))
    u = jnp.asarray(0.1 * rng.standard_normal(m.nu))
    p = jnp.asarray(np.full(16, 100.0))
    xn, A, B = G(x, u, p)
    assert xn.shape == (m.nx,) and A.shape == (m.nx, m.nx) and B.shape == (m.nx, m.nu)

    eps = 1e-6
    for j in range(m.nx):
        dxj = np.zeros(m.nx); dxj[j] = eps
        fd = (G(x + dxj, u, p)[0] - G(x - dxj, u, p)[0]) / (2 * eps)
        np.testing.assert_allclose(np.asarray(A[:, j]), np.asarray(fd),
                                   rtol=1e-5, atol=1e-8)
    for j in range(m.nu):
        duj = np.zeros(m.nu); duj[j] = eps
        fd = (G(x, u + duj, p)[0] - G(x, u - duj, p)[0]) / (2 * eps)
        np.testing.assert_allclose(np.asarray(B[:, j]), np.asarray(fd),
                                   rtol=1e-5, atol=1e-8)


def test_substep_integration():
    def f(x, u, p):
        return -x

    F1 = integrators.make_discrete_dynamics(f, 0.4, num_steps=1)
    F4 = integrators.make_discrete_dynamics(f, 0.4, num_steps=4)
    x0 = jnp.array([1.0])
    exact = np.exp(-0.4)
    assert abs(float(F4(x0, jnp.zeros(0), jnp.zeros(0))[0]) - exact) < \
        abs(float(F1(x0, jnp.zeros(0), jnp.zeros(0))[0]) - exact)
