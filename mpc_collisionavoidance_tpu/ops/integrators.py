"""Explicit Runge-Kutta shooting integrators.

The reference discretizes each shooting interval with acados' ERK integrator
at its defaults — 4 stages, 1 step per interval (integrator_type="ERK" in
reference scripts/usv_guidance_ca1/acados_settings.py:194) — i.e. one
classical RK4 step of length dt = Tf/N.  We reproduce exactly that scheme;
discrete sensitivities (the role of the CasADi-generated forward VDE,
reference c_generated_code *_vde_forw) are obtained by `jax.jacfwd` of this
step function, which differentiates the same Butcher tableau and therefore
matches the VDE solution to machine precision.
"""


import jax
import jax.numpy as jnp


def rk4_step(f, x, u, p, dt):
    """One classical RK4 step of `xdot = f(x, u, p)` (zero-order-hold on u)."""
    k1 = f(x, u, p)
    k2 = f(x + 0.5 * dt * k1, u, p)
    k3 = f(x + 0.5 * dt * k2, u, p)
    k4 = f(x + dt * k3, u, p)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def make_discrete_dynamics(f, dt, num_steps: int = 1):
    """Return F(x, u, p) advancing one shooting interval of length `dt`.

    `num_steps` subdivides the interval (acados sim_method_num_steps; the
    reference keeps the default 1).
    """
    h = dt / num_steps

    def F(x, u, p):
        for _ in range(num_steps):
            x = rk4_step(f, x, u, p, h)
        return x

    return F


def make_discrete_dynamics_with_sens(f, dt, num_steps: int = 1):
    """Return G(x, u, p) -> (x_next, A, B): the discrete step and its exact
    Jacobians d x_next/dx (nx, nx) and d x_next/du (nx, nu).

    This replaces the reference's generated forward-VDE C functions
    (external_function_param_casadi in reference src/nmpc_guidance_ca1.cpp:52).
    A single `jacfwd` over the concatenated (x, u) input shares the RK stage
    evaluations between both Jacobians.
    """
    F = make_discrete_dynamics(f, dt, num_steps)

    def G(x, u, p):
        nx = x.shape[-1]

        def F_wu(xu):
            return F(xu[:nx], xu[nx:], p)

        xu = jnp.concatenate([x, u])
        x_next = F(x, u, p)
        J = jax.jacfwd(F_wu)(xu)
        return x_next, J[:, :nx], J[:, nx:]

    return G
