"""Angle helpers shared by models, guidance and sims.

The reference wraps angles with the idiom
``if |a| > pi: a = sign(a) * (|a| - 2*pi)`` (e.g. reference
src/nmpc_guidance_ca1.cpp:497-501, 588-592).  That idiom is exactly a wrap to
(-pi, pi] for inputs in (-3*pi, 3*pi); we provide both the exact reference
idiom (for bit-level parity in single steps) and a total wrap that is safe for
any magnitude.
"""

import jax.numpy as jnp


def wrap_once(a):
    """One-shot wrap as written in the reference C++ nodes.

    Mirrors ``if (fabs(a) > M_PI) a = (a/fabs(a)) * (fabs(a) - 2*M_PI)``
    (reference src/nmpc_guidance_ca1.cpp:497-501).  Only correct for
    |a| < 3*pi, like the original.
    """
    return jnp.where(jnp.abs(a) > jnp.pi, jnp.sign(a) * (jnp.abs(a) - 2.0 * jnp.pi), a)


def ssa(a):
    """Smallest signed angle: total wrap of `a` into [-pi, pi)."""
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi
