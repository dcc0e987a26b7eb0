"""Kernel-safe transcendental math for Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) cannot lower the `atan`/`atan2`
primitives (verified on this image: `NotImplementedError: Unimplemented
primitive ... atan2`), but every guidance-family model evaluates a crab
angle `beta = atan2(v, u + 0.001)` inside its dynamics (reference
`scripts/usv_guidance_ca1/usv_model.py:117`), which is why the
linearization could not be fused into a kernel before.  This module
removes that blocker:

- :func:`atan2_poly` — branch-free polynomial `atan2` built from
  `abs/min/max/where/mul/add/div` only (all Mosaic-lowerable).  The core
  is a degree-8-in-t^2 minimax polynomial of `atan(t)/t` on t in [0, 1]
  (octant range reduction), max absolute error 5.8e-9 in float64 — below
  float32 resolution, so inside an f32 kernel the approximation error is
  dominated by rounding (measured < 3e-7 vs `jnp.arctan2`).
- :func:`atan2` — the dispatcher the model zoo calls: `jnp.arctan2`
  (exact, XLA) by default, the polynomial when tracing inside a kernel
  (enabled with :func:`kernel_safe`).

The switch is trace-time state, not runtime state: `kernel_safe()` is
entered while Pallas traces the kernel body, so the polynomial is baked
into the kernel and the exact primitive everywhere else.
"""

import contextlib
import threading

import jax.numpy as jnp

# minimax fit of atan(t)/t as a polynomial in t^2 on [0, 1] (weighted-
# equalized LSQ, 20001 Chebyshev nodes); max |atan error| = 5.8e-9
_ATAN_COEFFS = (
    +9.999998864e-01,
    -3.333259694e-01,
    +1.998590519e-01,
    -1.416121876e-01,
    +1.049891136e-01,
    -7.234792825e-02,
    +3.978054290e-02,
    -1.440097712e-02,
    +2.456636760e-03,
)

_state = threading.local()


@contextlib.contextmanager
def kernel_safe():
    """Trace-time switch: inside this context, :func:`atan2` evaluates the
    Mosaic-lowerable polynomial instead of the `atan2` primitive."""
    prev = getattr(_state, "kernel_safe", False)
    _state.kernel_safe = True
    try:
        yield
    finally:
        _state.kernel_safe = prev


def in_kernel_safe_mode() -> bool:
    return getattr(_state, "kernel_safe", False)


def _atan_unit(t):
    """atan(t) for t in [0, 1] (Horner in s = t^2)."""
    s = t * t
    acc = jnp.asarray(_ATAN_COEFFS[-1], t.dtype)
    for c in reversed(_ATAN_COEFFS[:-1]):
        acc = acc * s + c
    return t * acc


def atan2_poly(y, x):
    """Branch-free polynomial atan2 (Mosaic-lowerable ops only).

    Octant reduction: a = atan(min|.| / max|.|) in [0, pi/4], reflected
    across pi/2 when |y| > |x|, across pi when x < 0, and sign-flipped
    with y.  Matches `jnp.arctan2` conventions on the axes:
    (0, +x) -> 0, (0, -x) -> pi, (+-y, 0) -> +-pi/2, (0, 0) -> 0.
    """
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    dtype = jnp.result_type(y, x)
    y = y.astype(dtype)
    x = x.astype(dtype)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    tiny = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-30, dtype)
    t = lo / jnp.maximum(hi, tiny)
    a = _atan_unit(t)
    half_pi = jnp.asarray(jnp.pi / 2, dtype)
    pi = jnp.asarray(jnp.pi, dtype)
    a = jnp.where(ay > ax, half_pi - a, a)
    a = jnp.where(x < 0, pi - a, a)
    return jnp.where(y < 0, -a, a)


def atan2(y, x):
    """`jnp.arctan2` outside kernels, :func:`atan2_poly` inside
    :func:`kernel_safe` tracing contexts.  The model zoo's dynamics call
    THIS so the same model function is traceable both by XLA (exact) and
    by Mosaic (polynomial, < f32 resolution error)."""
    if in_kernel_safe_mode():
        return atan2_poly(y, x)
    return jnp.arctan2(y, x)
