"""Lane-batched Riccati LQR solve (`ops/riccati.py` in the lane layout).

Identical math to :func:`mpc_collisionavoidance_tpu.ops.riccati.lqr_solve`
but every stage tensor carries the instance batch on the minor-most lane
axis: A (N, nx, nx, L), etc.  The backward/forward sweeps are `lax.scan`s
whose bodies are unrolled broadcast FMAs over the tiny state dims — full
VPU lane utilization at any batch size.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_collisionavoidance_tpu.ops import lanes as ln


class LaneLQR(NamedTuple):
    A: jnp.ndarray    # (N, nx, nx, L)
    B: jnp.ndarray    # (N, nx, nu, L)
    c: jnp.ndarray    # (N, nx, L)
    Q: jnp.ndarray    # (N+1, nx, nx, L)
    S: jnp.ndarray    # (N, nu, nx, L)
    R: jnp.ndarray    # (N, nu, nu, L)
    qx: jnp.ndarray   # (N+1, nx, L)
    qu: jnp.ndarray   # (N, nu, L)
    dx0: jnp.ndarray  # (nx, L)


def lqr_solve_lanes(d: LaneLQR):
    """Returns (dx (N+1, nx, L), du (N, nu, L))."""

    def backward(carry, stage):
        P, p = carry
        A, B, c, Q, S, R, qx, qu = stage
        PA = ln.mm(P, A)                     # (nx, nx, L)
        PB = ln.mm(P, B)                     # (nx, nu, L)
        Pc_p = ln.mv(P, c) + p               # (nx, L)
        Huu = R + ln.mtm(B, PB)              # (nu, nu, L)
        Hux = S + ln.mtm(B, PA)              # (nu, nx, L)
        hu = qu + ln.mtv(B, Pc_p)            # (nu, L)
        Lf = ln.chol_factor(Huu)
        K = -ln.chol_solve_mat(Lf, Hux)      # (nu, nx, L)
        kff = -ln.chol_solve_vec(Lf, hu)     # (nu, L)
        P_new = ln.sym(Q + ln.mtm(A, PA) + ln.mtm(Hux, K))
        p_new = qx + ln.mtv(A, Pc_p) + ln.mtv(Hux, kff)
        return (P_new, p_new), (K, kff)

    init = (d.Q[-1], d.qx[-1])
    stages = (d.A, d.B, d.c, d.Q[:-1], d.S, d.R, d.qx[:-1], d.qu)
    _, (Ks, kffs) = jax.lax.scan(backward, init, stages, reverse=True)

    def forward(dx, stage):
        A, B, c, K, kff = stage
        du = ln.mv(K, dx) + kff
        dx_next = ln.mv(A, dx) + ln.mv(B, du) + c
        return dx_next, (dx, du)

    dx_N, (dxs, dus) = jax.lax.scan(forward, d.dx0, (d.A, d.B, d.c, Ks, kffs))
    dx_all = jnp.concatenate([dxs, dx_N[None]], axis=0)
    return dx_all, dus
