"""Parallel-in-horizon Riccati: `lqr_solve_lanes` at O(log N) depth.

The sequential Riccati sweep (`ops/riccati_lanes.py`) is the lane engine's
critical path: 2N dependent steps per IPM iteration regardless of batch
size.  This module re-solves the SAME stagewise LQR with two
`jax.lax.associative_scan`s (the temporal-parallelization construction of
Särkkä & García-Fernández for LQT — SURVEY.md section 5 calls this the
"ring-attention analog" of horizon scaling):

1.  Each stage k becomes a *conditional value function element*
    e_k = (A, b, C, eta, J) encoding

        V_k(x_k, x_{k+1}) = max_l [ l^T (x_{k+1} - A x_k - b) - l^T C l/2 ]
                            + x_k^T J x_k / 2 - eta^T x_k

    (controls eliminated; derivation in `_leaf`).  Elements combine
    associatively over adjacent intervals via resolvents (I + C J)^{-1};
    a REVERSE associative scan with the terminal element appended yields
    every cost-to-go V_k(x) = x^T J x / 2 - eta^T x in ceil(log2 N)
    levels.
2.  The optimal policy then makes the closed-loop dynamics affine,
    dx_{k+1} = M_k dx_k + m_k, and affine maps compose associatively —
    a FORWARD associative scan produces the whole state trajectory; the
    controls follow elementwise.

Requires R_k to be positive definite (true inside the IPM: the barrier
adds positive diagonal to every bounded input).  Total work is ~2x the
sequential sweep, but depth drops from 2N to ~2 log2 N — the winning
trade whenever the horizon scan is latency-bound rather than FLOP-bound.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_collisionavoidance_tpu.ops import lanes as ln
from mpc_collisionavoidance_tpu.ops.riccati_lanes import LaneLQR


class _Elems(NamedTuple):
    A: jnp.ndarray     # (N', nx, nx, L)
    b: jnp.ndarray     # (N', nx, L)
    C: jnp.ndarray     # (N', nx, nx, L)
    eta: jnp.ndarray   # (N', nx, L)
    J: jnp.ndarray     # (N', nx, nx, L)


def _combine(e_i: _Elems, e_j: _Elems) -> _Elems:
    """Associative combination of time-adjacent elements (e_i earlier).

    Vectorized over the leading stage axis by associative_scan; all ops
    are stagewise lane algebra."""
    nx = e_i.A.shape[1]
    eye = jnp.eye(nx, dtype=e_i.A.dtype)[None, :, :, None]

    # Z1 = (I + C_i J_j)^-1 applied from the left
    M1 = eye + jnp.einsum("kabl,kbcl->kacl", e_i.C, e_j.J)
    ZA = jax.vmap(ln.ge_solve_mat)(M1, e_i.A)              # Z1 A_i
    Zb = jax.vmap(ln.ge_solve_mat)(
        M1, (e_i.b + jnp.einsum("kabl,kbl->kal", e_i.C, e_j.eta))[:, :, None, :]
    )[:, :, 0, :]                                          # Z1 (b_i + C_i eta_j)
    ZC = jax.vmap(ln.ge_solve_mat)(M1, e_i.C)              # Z1 C_i

    A = jnp.einsum("kabl,kbcl->kacl", e_j.A, ZA)
    b = jnp.einsum("kabl,kbl->kal", e_j.A, Zb) + e_j.b
    C = (jnp.einsum("kabl,kbcl,kdcl->kadl", e_j.A, ZC, e_j.A) + e_j.C)

    # Z2 = (I + J_j C_i)^-1
    M2 = eye + jnp.einsum("kabl,kbcl->kacl", e_j.J, e_i.C)
    rhs = (e_j.eta - jnp.einsum("kabl,kbl->kal", e_j.J, e_i.b))[:, :, None, :]
    Zeta = jax.vmap(ln.ge_solve_mat)(M2, rhs)[:, :, 0, :]
    ZJ = jax.vmap(ln.ge_solve_mat)(M2, jnp.einsum(
        "kabl,kbcl->kacl", e_j.J, e_i.A))

    eta = jnp.einsum("kbal,kbl->kal", e_i.A, Zeta) + e_i.eta
    J = jnp.einsum("kbal,kbcl->kacl", e_i.A, ZJ) + e_i.J
    J = 0.5 * (J + jnp.swapaxes(J, 1, 2))
    return _Elems(A=A, b=b, C=C, eta=eta, J=J)


def lqr_solve_pscan(d: LaneLQR):
    """Drop-in equivalent of `lqr_solve_lanes` (same LaneLQR input, same
    (dx, du) output) with O(log N) sequential depth. Needs R > 0."""
    N, nx, nu, L = d.B.shape[0], d.A.shape[1], d.B.shape[2], d.B.shape[-1]
    dtype = d.A.dtype

    # ---- leaf elements: eliminate u from each stage ----
    def leaf(A, B, c, Q, S, R, qx, qu):
        Rf = ln.chol_factor(R)
        RiS = ln.chol_solve_mat(Rf, S)                  # R^-1 S   (nu, nx, L)
        Riqu = ln.chol_solve_vec(Rf, qu)                # R^-1 qu  (nu, L)
        RiBt = ln.chol_solve_mat(Rf, ln.transpose(B))   # R^-1 B^T (nu, nx, L)
        At = A - ln.mm(B, RiS)
        bt = c - ln.mv(B, Riqu)
        Ct = ln.mm(B, RiBt)
        Jt = Q - ln.mtm(S, RiS)
        et = ln.mtv(S, Riqu) - qx
        return At, bt, Ct, et, Jt

    At, bt, Ct, et, Jt = jax.vmap(leaf)(
        d.A, d.B, d.c, d.Q[:-1], d.S, d.R, d.qx[:-1], d.qu)

    # terminal element: pure state cost, no transition
    zA = jnp.zeros((1, nx, nx, L), dtype)
    elems = _Elems(
        A=jnp.concatenate([At, zA], axis=0),
        b=jnp.concatenate([bt, jnp.zeros((1, nx, L), dtype)], axis=0),
        C=jnp.concatenate([Ct, zA], axis=0),
        eta=jnp.concatenate([et, -d.qx[-1:None]], axis=0),
        J=jnp.concatenate([Jt, d.Q[-1:None]], axis=0),
    )

    # ---- reverse scan: suffix elements give cost-to-go at every stage ----
    # (reverse=True scans the flipped sequence, so the operator sees
    # (later-accumulation, earlier-element) — swap into _combine's
    # (earlier, later) convention)
    suf = jax.lax.associative_scan(lambda a, b: _combine(b, a), elems,
                                   reverse=True, axis=0)
    # V_{k+1}(x) = x^T J x / 2 - eta^T x, for k = 0..N-1
    Jv = suf.J[1:]
    ev = suf.eta[1:]

    # ---- per-stage feedback from the cost-to-go ----
    # Huu = R + B^T J' B ; K = -Huu^-1 (B^T J' A + S) ; feedforward uses
    # B^T (J' c - eta') + qu
    def gains(A, B, c, S, R, qu_l, Jn, en):
        JnB = ln.mm(Jn, B)                                 # (nx, nu, L)
        Huu = R + ln.mtm(B, JnB)
        Hux = S + ln.mtm(B, ln.mm(Jn, A))
        hu = qu_l + ln.mtv(B, ln.mv(Jn, c) - en)
        Hf = ln.chol_factor(Huu)
        K = ln.chol_solve_mat(Hf, Hux)                     # (nu, nx, L)
        kff = ln.chol_solve_vec(Hf, hu)                    # (nu, L)
        M = A - ln.mm(B, K)
        m = c - ln.mv(B, kff)
        return K, kff, M, m

    K, kff, M, m = jax.vmap(gains)(d.A, d.B, d.c, d.S, d.R, d.qu, Jv, ev)

    # ---- forward scan: affine-map composition gives the trajectory ----
    def aff_combine(f, g):
        # f earlier, g later: x -> Mg (Mf x + mf) + mg
        Mf, mf = f
        Mg, mg = g
        return (jnp.einsum("kabl,kbcl->kacl", Mg, Mf),
                jnp.einsum("kabl,kbl->kal", Mg, mf) + mg)

    Ms, ms = jax.lax.associative_scan(aff_combine, (M, m), axis=0)
    # dx_{k+1} = Ms_k dx0 + ms_k
    dx_rest = (jnp.einsum("kabl,bl->kal", Ms, d.dx0) + ms)  # (N, nx, L)
    dx = jnp.concatenate([d.dx0[None], dx_rest], axis=0)

    du = -(ln.smv(K, dx[:-1]) + kff)
    return dx, du
