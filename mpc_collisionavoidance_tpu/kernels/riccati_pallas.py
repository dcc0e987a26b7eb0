"""Fused Riccati LQR sweep as a single Pallas TPU kernel.

Drop-in replacement for `ops.riccati_lanes.lqr_solve_lanes`: identical math
(backward Riccati factor/solve + forward rollout), but the whole recursion
over N stages runs inside ONE kernel program per 128-lane block, with the
entire stage-structured QP resident in VMEM.

Why this wins over the lax.scan version: the scan emits ~40 small HLO ops
per stage per sweep; at N = 100 stages that is thousands of sequential
dispatches on (8, 8, L) operands whose per-op overhead dwarfs the
arithmetic (the arithmetic is ~100 FLOPs/lane/stage).  Here the stage loop
is a `fori_loop` INSIDE the kernel: no dispatch overhead, no HBM round
trips for the carry, full-width VPU lanes throughout — the same argument
BLASFEO makes for the reference on CPU caches (SURVEY.md N3), transplanted
to VMEM.

VMEM budget: a 128-lane block of the flagship QP (nx = 8, nu = 1,
N = 100) is ~8.3 MB of inputs (double-buffered by the pipeline: ~17 MB)
+ ~1 MB outputs/scratch.  That exceeds the compiler's default 16 MB
scoped-VMEM limit but sits comfortably inside the v5e core's 128 MB VMEM,
so the call raises `vmem_limit_bytes` to the block's actual need; the
nx = 14 full hull at N = 100 (~47 MB double-buffered) also fits (see
`fits_vmem`).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 128


def pad_lanes(x, target_l):
    """Pad the minor-most (lane) axis to `target_l` in edge mode.

    Edge replication (not zeros) keeps padded lanes numerically
    well-conditioned — a zero-padded QP has singular R blocks whose
    Cholesky produces NaN lanes; replicating the last real lane gives the
    padding the same central path as a real instance.  All kernel math is
    lanewise, so padded lanes never contaminate real ones; wrappers slice
    them off before returning."""
    L = x.shape[-1]
    if L == target_l:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target_l - L)]
    return jnp.pad(x, pad, mode="edge")


def _padded_elems(lead, lane_block=LANE_BLOCK):
    """VMEM elements of one (lead..., lane_block) f32 array, accounting for
    TPU tiling: the minor-most pair is tiled (8, 128), so the second-minor
    dim (lead[-1]) is padded to a multiple of 8 (this is what the logical-
    shape formula used to miss — at nx=14/nu=2 the padding alone is ~1 MB
    per block, enough to blow a tight scoped-vmem request)."""
    import numpy as _np

    lead = tuple(lead)
    rows = -(-lead[-1] // 8) * 8 if lead else 8
    return int(_np.prod(lead[:-1], dtype=_np.int64)) * rows * lane_block


def _block_bytes(N, nx, nu, lane_block=LANE_BLOCK):
    """(input, output+scratch) bytes for one 128-lane block (f32), using
    the PADDED tile sizes of exactly the arrays the pallas_call passes."""
    in_leads = [(N, nx, nx), (N, nx, nu), (N, nx), (N + 1, nx, nx),
                (N, nu, nx), (N, nu, nu), (N + 1, nx), (N, nu), (nx,)]
    aux_leads = [(N + 1, nx), (N, nu),                  # outputs
                 (N, nu, nx), (N, nu), (nx, nx), (nx,)]  # scratch
    inb = sum(_padded_elems(s, lane_block) for s in in_leads) * 4
    auxb = sum(_padded_elems(s, lane_block) for s in aux_leads) * 4
    return inb, auxb


def _vmem_request(N, nx, nu, lane_block=LANE_BLOCK):
    """Bytes of scoped VMEM the kernel asks the compiler for: inputs are
    double-buffered by the Pallas pipeline (2.2x for slack), plus
    outputs/scratch and 4 MB of compiler headroom."""
    inb, auxb = _block_bytes(N, nx, nu, lane_block)
    return int(2.2 * inb + auxb + 4 * 2**20)


def fits_vmem(N, nx, nu, lane_block=LANE_BLOCK, budget_bytes=100 * 2**20):
    """Whether a lane block's QP + scratch fits the VMEM budget.

    Uses the SAME formula as the per-call CompilerParams request below, so
    a True verdict guarantees the request is within ~100 MB of the v5e
    core's 128 MB VMEM (the compiler's 16 MB default scoped limit is
    raised per-call)."""
    return _vmem_request(N, nx, nu, lane_block) < budget_bytes


def pick_lane_block(N, nx, nu, L):
    """Widest lane block that divides L and fits VMEM.

    Measured on v5e at the flagship shape (B=512): 128/256/512-lane blocks
    are throughput-IDENTICAL (4.67/4.82/4.66 ms/tick) — the kernel is
    VPU-issue-bound (~640 GFLOP/s of its ~0.9 TFLOP/s ceiling), so wider
    blocks trade grid-serialism for proportionally longer per-op issue,
    a wash.  Kept for experiments; the default stays LANE_BLOCK=128
    (smallest VMEM footprint: ~18 MB vs ~72 MB at 512)."""
    for blk in (1024, 512, 256, 128):
        if L % blk == 0 and fits_vmem(N, nx, nu, blk):
            return blk
    return LANE_BLOCK


def _mv(M, v):
    """(i, k, L) x (k, L) -> (i, L) as broadcast FMA + sum.

    Mosaic's dot_general lowering rejects contractions where one operand
    has no non-contracting dims (the TPU_DotDimensionNumbersAttr fails to
    parse an empty dim list), so every contraction in the kernel is spelled
    as elementwise multiply + axis-sum — identical FLOPs, all VPU."""
    return jnp.sum(M * v[None, :, :], axis=1)


def _mtv(M, v):
    """(k, i, L) x (k, L) -> (i, L) (transpose matvec)."""
    return jnp.sum(M * v[:, None, :], axis=0)


def _mm(X, Y):
    """(i, k, L) x (k, j, L) -> (i, j, L)."""
    return jnp.sum(X[:, :, None, :] * Y[None, :, :, :], axis=1)


def _mtm(X, Y):
    """(k, i, L) x (k, j, L) -> (i, j, L) (transpose matmul)."""
    return jnp.sum(X[:, :, None, :] * Y[:, None, :, :], axis=0)


def _kernel(A, B, c, Q, S, R, qx, qu, dx0, dx_out, du_out, K_s, k_s, P_s,
            p_s, *, N, nx, nu):
    """One lane block: full backward + forward sweep in VMEM.

    Refs (leading axis = stage, trailing = LANE_BLOCK lanes):
      A (N, nx, nx, L)   B (N, nx, nu, L)   c (N, nx, L)
      Q (N+1, nx, nx, L) S (N, nu, nx, L)   R (N, nu, nu, L)
      qx (N+1, nx, L)    qu (N, nu, L)      dx0 (nx, L)
    Outputs: dx_out (N+1, nx, L), du_out (N, nu, L).
    Scratch: K_s (N, nu, nx, L), k_s (N, nu, L), P_s (nx, nx, L),
             p_s (nx, L).
    """
    P_s[:] = Q[N]
    p_s[:] = qx[N]

    def backward(i, _):
        s = N - 1 - i
        As = A[s]; Bs = B[s]                             # (nx, nx|nu, L)
        P = P_s[:]; p = p_s[:]
        # PA/PB/Pc via broadcast FMAs (all full-lane VPU ops)
        PA = _mm(P, As)
        PB = _mm(P, Bs)
        Pc_p = _mv(P, c[s]) + p
        Huu = R[s] + _mtm(Bs, PB)                        # (nu, nu, L)
        Hux = S[s] + _mtm(Bs, PA)                        # (nu, nx, L)
        hu = qu[s] + _mtv(Bs, Pc_p)                      # (nu, L)

        # tiny Cholesky of Huu, unrolled (nu <= 2 in the model zoo)
        Lf = [[None] * nu for _ in range(nu)]
        for r_ in range(nu):
            for cc in range(r_ + 1):
                acc = Huu[r_, cc]
                for t in range(cc):
                    acc = acc - Lf[r_][t] * Lf[cc][t]
                Lf[r_][cc] = jnp.sqrt(acc) if r_ == cc else acc / Lf[cc][cc]

        def solve(rhs_rows):                             # list of (L,) rows
            y = [None] * nu
            for r_ in range(nu):
                acc = rhs_rows[r_]
                for t in range(r_):
                    acc = acc - Lf[r_][t] * y[t]
                y[r_] = acc / Lf[r_][r_]
            x = [None] * nu
            for r_ in reversed(range(nu)):
                acc = y[r_]
                for t in range(r_ + 1, nu):
                    acc = acc - Lf[t][r_] * x[t]
                x[r_] = acc / Lf[r_][r_]
            return x

        Kcols = []
        for j in range(nx):
            Kcols.append(solve([-Hux[r_, j] for r_ in range(nu)]))
        K = jnp.stack([jnp.stack([Kcols[j][r_] for j in range(nx)])
                       for r_ in range(nu)])             # (nu, nx, L)
        kff = jnp.stack(solve([-hu[r_] for r_ in range(nu)]))  # (nu, L)

        K_s[s] = K
        k_s[s] = kff
        Pn = Q[s] + _mtm(As, PA) + _mtm(Hux, K)
        P_s[:] = 0.5 * (Pn + jnp.swapaxes(Pn, 0, 1))
        p_s[:] = qx[s] + _mtv(As, Pc_p) + _mtv(Hux, kff)
        return 0

    jax.lax.fori_loop(0, N, backward, 0)

    dx_out[0] = dx0[:]

    def forward(s, _):
        dx = dx_out[s]
        du = _mv(K_s[s], dx) + k_s[s]
        du_out[s] = du
        dx_out[s + 1] = _mv(A[s], dx) + _mv(B[s], du) + c[s]
        return 0

    jax.lax.fori_loop(0, N, forward, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "lane_block"))
def lqr_solve_lanes_pallas(d, interpret: bool = False, lane_block=None):
    """Pallas-fused equivalent of `ops.riccati_lanes.lqr_solve_lanes`.

    `d` is an `ops.riccati_lanes.LaneLQR`; ANY lane count L >= 1 is
    accepted — lanes are padded internally (edge mode) to a multiple of
    the block and sliced back, so the single-vehicle B=1 real-time path
    runs on the same kernel as the fleet path (one 128-lane block costs
    the same as one lane: the VPU is 128 wide either way).  `lane_block`
    widens the per-grid-step block (measured a wash on v5e, see
    `pick_lane_block`); None keeps the 128-lane default.  Returns
    (dx (N+1, nx, L), du (N, nu, L)).
    """
    N, nx, nu, L = d.B.shape[0], d.A.shape[1], d.B.shape[2], d.B.shape[-1]
    blk_l = lane_block or LANE_BLOCK
    Lp = -(-L // blk_l) * blk_l
    if Lp != L:
        d = jax.tree.map(lambda x: pad_lanes(x, Lp), d)
    dtype = d.A.dtype
    grid = (Lp // blk_l,)

    def lane_spec(*lead):
        # block = full stage/row dims, one lane-block slice
        blk = tuple(lead) + (blk_l,)
        nlead = len(lead)
        return pl.BlockSpec(blk, lambda i: (0,) * nlead + (i,),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, N=N, nx=nx, nu=nu)
    dx, du = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(N, nx, nx),      # A
            lane_spec(N, nx, nu),      # B
            lane_spec(N, nx),          # c
            lane_spec(N + 1, nx, nx),  # Q
            lane_spec(N, nu, nx),      # S
            lane_spec(N, nu, nu),      # R
            lane_spec(N + 1, nx),      # qx
            lane_spec(N, nu),          # qu
            lane_spec(nx),             # dx0
        ],
        out_specs=[
            lane_spec(N + 1, nx),      # dx
            lane_spec(N, nu),          # du
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, nx, Lp), dtype),
            jax.ShapeDtypeStruct((N, nu, Lp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, nu, nx, blk_l), dtype),   # K
            pltpu.VMEM((N, nu, blk_l), dtype),       # kff
            pltpu.VMEM((nx, nx, blk_l), dtype),      # P carry
            pltpu.VMEM((nx, blk_l), dtype),          # p carry
        ],
        # the compiler's default scoped-VMEM limit is 16 MB; the flagship
        # block is ~18 MB at 128 lanes (~72 MB at the default 512) with
        # double-buffered inputs, well within the v5e core's 128 MB VMEM,
        # so raise the cap to what this block needs
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(_vmem_request(N, nx, nu, blk_l),
                                 100 * 2**20)),
        interpret=interpret,
    )(d.A, d.B, d.c, d.Q, d.S, d.R, d.qx, d.qu, d.dx0)
    if Lp != L:
        dx, du = dx[..., :L], du[..., :L]
    return dx, du
