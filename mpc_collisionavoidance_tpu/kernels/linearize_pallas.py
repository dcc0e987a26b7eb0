"""Fused RTI linearization as a single Pallas TPU kernel.

Per RTI tick the lane engine must evaluate, at every shooting node of
every lane, the RK4 discrete dynamics and their exact Jacobians (the role
of the CasADi-generated forward VDE in the reference, SURVEY.md N5) plus
the nonlinear constraint values and Jacobians.  The lax path
(`solver/batch.py::_build_qp`) does this as one `jax.linearize` whose
linear map is re-applied to nx+nu basis tangents — correct, but XLA
materializes every intermediate of every pass to HBM: ~1.2 ms of the
3.9 ms flagship tick at B=512 is this HBM-bound elementwise glue.

This kernel runs the SAME trace inside one Pallas program per lane block:
the trajectory block is loaded to VMEM once, the nonlinear rollout, all
nx+nu tangent passes and the constraint linearization happen entirely
in VMEM/registers, and only the results (x_next, J, h, C) are written
back.  The blocker that previously forced the lax path — Mosaic cannot
lower `atan2`, which the guidance models evaluate at every RK4 substage
(reference scripts/usv_guidance_ca1/usv_model.py:117) — is removed by
`ops/kmath.py`: inside the kernel trace the models evaluate a minimax
polynomial atan2 whose error is below float32 resolution.

Layouts (trailing axis = lanes, stage axis second-minor so every op is a
full (stage_block, lane_block) vector tile):
    inputs   xs (nx, N, L), ubar (nu, N, L), params (np_, L)
    outputs  xn (nx, N, L), J (nx, nx+nu, N, L),
             hbar (nh, N, L), C (nh, nx, N, L)
The (N, nx, nxu, L) layout the IPM wants is an O(10 us) XLA transpose
outside the kernel — cheap; writing it directly from the kernel would
scatter across (nxu, L) tiles instead of storing full (N, L) tiles.

The grid blocks BOTH axes: lanes at LANE_BLOCK and stages at
STAGE_BLOCK=8 (one f32 sublane tile).  Stage blocking is not a tuning
choice but a Mosaic bug workaround: `jax.linearize` of the models'
unpack-row/`stack` idiom emits tangent concatenates of (1, N, L) pieces,
and Mosaic's layout inference aborts (`Check failed: limits[i] <=
dim(i)`) whenever such a piece spans more than one sublane tile (any
N > 8; bisected on this image, see /tmp/minjvp3.py history).  Every
shooting node linearizes independently, so the stage axis is a pure
batch axis and blocking it at 8 is exact.  Pallas masks the final
partial stage block when N % 8 != 0 (out-of-bounds stores discarded).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_collisionavoidance_tpu.ops import kmath

LANE_BLOCK = 128
STAGE_BLOCK = 8  # one f32 sublane tile; see module docstring (Mosaic bug)


def _padded_elems(lead, lane_block=LANE_BLOCK):
    """VMEM elements of one (lead..., lane_block) f32 array under (8, 128)
    tiling — the second-minor dim pads to a multiple of 8 (same formula as
    kernels/riccati_pallas.py)."""
    import numpy as _np

    lead = tuple(lead)
    rows = -(-lead[-1] // 8) * 8 if lead else 8
    return int(_np.prod(lead[:-1], dtype=_np.int64)) * rows * lane_block


def _vmem_request(nx, nu, nh, np_, lane_block=LANE_BLOCK,
                  stage_block=STAGE_BLOCK):
    nxu = nx + nu
    bn = stage_block
    in_leads = [(nx, bn), (nu, bn), (np_,)]
    out_leads = [(nx, bn), (nx, nxu, bn), (nh, bn), (nh, nx, bn)]
    inb = sum(_padded_elems(s, lane_block) for s in in_leads) * 4
    outb = sum(_padded_elems(s, lane_block) for s in out_leads) * 4
    # in/out blocks double-buffered by the pipeline; ~12 (bn, L) planes of
    # live linearization temporaries per pass (measured headroom) + 4 MB
    scratch = 12 * _padded_elems((bn,), lane_block) * 4
    return int(2.2 * (inb + outb) + scratch + 4 * 2**20)


def _kernel(xs_ref, u_ref, *rest, f, h, dt, integrator_steps, nx, nu, nh,
            has_p, f_dep=None, h_dep=None):
    xs = xs_ref[...]                       # (nx, N, Lb)
    u = u_ref[...]                         # (nu, N, Lb)
    N, Lb = xs.shape[1], xs.shape[-1]
    if has_p:
        p_ref, xn_ref, J_ref, *hrefs = rest
        # materialize params at full (N, Lb) tiles: Mosaic mis-lowers the
        # implicit (Lb,) -> (N, Lb) broadcast inside the model closures when
        # N spans >1 sublane tile (internal `limits[i] <= dim(i)` abort)
        p = jnp.broadcast_to(p_ref[...][:, None, :],
                             (p_ref.shape[0], N, Lb))
    else:
        xn_ref, J_ref, *hrefs = rest
        p = jnp.zeros((0, N, Lb), xs_ref.dtype)
    dtype = xs.dtype
    nxu = nx + nu
    h_step = dt / integrator_steps

    with kmath.kernel_safe():
        def F(xu):
            x, uu = xu[:nx], xu[nx:]
            for _ in range(integrator_steps):
                k1 = f(x, uu, p)
                k2 = f(x + 0.5 * h_step * k1, uu, p)
                k3 = f(x + 0.5 * h_step * k2, uu, p)
                k4 = f(x + h_step * k3, uu, p)
                x = x + (h_step / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            return x

        xu = jnp.concatenate([xs, u], axis=0)
        xn, lin = jax.linearize(F, xu)
        xn_ref[...] = xn
        # basis tangents via iota compare (no scatter — Mosaic-friendly),
        # restricted to the coordinates f structurally reads (f_dep):
        # skipped state columns are EXACT identity columns, skipped
        # control columns exact zeros (ops/sparsity.py).  Throughput-
        # neutral here (Mosaic already constant-folds the one-hot
        # tangents); the win is trace size + the lax path.
        sel = jax.lax.broadcasted_iota(jnp.int32, (nxu, N, Lb), 0)
        f_deps = set(range(nxu) if f_dep is None else f_dep)
        selr = jax.lax.broadcasted_iota(jnp.int32, (nx, N, Lb), 0)
        for k in range(nxu):
            if k in f_deps:
                tk = (sel == k).astype(dtype)
                J_ref[:, k] = lin(tk)      # (nx, N, Lb) full-tile store
            elif k < nx:
                J_ref[:, k] = (selr == k).astype(dtype)   # exact e_k
            else:
                J_ref[:, k] = jnp.zeros((nx, N, Lb), dtype)

        if nh:
            hbar_ref, C_ref = hrefs
            hbar, linh = jax.linearize(lambda xv: h(xv, p), xs)
            hbar_ref[...] = hbar
            selx = jax.lax.broadcasted_iota(jnp.int32, (nx, N, Lb), 0)
            h_deps = set(range(nx) if h_dep is None else h_dep)
            for k in range(nx):
                if k in h_deps:
                    tk = (selx == k).astype(dtype)
                    C_ref[:, k] = linh(tk)     # (nh, N, Lb)
                else:
                    C_ref[:, k] = jnp.zeros((nh, N, Lb), dtype)


@functools.partial(
    jax.jit,
    static_argnames=("f", "h", "dt", "integrator_steps", "nh",
                     "interpret", "lane_block", "f_dep", "h_dep",
                     "stage_block"))
def linearize_lanes_pallas(xs, ubar, params, *, f, h, dt,
                           integrator_steps=1, nh=0, interpret=False,
                           lane_block=None, f_dep=None, h_dep=None,
                           stage_block=None):
    """Fused rollout + Jacobians for one RTI tick.

    xs (nx, N, L), ubar (nu, N, L), params (np_, L); `f`/`h` are the
    model's dynamics/constraint closures (must be hashable — the Model
    dataclass stores plain functions).  Returns
    (xn (nx, N, L), J (nx, nx+nu, N, L), hbar (nh, N, L),
    C (nh, nx, N, L)); hbar/C are zero-size when nh == 0.
    """
    nx, N, L = xs.shape
    nu = ubar.shape[0]
    np_ = params.shape[0] if params.ndim else 0
    nxu = nx + nu
    blk_l = lane_block or LANE_BLOCK
    blk_n = stage_block or STAGE_BLOCK
    # any lane count accepted: pad (edge mode) to a block multiple and
    # slice back — the B=1 real-time path rides the same kernel
    Lp = -(-L // blk_l) * blk_l
    if Lp != L:
        from mpc_collisionavoidance_tpu.kernels.riccati_pallas import (
            pad_lanes)
        xs = pad_lanes(xs, Lp)
        ubar = pad_lanes(ubar, Lp)
        params = pad_lanes(params, Lp) if params.ndim else params
    dtype = xs.dtype
    # lanes outer, stages inner: the params block's index map is constant
    # across the inner (stage) axis so Pallas keeps it VMEM-resident
    grid = (Lp // blk_l, -(-N // blk_n))

    def stage_spec(*lead):
        blk = tuple(lead) + (blk_n, blk_l)
        nlead = len(lead)
        return pl.BlockSpec(blk, lambda i, j: (0,) * nlead + (j, i),
                            memory_space=pltpu.VMEM)

    has_p = np_ > 0
    kernel = functools.partial(_kernel, f=f, h=h, dt=dt,
                               integrator_steps=integrator_steps,
                               nx=nx, nu=nu, nh=nh, has_p=has_p,
                               f_dep=f_dep, h_dep=h_dep)
    in_specs = [stage_spec(nx), stage_spec(nu)]
    args = [xs, ubar]
    if has_p:
        in_specs.append(pl.BlockSpec((np_, blk_l), lambda i, j: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(params)
    out_specs = [stage_spec(nx), stage_spec(nx, nxu)]
    out_shape = [jax.ShapeDtypeStruct((nx, N, Lp), dtype),
                 jax.ShapeDtypeStruct((nx, nxu, N, Lp), dtype)]
    if nh:
        out_specs += [stage_spec(nh), stage_spec(nh, nx)]
        out_shape += [jax.ShapeDtypeStruct((nh, N, Lp), dtype),
                      jax.ShapeDtypeStruct((nh, nx, N, Lp), dtype)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _vmem_request(nx, nu, nh, np_, blk_l), 100 * 2**20)),
        interpret=interpret,
    )(*args)
    if nh:
        xn, J, hbar, C = out
    else:
        xn, J = out
        hbar = jnp.zeros((0, N, Lp), dtype)
        C = jnp.zeros((0, nx, N, Lp), dtype)
    if Lp != L:
        xn, J, hbar, C = (xn[..., :L], J[..., :L],
                          hbar[..., :L], C[..., :L])
    return xn, J, hbar, C
