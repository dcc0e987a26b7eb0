"""SQP linearization: build the stage-structured QP at a trajectory iterate.

Performs the "preparation phase" of the reference's SQP-RTI scheme: one
discrete-dynamics linearization per stage (the role of the CasADi-generated
forward VDE, reference src/nmpc_guidance_ca1.cpp:52), the Gauss-Newton
LINEAR_LS cost expansion, constraint linearization with `jax.jacfwd`, and
the hard/soft inequality row assembly — all vmapped over the horizon so XLA
emits batched tensor ops instead of N sequential small kernels.

Static row layout for hard inequalities (masked rows are zeroed so shapes
stay fixed):
    [ u-box lower | u-box upper | x-box lower | x-box upper |
      hard-h lower | hard-h upper ]
x-box rows are masked at stage 0 (state pinned, acados lbx0=ubx0 semantics,
reference src/nmpc_guidance_ca1.cpp:509-510).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.ocp.spec import OCPSpec
from mpc_collisionavoidance_tpu.ops import integrators
from mpc_collisionavoidance_tpu.ops.ipm import QPData


class RowLayout(NamedTuple):
    """Static (numpy, trace-time) description of the inequality rows."""

    E_u: np.ndarray        # (n_bu, nu) selection for control box
    lbu: np.ndarray
    ubu: np.ndarray
    E_x: np.ndarray        # (n_bx, nx) selection for HARD state-box rows
    lbx: np.ndarray
    ubx: np.ndarray
    hard_h: np.ndarray     # indices of hard h rows
    soft_h: np.ndarray     # indices of softened h rows
    E_xs: np.ndarray       # (n_sbx, nx) selection for SOFT state-box rows
    lbx_s: np.ndarray      # (n_sbx,)
    ubx_s: np.ndarray
    n_hard: int            # total hard rows per stage


def make_row_layout(spec: OCPSpec) -> RowLayout:
    m = spec.model
    idxbu = np.asarray(m.idxbu, dtype=np.int64).reshape(-1)
    idxbx = np.asarray(m.idxbx, dtype=np.int64).reshape(-1)
    lbx = np.asarray(m.lbx, float).reshape(-1)
    ubx = np.asarray(m.ubx, float).reshape(-1)
    E_u = np.eye(m.nu)[idxbu] if idxbu.size else np.zeros((0, m.nu))

    # soft state-box rows (acados idxsbx) leave the hard family
    sbx = (np.asarray(spec.soft_bx.idxsbx, dtype=np.int64)
           if spec.soft_bx is not None else np.zeros((0,), dtype=np.int64))
    hard_bx = np.setdiff1d(np.arange(idxbx.size), sbx)
    E_x_all = np.eye(m.nx)[idxbx] if idxbx.size else np.zeros((0, m.nx))
    E_x = E_x_all[hard_bx]
    E_xs = E_x_all[sbx]

    hard_h = spec.hard_h_rows()
    soft_h = (np.asarray(spec.soft.idxsh, dtype=np.int64)
              if spec.soft is not None else np.zeros((0,), dtype=np.int64))
    n_hard = 2 * E_u.shape[0] + 2 * E_x.shape[0] + 2 * hard_h.size
    return RowLayout(
        E_u=E_u, lbu=np.asarray(m.lbu, float).reshape(-1),
        ubu=np.asarray(m.ubu, float).reshape(-1),
        E_x=E_x, lbx=lbx[hard_bx], ubx=ubx[hard_bx],
        hard_h=hard_h, soft_h=soft_h,
        E_xs=E_xs, lbx_s=lbx[sbx], ubx_s=ubx[sbx],
        n_hard=n_hard,
    )


def build_qp(spec: OCPSpec,
             layout: RowLayout,
             xbar: jnp.ndarray,       # (N+1, nx) trajectory iterate
             ubar: jnp.ndarray,       # (N, nu)
             x0: jnp.ndarray,         # (nx,) measured state (pinned)
             yref: jnp.ndarray,       # (N, ny) stage references
             yref_e: jnp.ndarray,     # (ny_e,)
             params: jnp.ndarray,     # (np,) stage-constant parameter vector
             lh: Optional[jnp.ndarray] = None,  # (nh,) runtime lower bounds
             ) -> QPData:
    m = spec.model
    N = spec.N
    dtype = xbar.dtype
    scale = jnp.asarray(spec.stage_scale, dtype)

    # ---- dynamics linearization (vmapped over the horizon) ----
    G = integrators.make_discrete_dynamics_with_sens(
        m.f, spec.dt, spec.integrator_steps)
    x_next, A, B = jax.vmap(G, in_axes=(0, 0, None))(xbar[:-1], ubar, params)
    c = x_next - xbar[1:]

    # ---- Gauss-Newton LINEAR_LS cost ----
    Vx = jnp.asarray(spec.cost.Vx, dtype)
    Vu = jnp.asarray(spec.cost.Vu, dtype)
    W = jnp.asarray(spec.cost.W, dtype)
    Q_stage = scale * (Vx.T @ W @ Vx)
    R_stage = scale * (Vu.T @ W @ Vu)
    S_stage = scale * (Vu.T @ W @ Vx)
    y = xbar[:-1] @ Vx.T + ubar @ Vu.T - yref          # (N, ny)
    Wy = scale * (y @ W.T)                             # (N, ny)
    qx_path = Wy @ Vx                                  # (N, nx)
    qu = Wy @ Vu                                       # (N, nu)
    Vx_e = jnp.asarray(spec.cost.Vx_e, dtype)
    W_e = jnp.asarray(spec.cost.W_e, dtype)
    Q_N = Vx_e.T @ W_e @ Vx_e
    qx_N = Vx_e.T @ (W_e @ (Vx_e @ xbar[-1] - yref_e))

    Q = jnp.concatenate([jnp.broadcast_to(Q_stage, (N,) + Q_stage.shape),
                         Q_N[None]], axis=0)
    qx = jnp.concatenate([qx_path, qx_N[None]], axis=0)
    S = jnp.broadcast_to(S_stage, (N,) + S_stage.shape)
    R = jnp.broadcast_to(R_stage, (N,) + R_stage.shape)

    # ---- nonlinear constraint linearization ----
    nh = m.nh
    if nh > 0:
        def h_and_jac(x):
            return m.h(x, params), jax.jacfwd(lambda xx: m.h(xx, params))(x)

        hbar, C = jax.vmap(h_and_jac)(xbar[:-1])       # (N, nh), (N, nh, nx)
        lh_full = (jnp.asarray(m.lh, dtype) if lh is None
                   else jnp.asarray(lh, dtype))
        uh_full = jnp.asarray(m.uh, dtype)
    else:
        hbar = jnp.zeros((N, 0), dtype)
        C = jnp.zeros((N, 0, m.nx), dtype)
        lh_full = jnp.zeros((0,), dtype)
        uh_full = jnp.zeros((0,), dtype)

    # ---- hard inequality rows ----
    E_u = jnp.asarray(layout.E_u, dtype)
    E_x = jnp.asarray(layout.E_x, dtype)
    n_bu, n_bx = E_u.shape[0], E_x.shape[0]
    hh = layout.hard_h
    bu_lo_Gx = jnp.zeros((N, n_bu, m.nx), dtype)
    bu_lo_Gu = jnp.broadcast_to(E_u, (N, n_bu, m.nu))
    bu_lo_gl = jnp.asarray(layout.lbu, dtype) - ubar @ E_u.T
    bu_hi_Gu = -bu_lo_Gu
    bu_hi_gl = ubar @ E_u.T - jnp.asarray(layout.ubu, dtype)

    # x-box: masked at stage 0 (state pinned there)
    xsel = xbar[:-1] @ E_x.T                           # (N, n_bx)
    stage_mask = jnp.arange(N) > 0
    mvec = stage_mask[:, None].astype(dtype)
    bx_lo_Gx = jnp.broadcast_to(E_x, (N, n_bx, m.nx)) * mvec[:, :, None]
    bx_lo_gl = jnp.where(stage_mask[:, None],
                         jnp.asarray(layout.lbx, dtype) - xsel, -1.0)
    bx_hi_Gx = -bx_lo_Gx
    bx_hi_gl = jnp.where(stage_mask[:, None],
                         xsel - jnp.asarray(layout.ubx, dtype), -1.0)

    C_hard = C[:, hh, :] if hh.size else jnp.zeros((N, 0, m.nx), dtype)
    h_hard = hbar[:, hh] if hh.size else jnp.zeros((N, 0), dtype)
    hh_lo_gl = lh_full[hh] - h_hard if hh.size else jnp.zeros((N, 0), dtype)
    hh_hi_gl = h_hard - uh_full[hh] if hh.size else jnp.zeros((N, 0), dtype)

    zeros_bx_u = jnp.zeros((N, n_bx, m.nu), dtype)
    zeros_hh_u = jnp.zeros((N, hh.size, m.nu), dtype)
    Gx = jnp.concatenate(
        [bu_lo_Gx, bu_lo_Gx, bx_lo_Gx, bx_hi_Gx, C_hard, -C_hard], axis=1)
    Gu = jnp.concatenate(
        [bu_lo_Gu, bu_hi_Gu, zeros_bx_u, zeros_bx_u,
         zeros_hh_u, zeros_hh_u], axis=1)
    gl = jnp.concatenate(
        [bu_lo_gl, bu_hi_gl, bx_lo_gl, bx_hi_gl, hh_lo_gl, hh_hi_gl], axis=1)

    # ---- soft rows: [ softened h rows | softened state-box rows ] ----
    sh = layout.soft_h
    if sh.size:
        Cx_soft = C[:, sh, :]
        hofs = hbar[:, sh]
        slh = jnp.broadcast_to(lh_full[sh], (N, sh.size))
        suh = jnp.broadcast_to(uh_full[sh], (N, sh.size))
        sp = spec.soft
        zl = scale * jnp.asarray(sp.zl, dtype)
        Zl = scale * jnp.asarray(sp.Zl, dtype)
        zu = scale * jnp.asarray(sp.zu, dtype)
        Zu = scale * jnp.asarray(sp.Zu, dtype)
        lsh = jnp.asarray(sp.lsh, dtype)
        ush = jnp.asarray(sp.ush, dtype)
    else:
        Cx_soft = jnp.zeros((N, 0, m.nx), dtype)
        hofs = jnp.zeros((N, 0), dtype)
        slh = jnp.zeros((N, 0), dtype)
        suh = jnp.zeros((N, 0), dtype)
        zl = Zl = zu = Zu = lsh = ush = jnp.zeros((0,), dtype)

    n_sbx = layout.E_xs.shape[0]
    if n_sbx:
        # a softened box row is a soft row with constant Jacobian E_xs; at
        # stage 0 the state is pinned, so the row is zeroed there with an
        # O(1) slack band around 0 (same role — and same numeric scale — as
        # the gl=-1 masking of hard box rows above)
        E_xs = jnp.asarray(layout.E_xs, dtype)
        Cx_bx = (jnp.broadcast_to(E_xs, (N, n_sbx, m.nx))
                 * mvec[:, :1, None])
        hofs_bx = (xbar[:-1] @ E_xs.T) * mvec[:, :1]
        slh_bx = jnp.where(stage_mask[:, None],
                           jnp.asarray(layout.lbx_s, dtype), -1.0)
        suh_bx = jnp.where(stage_mask[:, None],
                           jnp.asarray(layout.ubx_s, dtype), 1.0)
        sb = spec.soft_bx
        Cx_soft = jnp.concatenate([Cx_soft, Cx_bx], axis=1)
        hofs = jnp.concatenate([hofs, hofs_bx], axis=1)
        slh = jnp.concatenate([slh, slh_bx], axis=1)
        suh = jnp.concatenate([suh, suh_bx], axis=1)
        zl = jnp.concatenate([zl, scale * jnp.asarray(sb.zl, dtype)])
        Zl = jnp.concatenate([Zl, scale * jnp.asarray(sb.Zl, dtype)])
        zu = jnp.concatenate([zu, scale * jnp.asarray(sb.zu, dtype)])
        Zu = jnp.concatenate([Zu, scale * jnp.asarray(sb.Zu, dtype)])
        lsh = jnp.concatenate([lsh, jnp.asarray(sb.lsbx, dtype)])
        ush = jnp.concatenate([ush, jnp.asarray(sb.usbx, dtype)])

    return QPData(
        A=A, B=B, c=c, dx0=x0 - xbar[0],
        Q=Q, S=S, R=R, qx=qx, qu=qu,
        Gx=Gx, Gu=Gu, gl=gl,
        Cx=Cx_soft, hofs=hofs, slh=slh, suh=suh,
        zl=zl, Zl=Zl, zu=zu, Zu=Zu, lsh=lsh, ush=ush,
    )
