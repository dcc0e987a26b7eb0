"""Fully fused lane IPM: the ENTIRE QP solve as one Pallas TPU kernel.

`ops/ipm_lanes.ipm_solve_lanes` runs `iters` path-following iterations as
XLA ops with one Riccati kernel call per iteration: every iteration
re-streams the stage-structured QP and ~30 family tensors through HBM, and
the per-iteration elementwise glue is dozens of separate HBM-bound kernels.
Measured on v5e this glue+restream is ~0.26 ms/iteration at L = 512 —
3.1 ms of a 5.6 ms flagship tick.

This kernel moves the WHOLE solve into VMEM: the QP block is loaded once
per 128-lane block, every iterate (primal, 10 slack families, 10 dual
families) lives in VMEM scratch, and the `iters` iterations run inside one
`fori_loop` with the Riccati backward/forward sweeps inlined (same
broadcast-FMA contractions as kernels/riccati_pallas.py — Mosaic cannot
lower matvec dot_generals, see that module).  The role model is the same
as the reference's BLASFEO/HPIPM pairing: the per-core speed-of-light
layer under the stage-structured solver (SURVEY.md N2/N3), except the
"cache" is VMEM and the "core" is a 128-lane VPU block.

Structure-static specialization: the kernel is generated per problem
structure (N, nx, nu, box/hard/soft row counts); empty constraint families
produce NO code.  Cost blocks (Qc/QN/Sc/Rc) and slack weights
(zl/Zl/zu/Zu/lsh/ush) are trace-time constants (they come from the static
OCPSpec) and are baked into the kernel as immediates.

VMEM: flagship (N=100, nx=8, nS=8) is ~9 MB of QP inputs (double-buffered
by the pipeline) + ~10 MB iterate/scratch + temporaries — well inside the
raised per-call limit (v5e core VMEM = 128 MB).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_collisionavoidance_tpu.kernels.riccati_pallas import (
    LANE_BLOCK, _mm, _mtm, _mtv, _mv)


def _static(x, name):
    """Trace-time-constant array -> numpy (clear error if traced)."""
    if isinstance(x, jax.core.Tracer):
        raise TypeError(
            f"fused IPM requires static {name}: pass `static=` (numpy cost "
            "blocks / slack weights from the OCPSpec) when calling under "
            "jit — this JAX stages even constants as tracers")
    return np.asarray(x)


def fused_ipm_lanes(qp, idxbu: Tuple[int, ...], idxbx: Tuple[int, ...],
                    iters: int = 12, tau: float = 0.995, sigma: float = 0.1,
                    mu0: float = 1.0, interpret: bool = False, static=None):
    """Run the full lane IPM in one kernel. Returns (dx, du, gap, eq_res).

    `qp` is an `ops.ipm_lanes.LaneQP`; shapes as documented there.  Any
    lane count L >= 1 is accepted: the lane axis is padded internally
    (edge mode) to a multiple of 128 and sliced back.  `static`, when
    given, is a dict of NUMPY arrays {Qc, QN, Sc, Rc[, zl, Zl, zu, Zu,
    lsh, ush]} — required under jit, where the corresponding qp fields
    are tracers.
    """
    N, nx, nu, L = qp.B.shape[0], qp.A.shape[1], qp.B.shape[2], qp.B.shape[-1]
    nbu, nbx = len(idxbu), len(idxbx)
    nHh, nS = qp.Ch.shape[1], qp.Cs.shape[1]
    Lp = -(-L // LANE_BLOCK) * LANE_BLOCK
    if Lp != L:
        from mpc_collisionavoidance_tpu.kernels.riccati_pallas import (
            pad_lanes)
        lane_fields = ("A", "B", "c", "dx0", "qx", "qu", "ub_lo", "ub_hi",
                       "xb_lo", "xb_hi", "Ch", "hh_lo", "hh_hi",
                       "Cs", "hofs", "slh", "suh")
        qp = qp._replace(**{f: pad_lanes(getattr(qp, f), Lp)
                            for f in lane_fields})
        dx, du, gap, eq_res = fused_ipm_lanes(
            qp, idxbu, idxbx, iters=iters, tau=tau, sigma=sigma, mu0=mu0,
            interpret=interpret, static=static)
        return dx[..., :L], du[..., :L], gap[..., :L], eq_res[..., :L]
    dtype = qp.A.dtype
    f32 = dtype == jnp.float32
    LB = LANE_BLOCK

    # ---- static problem data baked into the kernel ----
    if static is None:
        static = {k: getattr(qp, k)
                  for k in ("Qc", "QN", "Sc", "Rc",
                            "zl", "Zl", "zu", "Zu", "lsh", "ush")}
    npdt = np.float32 if f32 else np.float64
    Qc = _static(static["Qc"], "Qc").astype(npdt)
    QN = _static(static["QN"], "QN").astype(npdt)
    Sc = _static(static["Sc"], "Sc").astype(npdt)
    Rc = _static(static["Rc"], "Rc").astype(npdt)
    if nS:
        zl = _static(static["zl"], "zl").reshape(nS, 1)
        Zl = _static(static["Zl"], "Zl").reshape(nS, 1)
        zu = _static(static["zu"], "zu").reshape(nS, 1)
        Zu = _static(static["Zu"], "Zu").reshape(nS, 1)
        lsh = _static(static["lsh"], "lsh").reshape(nS, 1)
        ush = _static(static["ush"], "ush").reshape(nS, 1)
    else:
        zl = Zl = zu = Zu = lsh = ush = np.zeros((0, 1))
    n_total = max(N * (2 * nbu + 2 * nbx + 2 * nHh + 4 * nS), 1)
    gap_floor = 1e-13 if not f32 else 3e-7
    t_min, s_margin = 0.1, 0.1

    idxbu = tuple(int(i) for i in idxbu)
    idxbx = tuple(int(i) for i in idxbx)

    # ---- input / output / scratch layout (names -> shapes) ----
    in_names, in_shapes = [], []

    def add_in(name, shape):
        in_names.append(name)
        in_shapes.append(shape)

    # lane-replicated constant inputs (Pallas forbids captured consts)
    const_names, const_shapes = [], []

    def add_const(name, shape):
        const_names.append(name)
        const_shapes.append(shape)

    add_const("Qc", (nx, nx)); add_const("QN", (nx, nx))
    add_const("Sc", (nu, nx)); add_const("Rc", (nu, nu))
    if nS:
        add_const("zl", (nS, 1)); add_const("Zl", (nS, 1))
        add_const("zu", (nS, 1)); add_const("Zu", (nS, 1))
        add_const("lsh", (nS, 1)); add_const("ush", (nS, 1))

    add_in("A", (N, nx, nx)); add_in("B", (N, nx, nu)); add_in("c", (N, nx))
    add_in("qx", (N + 1, nx)); add_in("qu", (N, nu)); add_in("dx0", (nx,))
    if nbu:
        add_in("ub_lo", (N, nbu)); add_in("ub_hi", (N, nbu))
    if nbx:
        add_in("xb_lo", (N, nbx)); add_in("xb_hi", (N, nbx))
    if nHh:
        add_in("Ch", (N, nHh, nx))
        add_in("hh_lo", (N, nHh)); add_in("hh_hi", (N, nHh))
    if nS:
        add_in("Cs", (N, nS, nx))
        add_in("hofs", (N, nS)); add_in("slh", (N, nS)); add_in("suh", (N, nS))

    out_names = ["dx_o", "du_o", "gap_o", "eq_o"]
    out_shapes = [(N + 1, nx), (N, nu), (1,), (1,)]

    # slack/dual family table: (name, rows) — zero-row families are absent
    fams = []
    if nbu:
        fams += [("ulo", nbu), ("uhi", nbu)]
    if nbx:
        fams += [("xlo", nbx), ("xhi", nbx)]
    if nHh:
        fams += [("hlo", nHh), ("hhi", nHh)]
    if nS:
        fams += [("ssl", nS), ("ssu", nS), ("bsl", nS), ("bsu", nS)]

    sc_names, sc_shapes = [], []

    def add_sc(name, shape):
        sc_names.append(name)
        sc_shapes.append(shape)

    add_sc("dx", (N + 1, nx)); add_sc("du", (N, nu))
    add_sc("Ddx", (N + 1, nx)); add_sc("Ddu", (N, nu))
    if nS:
        add_sc("sl", (N, nS)); add_sc("su", (N, nS))
        add_sc("Dsl", (N, nS)); add_sc("Dsu", (N, nS))
    for f, r in fams:
        add_sc("t_" + f, (N, r))
        add_sc("l_" + f, (N, r))
        add_sc("Dt_" + f, (N, r))
    add_sc("Qb", (N, nx, nx)); add_sc("Rb", (N, nu, nu))
    add_sc("qxb", (N + 1, nx)); add_sc("qub", (N, nu)); add_sc("cb", (N, nx))
    add_sc("K", (N, nu, nx)); add_sc("kf", (N, nu))
    add_sc("P", (nx, nx)); add_sc("pv", (nx,))
    if nS:
        add_sc("wS", (N, nS))    # abar_l + abar_u (soft gram weights)
        add_sc("kl", (N, nS)); add_sc("ku", (N, nS))
        add_sc("bl", (N, nS)); add_sc("bu", (N, nS))
        add_sc("asl", (N, nS)); add_sc("asu", (N, nS))
    if nHh:
        add_sc("wH", (N, nHh))   # a_hlo + a_hhi

    # ------------------------------------------------------------------
    def kernel(*refs):
        r = dict(zip(const_names + in_names + out_names + sc_names, refs))
        cQc = r["Qc"][:][:, :, None]
        cQN = r["QN"][:][:, :, None]
        cSc = r["Sc"][:][:, :, None]
        cRc = r["Rc"][:][:, :, None]
        if nS:
            czl = r["zl"][:][None]                        # (1, nS, 1)
            cZl = r["Zl"][:][None]
            czu = r["zu"][:][None]
            cZu = r["Zu"][:][None]
            clsh = r["lsh"][:][None]
            cush = r["ush"][:][None]
        # stage-0 mask built in-kernel (no captured consts allowed)
        cxm = (jax.lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)
               > 0).astype(dtype)

        # one-hot row / diagonal masks (Mosaic has no scatter-add, so
        # index-adds are expressed as masked broadcasts)
        def oh_row(idx, n):
            return (jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
                    == idx).astype(dtype)

        def oh_diag3(idx, n):
            i1 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
            i2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
            return ((i1 == idx) & (i2 == idx)).astype(dtype)

        def du_rows(du):
            return jnp.concatenate([du[:, i:i + 1] for i in idxbu], axis=1)

        def dx_rows(dxp):
            return jnp.concatenate([dxp[:, i:i + 1] for i in idxbx], axis=1)

        def rows_mv(Cref, v):
            # (N, r, nx, L) x (N, nx, L) -> (N, r, L)
            return jnp.sum(Cref * v[:, None, :, :], axis=2)

        def rows_tv(Cref, w):
            # (N, r, nx, L) x (N, r, L) -> (N, nx, L)
            return jnp.sum(Cref * w[:, :, None, :], axis=1)

        def lanes_sum(x):
            return jnp.sum(x, axis=(0, 1), keepdims=True)  # (1, 1, L)

        def lanes_min(x):
            return jnp.min(x, axis=(0, 1), keepdims=True)

        def ratio(z, Dz):
            q = jnp.where(Dz < 0, -z / jnp.where(Dz < 0, Dz, -1.0), jnp.inf)
            return lanes_min(q)

        # ---------------- g-family values at the current iterate ----------
        def g_all():
            dxp = r["dx"][0:N]
            du = r["du"][:]
            g = {}
            if nbu:
                us = du_rows(du)
                g["ulo"] = us - r["ub_lo"][:]
                g["uhi"] = -us - r["ub_hi"][:]
            if nbx:
                xs = cxm * dx_rows(dxp)
                g["xlo"] = xs - r["xb_lo"][:]
                g["xhi"] = -xs - r["xb_hi"][:]
            if nHh:
                hv = rows_mv(r["Ch"][:], dxp)
                g["hlo"] = hv - r["hh_lo"][:]
                g["hhi"] = -hv - r["hh_hi"][:]
            if nS:
                gv = r["hofs"][:] + rows_mv(r["Cs"][:], dxp)
                g["ssl"] = (gv - r["slh"][:] + r["sl"][:])
                g["ssu"] = (r["suh"][:] - gv + r["su"][:])
                g["bsl"] = r["sl"][:] - clsh
                g["bsu"] = r["su"][:] - cush
                g["gv"] = gv
            return g

        # ---------------- initialization ----------------
        r["dx"][:] = jnp.zeros((N + 1, nx, LB), dtype)
        r["du"][:] = jnp.zeros((N, nu, LB), dtype)
        if nS:
            gv0 = r["hofs"][:]
            r["sl"][:] = jnp.maximum(r["slh"][:] - gv0, clsh) + s_margin
            r["su"][:] = jnp.maximum(gv0 - r["suh"][:], cush) + s_margin
        g0 = g_all()
        for f, _rr in fams:
            t0 = jnp.maximum(g0[f], t_min)
            r["t_" + f][:] = t0
            r["l_" + f][:] = mu0 / t0

        # ---------------- main iteration loop ----------------
        def body(_, __):
            g = g_all()
            # residuals r_f = g_f - t_f (values, one per family)
            res = {f: g[f] - r["t_" + f][:] for f, _rr in fams}

            gap = jnp.zeros((1, 1, LB), dtype)
            for f, _rr in fams:
                gap = gap + lanes_sum(r["l_" + f][:] * r["t_" + f][:])
            gap = gap / n_total
            mu = sigma * gap

            a = {f: r["l_" + f][:] / r["t_" + f][:] for f, _rr in fams}

            if nS:
                beta_l = cZl + a["ssl"] + a["bsl"]
                beta_u = cZu + a["ssu"] + a["bsu"]
                k_l = (mu / r["t_ssl"][:] + mu / r["t_bsl"][:]
                       - czl - cZl * r["sl"][:]
                       - a["ssl"] * res["ssl"] - a["bsl"] * res["bsl"])
                k_u = (mu / r["t_ssu"][:] + mu / r["t_bsu"][:]
                       - czu - cZu * r["su"][:]
                       - a["ssu"] * res["ssu"] - a["bsu"] * res["bsu"])
                abar = (a["ssl"] * (cZl + a["bsl"]) / beta_l
                        + a["ssu"] * (cZu + a["bsu"]) / beta_u)
                qtil_l = (mu / r["t_ssl"][:] - a["ssl"] * res["ssl"]
                          - a["ssl"] * k_l / beta_l)
                qtil_u = (mu / r["t_ssu"][:] - a["ssu"] * res["ssu"]
                          - a["ssu"] * k_u / beta_u)
                r["wS"][:] = abar
                r["kl"][:] = k_l; r["ku"][:] = k_u
                r["bl"][:] = beta_l; r["bu"][:] = beta_u
                r["asl"][:] = a["ssl"]; r["asu"][:] = a["ssu"]
            if nHh:
                r["wH"][:] = a["hlo"] + a["hhi"]

            # ---- modified gradients (full-array) ----
            dxp = r["dx"][0:N]
            du = r["du"][:]
            qxp = (r["qx"][0:N]
                   + jnp.sum(cQc[None] * dxp[:, None, :, :], axis=2)
                   + jnp.sum(cSc[None] * du[:, :, None, :], axis=1))
            if nbx:
                vec = cxm * ((mu / r["t_xlo"][:] - a["xlo"] * res["xlo"])
                             - (mu / r["t_xhi"][:] - a["xhi"] * res["xhi"]))
                for j, ib in enumerate(idxbx):
                    qxp = qxp - vec[:, j:j + 1, :] * oh_row(ib, nx)
            if nHh:
                qxp = qxp - rows_tv(r["Ch"][:],
                                    (mu / r["t_hlo"][:] - a["hlo"] * res["hlo"])
                                    - (mu / r["t_hhi"][:]
                                       - a["hhi"] * res["hhi"]))
            if nS:
                qxp = qxp - rows_tv(r["Cs"][:], qtil_l - qtil_u)
            qxN = r["qx"][N] + jnp.sum(cQN * r["dx"][N][None, :, :], axis=1)
            r["qxb"][0:N] = qxp
            r["qxb"][N] = qxN

            qub = (r["qu"][:]
                   + jnp.sum(cSc[None] * dxp[:, None, :, :], axis=2)
                   + jnp.sum(cRc[None] * du[:, None, :, :], axis=2))
            if nbu:
                vec_u = ((mu / r["t_ulo"][:] - a["ulo"] * res["ulo"])
                         - (mu / r["t_uhi"][:] - a["uhi"] * res["uhi"]))
                for j, iu in enumerate(idxbu):
                    qub = qub - vec_u[:, j:j + 1, :] * oh_row(iu, nu)
            r["qub"][:] = qub

            # dynamics residual
            r["cb"][:] = (jnp.sum(r["A"][:] * dxp[:, None, :, :], axis=2)
                          + jnp.sum(r["B"][:] * du[:, None, :, :], axis=2)
                          + r["c"][:] - r["dx"][1:N + 1])
            ddx0 = r["dx0"][:] - r["dx"][0]

            # ---- modified Hessian diagonals / weights ----
            # Rbar (small): store whole
            Rb = jnp.broadcast_to(cRc[None], (N, nu, nu, LB))
            if nbu:
                au_sum = a["ulo"] + a["uhi"]
                for j, iu in enumerate(idxbu):
                    Rb = Rb + (au_sum[:, j][:, None, None, :]
                               * oh_diag3(iu, nu)[None])
            r["Rb"][:] = Rb
            # Qbar per stage assembled in the backward sweep (saves VMEM);
            # box-diag part precomputed here as a (N, nbx, L) weight
            if nbx:
                wx = cxm * (a["xlo"] + a["xhi"])          # (N, nbx, L)

            # ---- backward Riccati (inlined, per-stage Qbar) ----
            r["P"][:] = jnp.broadcast_to(cQN, (nx, nx, LB))
            r["pv"][:] = r["qxb"][N]

            def backward(i, _):
                s = N - 1 - i
                As = r["A"][s]; Bs = r["B"][s]
                Qs = jnp.broadcast_to(cQc, (nx, nx, LB))
                if nbx:
                    wxs = wx[s]
                    for j, ib in enumerate(idxbx):
                        Qs = Qs + wxs[j][None, None, :] * oh_diag3(ib, nx)
                if nHh:
                    Chs = r["Ch"][s]                       # (nHh, nx, L)
                    wh = r["wH"][s]                        # (nHh, L)
                    Qs = Qs + jnp.sum(
                        Chs[:, :, None, :] * wh[:, None, None, :]
                        * Chs[:, None, :, :], axis=0)
                if nS:
                    Css = r["Cs"][s]
                    ws = r["wS"][s]
                    Qs = Qs + jnp.sum(
                        Css[:, :, None, :] * ws[:, None, None, :]
                        * Css[:, None, :, :], axis=0)

                P = r["P"][:]; p = r["pv"][:]
                PA = _mm(P, As)
                PB = _mm(P, Bs)
                Pc_p = _mv(P, r["cb"][s]) + p
                Huu = r["Rb"][s] + _mtm(Bs, PB)
                Hux = jnp.broadcast_to(cSc, (nu, nx, LB)) + _mtm(Bs, PA)
                hu = r["qub"][s] + _mtv(Bs, Pc_p)

                Lf = [[None] * nu for _ in range(nu)]
                for r_ in range(nu):
                    for cc in range(r_ + 1):
                        acc = Huu[r_, cc]
                        for tt in range(cc):
                            acc = acc - Lf[r_][tt] * Lf[cc][tt]
                        Lf[r_][cc] = (jnp.sqrt(acc) if r_ == cc
                                      else acc / Lf[cc][cc])

                def solve(rhs_rows):
                    y = [None] * nu
                    for r_ in range(nu):
                        acc = rhs_rows[r_]
                        for tt in range(r_):
                            acc = acc - Lf[r_][tt] * y[tt]
                        y[r_] = acc / Lf[r_][r_]
                    x = [None] * nu
                    for r_ in reversed(range(nu)):
                        acc = y[r_]
                        for tt in range(r_ + 1, nu):
                            acc = acc - Lf[tt][r_] * x[tt]
                        x[r_] = acc / Lf[r_][r_]
                    return x

                Kcols = [solve([-Hux[r_, j] for r_ in range(nu)])
                         for j in range(nx)]
                K = jnp.stack([jnp.stack([Kcols[j][r_] for j in range(nx)])
                               for r_ in range(nu)])
                kff = jnp.stack(solve([-hu[r_] for r_ in range(nu)]))
                r["K"][s] = K
                r["kf"][s] = kff
                Pn = Qs + _mtm(As, PA) + _mtm(Hux, K)
                r["P"][:] = 0.5 * (Pn + jnp.swapaxes(Pn, 0, 1))
                r["pv"][:] = r["qxb"][s] + _mtv(As, Pc_p) + _mtv(Hux, kff)
                return 0

            jax.lax.fori_loop(0, N, backward, 0)

            # ---- forward rollout ----
            r["Ddx"][0] = ddx0

            def forward(s, _):
                Dx = r["Ddx"][s]
                Du = _mv(r["K"][s], Dx) + r["kf"][s]
                r["Ddu"][s] = Du
                r["Ddx"][s + 1] = (_mv(r["A"][s], Dx) + _mv(r["B"][s], Du)
                                   + r["cb"][s])
                return 0

            jax.lax.fori_loop(0, N, forward, 0)

            # ---- slack/dual steps + fraction-to-boundary ----
            Ddxp = r["Ddx"][0:N]
            Ddu = r["Ddu"][:]
            if nS:
                Dgv = rows_mv(r["Cs"][:], Ddxp)
                Dsl = (r["kl"][:] - r["asl"][:] * Dgv) / r["bl"][:]
                Dsu = (r["ku"][:] + r["asu"][:] * Dgv) / r["bu"][:]
                r["Dsl"][:] = Dsl
                r["Dsu"][:] = Dsu

            Dt = {}
            if nbu:
                us = du_rows(Ddu)
                Dt["ulo"] = us + res["ulo"]
                Dt["uhi"] = -us + res["uhi"]
            if nbx:
                xs = cxm * dx_rows(Ddxp)
                Dt["xlo"] = xs + res["xlo"]
                Dt["xhi"] = -xs + res["xhi"]
            if nHh:
                hv = rows_mv(r["Ch"][:], Ddxp)
                Dt["hlo"] = hv + res["hlo"]
                Dt["hhi"] = -hv + res["hhi"]
            if nS:
                Dt["ssl"] = Dgv + Dsl + res["ssl"]
                Dt["ssu"] = -Dgv + Dsu + res["ssu"]
                Dt["bsl"] = Dsl + res["bsl"]
                Dt["bsu"] = Dsu + res["bsu"]

            alpha = jnp.ones((1, 1, LB), dtype)
            for f, _rr in fams:
                tf = r["t_" + f][:]
                lf = r["l_" + f][:]
                Dtf = Dt[f]
                Dlf = (mu - lf * tf) / tf - a[f] * Dtf
                alpha = jnp.minimum(alpha, tau * ratio(tf, Dtf))
                alpha = jnp.minimum(alpha, tau * ratio(lf, Dlf))
                r["Dt_" + f][:] = Dtf

            fin = (jnp.isfinite(alpha)
                   & (jnp.min(jnp.where(jnp.isfinite(r["Ddx"][:]), 1.0, 0.0),
                              axis=(0, 1), keepdims=True) > 0.5)
                   & (jnp.min(jnp.where(jnp.isfinite(Ddu), 1.0, 0.0),
                              axis=(0, 1), keepdims=True) > 0.5))
            keep = (gap <= gap_floor) | ~fin
            alpha = jnp.where(keep, 0.0, alpha)

            # ---- apply the step ----
            r["dx"][:] = r["dx"][:] + alpha * r["Ddx"][:]
            r["du"][:] = r["du"][:] + alpha * Ddu
            if nS:
                r["sl"][:] = r["sl"][:] + alpha * r["Dsl"][:]
                r["su"][:] = r["su"][:] + alpha * r["Dsu"][:]
            for f, _rr in fams:
                tf = r["t_" + f][:]
                lf = r["l_" + f][:]
                Dtf = r["Dt_" + f][:]
                Dlf = (mu - lf * tf) / tf - (lf / tf) * Dtf
                r["t_" + f][:] = tf + alpha * Dtf
                r["l_" + f][:] = lf + alpha * Dlf
            return 0

        jax.lax.fori_loop(0, iters, body, 0)

        # ---------------- epilogue ----------------
        gap = jnp.zeros((1, 1, LB), dtype)
        for f, _rr in fams:
            gap = gap + jnp.sum(r["l_" + f][:] * r["t_" + f][:],
                                axis=(0, 1), keepdims=True)
        gap = gap / n_total
        dxp = r["dx"][0:N]
        cb = (jnp.sum(r["A"][:] * dxp[:, None, :, :], axis=2)
              + jnp.sum(r["B"][:] * r["du"][:][:, None, :, :], axis=2)
              + r["c"][:] - r["dx"][1:N + 1])
        eq = jnp.max(jnp.abs(cb), axis=(0, 1), keepdims=True)
        eq = jnp.maximum(eq, jnp.max(jnp.abs(r["dx0"][:] - r["dx"][0]),
                                     axis=0, keepdims=True)[None])
        r["dx_o"][:] = r["dx"][:]
        r["du_o"][:] = r["du"][:]
        r["gap_o"][:] = gap[0]
        r["eq_o"][:] = eq[0]

    # ------------------------------------------------------------------
    grid = (L // LB,)

    def lane_spec(lead):
        blk = tuple(lead) + (LB,)
        nlead = len(lead)
        return pl.BlockSpec(blk, lambda i, n=nlead: (0,) * n + (i,),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nlead = len(shape)
        return pl.BlockSpec(shape, lambda i, n=nlead: (0,) * n,
                            memory_space=pltpu.VMEM)

    in_specs = ([const_spec(s) for s in const_shapes]
                + [lane_spec(s) for s in in_shapes])
    out_specs = [lane_spec(s) for s in out_shapes]
    out_shape = [jax.ShapeDtypeStruct(s + (L,), dtype) for s in out_shapes]
    scratch = [pltpu.VMEM(s + (LB,), dtype) for s in sc_shapes]

    # padded tile sizes: the minor-most pair is tiled (8, 128), so the
    # second-minor dim pads to a multiple of 8 (see
    # kernels/riccati_pallas._padded_elems — the logical-shape formula
    # underestimates by ~1 MB/block at nx=14)
    from mpc_collisionavoidance_tpu.kernels.riccati_pallas import (
        _padded_elems)
    in_bytes = sum(_padded_elems(s, LB) for s in in_shapes) * 4
    sc_bytes = sum(_padded_elems(s, LB) for s in sc_shapes) * 4
    vmem_limit = int(min(2.2 * in_bytes + sc_bytes + 24 * 2**20, 110 * 2**20))

    cargs = [jnp.asarray(Qc), jnp.asarray(QN), jnp.asarray(Sc),
             jnp.asarray(Rc)]
    if nS:
        cargs += [jnp.asarray(v.astype(Qc.dtype))
                  for v in (zl, Zl, zu, Zu, lsh, ush)]
    args = cargs + [qp.A, qp.B, qp.c, qp.qx, qp.qu, qp.dx0]
    if nbu:
        args += [qp.ub_lo, qp.ub_hi]
    if nbx:
        args += [qp.xb_lo, qp.xb_hi]
    if nHh:
        args += [qp.Ch, qp.hh_lo, qp.hh_hi]
    if nS:
        args += [qp.Cs, qp.hofs, qp.slh, qp.suh]

    dx, du, gap, eq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)
    return dx, du, gap[0], eq[0]
