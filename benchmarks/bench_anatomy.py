"""Tick anatomy: where the flagship lane-engine RTI tick actually goes.

Times, scan-amortized on the real TPU at the bench configuration
(B=512, riccati=pallas, linearize=pallas, adaptive@8):
  - the full step_fn tick,
  - QP build only (linearize kernel + assembly; all fields reduced so
    nothing is dead-code-eliminated),
  - IPM only (per-iteration perturbed dx0 so the scan cannot hoist it),
  - the bare Riccati kernel (per-iteration perturbed gradient).
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from mpc_collisionavoidance_tpu.kernels.riccati_pallas import (
        lqr_solve_lanes_pallas)
    from mpc_collisionavoidance_tpu.ocp import builders
    from mpc_collisionavoidance_tpu.ops.ipm_lanes import ipm_solve_lanes
    from mpc_collisionavoidance_tpu.ops.riccati_lanes import LaneLQR
    from mpc_collisionavoidance_tpu.sim import scenarios
    from mpc_collisionavoidance_tpu.solver.batch import (
        LaneRTISolver, to_lanes)

    B = int(os.environ.get("BA_BATCH", "512"))
    reps = int(os.environ.get("BA_REPS", "20"))
    iters = int(os.environ.get("BA_ITERS", "8"))
    spec = builders.usv_guidance_ca1()
    m = spec.model
    sc = scenarios.guidance_ca1_default()
    solver = LaneRTISolver(spec, ipm_iters=iters, riccati="pallas",
                           linearize="pallas", centering="adaptive")
    rng = np.random.default_rng(0)
    x0s = np.broadcast_to(sc.x0, (B, m.nx)).copy()
    x0s[:, 2] += 0.1 * rng.standard_normal(B)
    state = solver.init_state(x0s)
    xL = to_lanes(jnp.asarray(x0s, jnp.float32))
    pL = to_lanes(np.broadcast_to(sc.params, (B, m.np_)).astype(np.float32))
    lhL = to_lanes(np.broadcast_to(sc.lh, (B, m.nh)).astype(np.float32))

    def timed(tag, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3 / reps
        print(f"{tag:28s} {ms:7.3f} ms", flush=True)
        return ms

    # warm the solver state closed-loop style
    step = jax.jit(solver.step_fn)
    for _ in range(3):
        state, out = step(state, xL, pL, lhL)
        xL = out.x1
    jax.block_until_ready(state)

    @jax.jit
    def full_scan(state, x):
        def tick(c, _):
            st, xx = c
            st, o = solver.step_fn(st, xx, pL, lhL)
            return (st, o.x1), o.gap
        (st, xx), gaps = jax.lax.scan(tick, (state, x), None, length=10)
        return gaps.sum()

    ms = timed("full tick (scan/10)", full_scan, state, xL)
    print(f"  -> per tick {ms/10:.3f} ms = {B*10e3/ms:.0f} solves/s")

    @jax.jit
    def build_scan(state, x):
        def tick(c, _):
            xx = c
            qp = solver._build_qp(state, xx, pL, lhL)
            s = sum(jnp.sum(getattr(qp, f)) for f in
                    ("A", "B", "c", "dx0", "qx", "qu", "ub_lo", "ub_hi",
                     "xb_lo", "xb_hi", "Ch", "hh_lo", "hh_hi", "Cs",
                     "hofs", "slh", "suh"))
            return xx + 1e-6 * s, s
        xx, ss = jax.lax.scan(tick, x, None, length=10)
        return ss.sum()

    ms = timed("build_qp only (scan/10)", build_scan, state, xL)
    print(f"  -> per build {ms/10:.3f} ms")

    qp0 = jax.jit(solver._build_qp)(state, xL, pL, lhL)
    jax.block_until_ready(qp0)

    @jax.jit
    def ipm_scan(qp, x):
        def it(c, _):
            qpx = qp._replace(dx0=qp.dx0 + 1e-7 * c)
            sol = ipm_solve_lanes(qpx, solver.idxbu, solver.idxbx,
                                  iters=iters, riccati="pallas",
                                  centering="adaptive")
            return c + 1e-6 * sol.du[0, 0], sol.gap
        c, gaps = jax.lax.scan(it, x[0], None, length=10)
        return gaps.sum()

    ms = timed("ipm only (scan/10)", ipm_scan, qp0, xL)
    print(f"  -> per solve {ms/10:.3f} ms ({iters} iters, "
          f"{ms/10/iters:.3f} ms/iter)")

    # bare riccati kernel
    N, nx, nu, L = spec.N, m.nx, m.nu, B
    d = LaneLQR(
        A=jnp.asarray(0.95 * np.eye(nx)[None, :, :, None]
                      + 0.01 * rng.standard_normal((N, nx, nx, 1)),
                      jnp.float32) * jnp.ones((1, 1, 1, L), jnp.float32),
        B=jnp.asarray(0.05 * rng.standard_normal((N, nx, nu, L)), jnp.float32),
        c=jnp.zeros((N, nx, L), jnp.float32),
        Q=jnp.asarray(np.eye(nx)[None, :, :, None]
                      * np.ones((N + 1, 1, 1, L)), jnp.float32),
        S=jnp.zeros((N, nu, nx, L), jnp.float32),
        R=jnp.asarray(np.ones((N, nu, nu, L)), jnp.float32),
        qx=jnp.asarray(0.1 * rng.standard_normal((N + 1, nx, L)), jnp.float32),
        qu=jnp.zeros((N, nu, L), jnp.float32),
        dx0=jnp.zeros((nx, L), jnp.float32))

    @jax.jit
    def ric_scan(d, x):
        def it(c, _):
            dd = d._replace(qx=d.qx + 1e-7 * c)
            dx, du = lqr_solve_lanes_pallas(dd)
            return c + 1e-6 * du[0, 0], dx[0, 0]
        c, o = jax.lax.scan(it, x[0], None, length=10)
        return o.sum()

    ms = timed("riccati kernel (scan/10)", ric_scan, d, xL)
    print(f"  -> per sweep {ms/10:.3f} ms")


if __name__ == "__main__":
    main()
