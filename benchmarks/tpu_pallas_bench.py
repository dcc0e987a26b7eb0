"""TPU validation + bench for the Pallas Riccati backend.

Run on a live TPU:  python benchmarks/tpu_pallas_bench.py

1. correctness: one lane-engine tick with riccati="pallas" vs "lax" on the
   flagship OCP (tolerance appropriate for f32);
2. throughput: solves/s for both backends across batch sizes;
3. prints a recommendation for the bench.py default.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpc_collisionavoidance_tpu.ocp import builders
    from mpc_collisionavoidance_tpu.sim import scenarios
    from mpc_collisionavoidance_tpu.solver.batch import LaneRTISolver, to_lanes

    print("devices:", jax.devices())
    spec = builders.usv_guidance_ca1()        # nx=8, N=100
    sc = scenarios.guidance_ca1_default()

    # ---- correctness at B = 256 ----
    B = 256
    x0s = np.broadcast_to(sc.x0, (B, 8)).copy()
    x0s[:, 2] += np.linspace(-0.3, 0.3, B)
    xL = to_lanes(jnp.asarray(x0s, jnp.float32))
    pL = to_lanes(np.broadcast_to(sc.params, (B, 16)).astype(np.float32))
    lhL = to_lanes(np.broadcast_to(sc.lh, (B, 8)).astype(np.float32))

    outs = {}
    for backend in ("lax", "pallas", "pscan"):  # fused excluded: ~9 min compile
        solver = LaneRTISolver(spec, ipm_iters=12, riccati=backend)
        st = solver.init_state(x0s)
        st, out = jax.jit(solver.step_fn)(st, xL, pL, lhL)
        outs[backend] = np.asarray(out.u0)
        print(f"{backend}: u0[0,:3] = {outs[backend][0, :3]}")
    for b in ("pallas", "pscan"):
        du = np.max(np.abs(outs[b] - outs["lax"]))
        print(f"{b}-vs-lax max|du0| = {du:.2e}  "
              f"({'OK' if du < 1e-4 else 'MISMATCH'})")

    # ---- throughput sweep ----
    results = {}
    # pscan measured once (it is ~75x slower, docs/PERF.md); big batches
    # only for the two contenders so the sweep finishes in one run
    cases = ([("lax", B) for B in (512, 1024, 4096)]
             + [("pallas", B) for B in (512, 1024, 4096)]
             + [("pscan", 512)])
    for backend, B in cases:
        if True:
            solver = LaneRTISolver(spec, ipm_iters=12, riccati=backend)
            x0b = np.broadcast_to(sc.x0, (B, 8)).copy()
            x0b[:, 2] += 0.1 * np.random.default_rng(0).standard_normal(B)
            st = solver.init_state(x0b)
            xb = to_lanes(jnp.asarray(x0b, jnp.float32))
            pb = to_lanes(np.broadcast_to(sc.params, (B, 16)).astype(np.float32))
            lhb = to_lanes(np.broadcast_to(sc.lh, (B, 8)).astype(np.float32))
            step = jax.jit(solver.step_fn, donate_argnums=(0,))
            for _ in range(3):
                st, out = step(st, xb, pb, lhb)
                xb = out.x1
            float(out.gap.sum())
            ticks = 10
            t0 = time.perf_counter()
            for _ in range(ticks):
                st, out = step(st, xb, pb, lhb)
                xb = out.x1
            float(out.gap.sum())
            dt = time.perf_counter() - t0
            rate = B * ticks / dt
            results[(backend, B)] = rate
            print(f"{backend:7s} B={B:6d}: {rate:10,.0f} solves/s "
                  f"({dt / ticks * 1e3:6.1f} ms/tick)")

    best_lax = max(v for (b, _), v in results.items() if b == "lax")
    best_pal = max(v for (b, _), v in results.items() if b == "pallas")
    print(f"\nbest lax {best_lax:,.0f} vs best pallas {best_pal:,.0f} "
          "(bench.py defaults to pallas at B=512 from dedicated runs — "
          "rerun this sweep on an idle host; a busy CPU stretches ticks)")
    print("note: pscan trades accuracy in float32 (resolvent GE solves; "
          "expect ~1e-2 u0 deviation) — float64 parity is tested on CPU")


if __name__ == "__main__":
    main()
