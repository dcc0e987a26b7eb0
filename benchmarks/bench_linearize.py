"""Microbench: the fused linearization kernel at the flagship shape.

Sweeps the lane-block width (grid = (L/blk_l, ceil(N/blk_n)) steps run
SEQUENTIALLY on the TensorCore, so fewer/wider blocks trade per-grid-step
pipeline overhead against per-op issue width) and, when the Mosaic
stage-axis layout abort allows, the stage-block depth.

Run on TPU:  python benchmarks/bench_linearize.py
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

    from mpc_collisionavoidance_tpu.kernels.linearize_pallas import (
        linearize_lanes_pallas)
    from mpc_collisionavoidance_tpu.ocp import builders
    from mpc_collisionavoidance_tpu.sim import scenarios

    B = int(os.environ.get("LB_BATCH", "512"))
    reps = int(os.environ.get("LB_REPS", "50"))
    spec = builders.usv_guidance_ca1()
    m = spec.model
    sc = scenarios.guidance_ca1_default()
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        np.broadcast_to(sc.x0[:, None, None], (m.nx, spec.N, B))
        + 0.1 * rng.standard_normal((m.nx, spec.N, B)), jnp.float32)
    ub = jnp.asarray(0.1 * rng.standard_normal((m.nu, spec.N, B)),
                     jnp.float32)
    p = jnp.asarray(np.broadcast_to(sc.params[:, None], (m.np_, B)),
                    jnp.float32)

    for blk_l in (128, 256, 512):
        for blk_n in (8, 16, 32, 104):
            if B % blk_l:
                continue
            try:
                t0 = time.perf_counter()
                out = linearize_lanes_pallas(
                    xs, ub, p, f=m.f, h=m.h, dt=spec.dt,
                    integrator_steps=spec.integrator_steps, nh=m.nh,
                    lane_block=blk_l, stage_block=blk_n,
                    f_dep=m.f_dep, h_dep=m.h_dep)
                float(out[1].sum())
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = linearize_lanes_pallas(
                        xs, ub, p, f=m.f, h=m.h, dt=spec.dt,
                        integrator_steps=spec.integrator_steps, nh=m.nh,
                        lane_block=blk_l, stage_block=blk_n,
                        f_dep=m.f_dep, h_dep=m.h_dep)
                float(out[1].sum())
                ms = (time.perf_counter() - t0) * 1e3 / reps
                print(f"lane_block={blk_l:4d} stage_block={blk_n:3d}: "
                      f"{ms:.3f} ms/call (compile {compile_s:.1f} s)",
                      flush=True)
            except Exception as e:
                print(f"lane_block={blk_l:4d} stage_block={blk_n:3d}: "
                      f"FAILED {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
