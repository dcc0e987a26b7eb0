"""Experiment runner CLI — the reference's `python main.py` experience.

The reference runs one closed-loop experiment per variant directory,
printing avg/max solve time and MSE/MAE tracking errors and popping
matplotlib windows (reference scripts/usv_guidance_ca1/main.py:189-205).
Here one command runs any variant at any horizon from a JSON config or
flags, prints the same metrics as structured JSON, and saves the
dashboard PNGs:

    python -m mpc_collisionavoidance_tpu run --model usv_guidance_ca1 \
        --steps 1000 --plots /tmp/flagship
    python -m mpc_collisionavoidance_tpu run --config exp.json
    python -m mpc_collisionavoidance_tpu bench       # headline solves/s
    python -m mpc_collisionavoidance_tpu models      # list the zoo
"""

import argparse
import json
import sys


def _cmd_models(_args):
    from mpc_collisionavoidance_tpu.models import registry
    for name in registry.names():
        m = registry.get(name)
        print(f"{name:22s} nx={m.nx:2d} nu={m.nu} nh={m.nh} np={m.np_}")
    return 0


def _cmd_run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_collisionavoidance_tpu.config import FrameworkConfig
    from mpc_collisionavoidance_tpu.sim import scenarios
    from mpc_collisionavoidance_tpu.sim.closed_loop import run_closed_loop
    from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver
    from mpc_collisionavoidance_tpu.utils.profiling import SolveTimer

    if args.platform:
        jax.config.update("jax_default_device",
                          jax.devices(args.platform)[0])

    if args.config:
        with open(args.config) as f:
            cfg = FrameworkConfig.from_dict(json.load(f))
    else:
        cfg = FrameworkConfig(model=args.model, N=args.N, Tf=args.tf)

    spec = cfg.build_spec()
    solver = RTISolver(spec, ipm_iters=cfg.solver.ipm_iters)

    # scenario: the flagship default where applicable, else model defaults
    if cfg.model == "usv_guidance_ca1":
        sc = scenarios.guidance_ca1_default()
        x0, params, lh = sc.x0, sc.params, sc.lh
        err_idx = (3, 2)
    else:
        m = spec.model
        x0 = m.x0
        params = (np.full((m.np_,), 100.0) if m.np_ else np.zeros((0,)))
        lh = None
        err_idx = (0, 1) if m.nx >= 2 else (0, 0)

    run = jax.jit(lambda x, p: run_closed_loop(
        solver, x, p, lh, n_steps=args.steps, err_idx=err_idx,
        transient=min(400, args.steps // 2),
        metric_norm=max(args.steps - min(400, args.steps // 2), 1)))
    timer = SolveTimer(batch=args.steps)
    with timer.tick():   # compile + full run (one device program)
        res = run(jnp.asarray(x0), jnp.asarray(params))
        jax.block_until_ready(res.simX)
    with timer.tick():   # steady-state rerun
        res = run(jnp.asarray(x0), jnp.asarray(params))
        jax.block_until_ready(res.simX)

    simX = np.asarray(res.simX)
    status = np.asarray(res.status)
    out = {
        "model": cfg.model, "N": cfg.N, "Tf": cfg.Tf, "steps": args.steps,
        "psi_mae": float(res.psi_mae), "ye_mae": float(res.ye_mae),
        "psi_mse": float(res.psi_mse), "ye_mse": float(res.ye_mse),
        "status_ok_rate": float(np.mean(status == 0)),
        "finite": bool(np.all(np.isfinite(simX))),
        "compile_plus_run_s": round(timer.samples[0], 3),
        "steady_run_s": round(timer.samples[1], 3),
        "solves_per_s_closed_loop": round(args.steps / timer.samples[1], 1),
    }
    print(json.dumps(out))

    if args.plots:
        from mpc_collisionavoidance_tpu.utils import plotting
        if cfg.model == "usv_guidance_ca1":
            obstacles = np.asarray(params).reshape(-1, 2)[:4]
            radii = np.asarray(lh)[:4]
            plotting.plot_flagship(simX, np.asarray(res.simU), spec.dt,
                                   obstacles, radii, save_path=args.plots)
            print(f"plots: {args.plots}_timeseries.png, {args.plots}_xy.png",
                  file=sys.stderr)
    return 0 if out["finite"] else 1


def _cmd_bench(_args):
    import runpy
    sys.argv = ["bench.py"]
    from pathlib import Path
    bench = Path(__file__).resolve().parent.parent / "bench.py"
    runpy.run_path(str(bench), run_name="__main__")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mpc_collisionavoidance_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="closed-loop experiment")
    p_run.add_argument("--config", help="FrameworkConfig JSON file")
    p_run.add_argument("--model", default="usv_guidance_ca1")
    p_run.add_argument("-N", type=int, default=100)
    p_run.add_argument("--tf", type=float, default=5.0)
    p_run.add_argument("--steps", type=int, default=1000)
    p_run.add_argument("--plots", help="save dashboards to this path prefix")
    p_run.add_argument("--platform", help="pin jax platform (cpu/tpu)")
    p_run.set_defaults(fn=_cmd_run)

    p_bench = sub.add_parser("bench", help="headline throughput benchmark")
    p_bench.set_defaults(fn=_cmd_bench)

    p_models = sub.add_parser("models", help="list the model zoo")
    p_models.set_defaults(fn=_cmd_models)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
