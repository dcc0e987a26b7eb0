"""Executable acados-parity runner for every OCP variant.

Usage (on a machine with acados_template + casadi installed):

    python -m mpc_collisionavoidance_tpu.parity.run_acados_parity           # all
    python -m mpc_collisionavoidance_tpu.parity.run_acados_parity usv_pf_ca --ticks 200

For each variant this
1. builds the OCPSpec (`ocp/builders.py`) and the matching AcadosOcpSolver
   through `parity/acados_oracle.build_acados_solver` fed by the casadi
   transcription in `parity/casadi_models.py`,
2. runs the reference's closed-loop experiment (solver-as-plant,
   x0 <- stage-1 prediction, reference scripts/usv_guidance_ca1/
   main.py:116-186) on BOTH stacks with identical scenario inputs and RTI
   schedule (one linearize + one QP per tick, both warm-started from the
   all-x0 trajectory), and
3. reports the max control/state deviation over the run against the
   BASELINE.md target of <1e-3 control-trajectory deviation.

Where acados is NOT installed (the TPU image), the runner exits with a
clear message and rc=2; the transcriptions themselves are still verified
in-image by tests/test_casadi_models.py, and regression protection comes
from the committed golden trajectories (tests/test_golden.py).
"""

import argparse
import json
import sys

import numpy as np


# per-variant closed-loop scenario: (x0, params, lh, ticks, err note)
def _scenario(name, spec):
    from mpc_collisionavoidance_tpu.sim import scenarios
    m = spec.model
    if name == "usv_guidance_ca1":
        sc = scenarios.guidance_ca1_default()
        return sc.x0, sc.params, sc.lh, None, None
    if name == "usv_guidance_ca":
        sc = scenarios.guidance_ca_default()
        return sc.x0, sc.params, sc.lh, None, None
    if name == "usv_pf_ca":
        sc = scenarios.pf_ca_default()
        yref = np.tile(sc.yref, (spec.N, 1))
        return sc.x0, sc.params, sc.lh, yref, sc.yref_e
    if name == "usv_pf":
        sc = scenarios.pf_default()
        yref = np.tile(sc.yref, (spec.N, 1))
        return sc.x0, sc.params, sc.lh, yref, sc.yref_e
    if name == "usv_acados":
        sc = scenarios.acados_speed_default()
        yref = np.tile(sc.yref, (spec.N, 1))
        return sc.x0, sc.params, sc.lh, yref, sc.yref_e
    # generic: start at the model x0, builder default references, far
    # obstacles if the model is parametric
    params = np.full(m.np_, 100.0) if m.np_ else np.zeros(0)
    lh = np.asarray(m.lh, float) if m.nh else None
    return np.asarray(m.x0, float), params, lh, None, None


def run_variant(name, ticks=300, rtol=1e-3, verbose=True):
    """Returns a result dict; raises ImportError where acados is absent."""
    from mpc_collisionavoidance_tpu.ocp import builders
    from mpc_collisionavoidance_tpu.parity.acados_oracle import (
        build_acados_solver)
    from mpc_collisionavoidance_tpu.parity.casadi_models import (
        make_casadi_model_fn)
    from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    spec = builders.build(name)
    x0, params, lh, yref, yref_e = _scenario(name, spec)
    N, m = spec.N, spec.model
    if m.nh == 0 or (lh is not None and np.size(lh) == 0):
        lh = None
    if m.np_ and np.size(params) == 0:
        params = np.full(m.np_, 100.0)

    aca = build_acados_solver(spec, make_casadi_model_fn(name),
                              json_file=f"acados_ocp_{name}.json")

    ours = RTISolver(spec, ipm_iters=30, ipm_tol=1e-10)
    st = ours.init_state(jnp.asarray(x0), dtype=jnp.float64)

    # identical warm start on the acados side (all stages at x0)
    for j in range(N + 1):
        aca.set(j, "x", np.asarray(x0, float))

    yref_stage = (np.asarray(spec.cost.yref, float)
                  if yref is None else None)
    yref_term = (np.asarray(spec.cost.yref_e, float)
                 if yref_e is None else np.asarray(yref_e, float))

    dev_u, dev_x = 0.0, 0.0
    xa = np.asarray(x0, float)
    xj = jnp.asarray(x0)
    for i in range(ticks):
        # ---- acados tick ----
        aca.set(0, "lbx", xa)
        aca.set(0, "ubx", xa)
        for j in range(N):
            aca.set(j, "yref",
                    yref_stage if yref is None else np.asarray(yref[j]))
            if m.np_:
                aca.set(j, "p", np.asarray(params, float))
            if lh is not None:
                aca.constraints_set(j, "lh", np.asarray(lh, float))
        aca.set(N, "yref", yref_term)
        if m.np_:
            aca.set(N, "p", np.asarray(params, float))
        status = aca.solve()
        if status != 0 and verbose:
            print(f"  [acados] status {status} at tick {i}", file=sys.stderr)
        ua = aca.get(0, "u")
        xa_next = aca.get(1, "x")

        # ---- our tick ----
        st, out = ours.step(st, xj, jnp.asarray(params),
                            None if lh is None else jnp.asarray(lh),
                            yref=None if yref is None else jnp.asarray(yref),
                            yref_e=None if yref_e is None
                            else jnp.asarray(yref_e))
        uj = np.asarray(out.u0, float)
        xj_next = np.asarray(out.x1, float)

        dev_u = max(dev_u, float(np.max(np.abs(ua - uj))))
        dev_x = max(dev_x, float(np.max(np.abs(xa_next - xj_next))))

        xa, xj = xa_next, jnp.asarray(xj_next)

    ok = dev_u < rtol
    return {"variant": name, "ticks": ticks, "max_u_dev": dev_u,
            "max_x_dev": dev_x, "target": rtol, "ok": bool(ok)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("variant", nargs="?", default="all")
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--target", type=float, default=1e-3)
    args = ap.parse_args(argv)

    from mpc_collisionavoidance_tpu.parity.acados_oracle import (
        acados_available)
    from mpc_collisionavoidance_tpu.parity.casadi_models import VARIANTS

    names = [v for v in VARIANTS if v != "race_cars_dev"] \
        if args.variant == "all" else [args.variant]
    if not acados_available():
        print("acados_template/casadi not installed in this image; the "
              "casadi transcriptions are cross-checked by "
              "tests/test_casadi_models.py and behavior is pinned by "
              "tests/test_golden.py. Run this script on an acados machine "
              "for the direct <1e-3 comparison.", file=sys.stderr)
        return 2

    rc = 0
    for name in names:
        res = run_variant(name, ticks=args.ticks, rtol=args.target)
        print(json.dumps(res))
        if not res["ok"]:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
