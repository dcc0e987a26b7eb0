"""Fused whole-IPM Pallas kernel vs the lax lane IPM (interpret mode).

The fused kernel (kernels/ipm_pallas.py) re-implements the entire
path-following iteration loop of ops/ipm_lanes.ipm_solve_lanes inside one
Pallas program.  In interpret mode the two must agree BITWISE-level tight
(same float64 operations in the same order); TPU execution is validated
separately on hardware (docs/PERF.md notes 512/512 converged lanes and
u0 agreement 4e-6 vs the per-iteration pallas backend in float32).
"""

import jax.numpy as jnp
import pytest
import numpy as np

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.ops.ipm_lanes import ipm_solve_lanes
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.solver.batch import LaneRTISolver, to_lanes


def _flagship_qp(N=8, L=128, dtype=jnp.float64):
    spec = builders.usv_guidance_ca1(Tf=0.4, N=N)
    sc = scenarios.guidance_ca1_default()
    solver = LaneRTISolver(spec, ipm_iters=5)
    rng = np.random.default_rng(0)
    x0s = np.broadcast_to(sc.x0, (L, 8)).astype(np.float64).copy()
    x0s[:, 2] += 0.1 * rng.standard_normal(L)
    st = solver.init_state(x0s, dtype=dtype)
    qp = solver._build_qp(
        st, to_lanes(jnp.asarray(x0s, dtype)),
        to_lanes(np.broadcast_to(sc.params, (L, 16)).astype(np.float64)),
        to_lanes(np.broadcast_to(sc.lh, (L, 8)).astype(np.float64)))
    return solver, qp


def test_fused_ipm_matches_lax_exactly():
    solver, qp = _flagship_qp()
    ref = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=5,
                          riccati="lax")
    fus = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=5,
                          riccati="fused_interpret",
                          fused_static=solver._fused_static)
    assert int(jnp.max(fus.status)) <= 1
    np.testing.assert_allclose(np.asarray(fus.dx), np.asarray(ref.dx),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fus.du), np.asarray(ref.du),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fus.gap), np.asarray(ref.gap),
                               rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(fus.status),
                                  np.asarray(ref.status))


def test_fused_backend_through_solver():
    """LaneRTISolver(riccati='fused_interpret') end to end for one tick."""
    spec = builders.usv_guidance_ca1(Tf=0.4, N=8)
    sc = scenarios.guidance_ca1_default()
    L = 128
    x0s = np.broadcast_to(sc.x0, (L, 8)).astype(np.float64).copy()
    pL = to_lanes(np.broadcast_to(sc.params, (L, 16)).astype(np.float64))
    lhL = to_lanes(np.broadcast_to(sc.lh, (L, 8)).astype(np.float64))
    outs = {}
    for backend in ("lax", "fused_interpret"):
        solver = LaneRTISolver(spec, ipm_iters=5, riccati=backend)
        st = solver.init_state(x0s, dtype=jnp.float64)
        _, out = solver.step_fn(st, to_lanes(jnp.asarray(x0s)), pL, lhL)
        outs[backend] = np.asarray(out.u0)
    np.testing.assert_allclose(outs["fused_interpret"], outs["lax"],
                               rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_fused_ipm_full_hull_nx14():
    """Fused kernel on the FULL 14-state hydrodynamic hull (usv_pf_ca:
    nu=2, 4 HARD h rows, state boxes — no soft family): must match the
    lax lane IPM exactly.  This is the kernel's claimed-but-previously-
    unverified shape (kernels/riccati_pallas.py VMEM-fit note)."""
    spec = builders.usv_pf_ca(Tf=0.4, N=8)
    sc = scenarios.pf_ca_default()
    L = 128
    rng = np.random.default_rng(3)
    x0s = np.broadcast_to(sc.x0, (L, 14)).astype(np.float64).copy()
    x0s[:, 6] += 0.1 * rng.standard_normal(L)
    solver = LaneRTISolver(spec, ipm_iters=5)
    st = solver.init_state(x0s, dtype=jnp.float64)
    qp = solver._build_qp(
        st, to_lanes(jnp.asarray(x0s)),
        to_lanes(np.broadcast_to(sc.params, (L, 8)).astype(np.float64)),
        to_lanes(np.broadcast_to(sc.lh, (L, 4)).astype(np.float64)))
    ref = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=5,
                          riccati="lax")
    fus = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=5,
                          riccati="fused_interpret",
                          fused_static=solver._fused_static)
    np.testing.assert_allclose(np.asarray(fus.dx), np.asarray(ref.dx),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fus.du), np.asarray(ref.du),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(fus.status),
                                  np.asarray(ref.status))


def test_fused_ipm_ragged_lanes():
    """The fused whole-IPM kernel accepts any lane count (pads to a
    128-multiple internally, slices back)."""
    solver, qp = _flagship_qp(L=5)
    ref = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=5,
                          riccati="lax")
    fus = ipm_solve_lanes(qp, solver.idxbu, solver.idxbx, iters=5,
                          riccati="fused_interpret",
                          fused_static=solver._fused_static)
    assert fus.dx.shape == ref.dx.shape
    np.testing.assert_allclose(np.asarray(fus.dx), np.asarray(ref.dx),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fus.du), np.asarray(ref.du),
                               rtol=1e-12, atol=1e-12)
