"""Structural input-dependency declarations vs jacfwd probing.

Every model in the zoo declares `f_dep` (the (x, u) coordinates its
dynamics read) and `h_dep` (the x coordinates its constraints read); the
linearization paths skip the other tangent passes, substituting EXACT
identity/zero Jacobian columns (ops/sparsity.py).  These tests pin:

1. every declaration equals the probed dependency set (a missing index
   would silently corrupt the Jacobian; an extra one only wastes work);
2. the sparse lane-engine QP is BITWISE identical to the dense one
   (skipped passes are exactly trivial, not approximately);
3. the Pallas kernel honors the declarations (interpret mode).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.models import variants
from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.ops.sparsity import (
    constraint_dependency, input_dependency)
from mpc_collisionavoidance_tpu.sim import scenarios
from mpc_collisionavoidance_tpu.solver.batch import LaneRTISolver, to_lanes


@pytest.mark.parametrize("name", sorted(builders.BUILDERS))
def test_declared_deps_match_probe(name):
    spec = builders.build(name)
    m = spec.model
    probed_f = input_dependency(m.f, m.nx, m.nu, m.np_)
    assert m.f_dep is not None, f"{name}: declare f_dep"
    assert tuple(m.f_dep) == probed_f, (
        f"{name}: declared f_dep {m.f_dep} != probed {probed_f}")
    if m.nh:
        probed_h = constraint_dependency(m.h, m.nx, m.np_)
        assert m.h_dep is not None, f"{name}: declare h_dep"
        assert tuple(m.h_dep) == probed_h, (
            f"{name}: declared h_dep {m.h_dep} != probed {probed_h}")


def test_curved_race_car_is_dense():
    """An injected curvature interpolant makes f read s and n — the
    straight-track sparsity must NOT be reused (it would silently drop
    the kappa(s) Jacobian terms)."""
    from mpc_collisionavoidance_tpu.utils.track import (
        make_kappa_fn, make_synthetic_track)

    track = make_synthetic_track()
    m = variants.race_cars(kappa_fn=make_kappa_fn(track))
    probed = input_dependency(m.f, m.nx, m.nu, m.np_)
    assert set(probed) <= set(m.f_dep), (probed, m.f_dep)
    assert 0 in m.f_dep and 1 in m.f_dep


def _qp_pair(linearize, interpret_suffix=""):
    spec = builders.usv_guidance_ca1(Tf=1.0, N=10)
    sc = scenarios.guidance_ca1_default()
    B = 4
    rng = np.random.default_rng(0)
    x0s = np.broadcast_to(sc.x0, (B, 8)).copy()
    x0s[:, 2] += 0.3 * rng.standard_normal(B)
    xL = to_lanes(jnp.asarray(x0s, jnp.float64))
    pL = to_lanes(jnp.asarray(
        np.broadcast_to(sc.params, (B, 16)), jnp.float64))
    lhL = to_lanes(jnp.asarray(np.broadcast_to(sc.lh, (B, 8)), jnp.float64))

    qps = []
    for dense in (False, True):
        s = LaneRTISolver(spec, ipm_iters=5, linearize=linearize)
        if dense:
            m = spec.model
            s.spec = dataclasses.replace(
                spec, model=dataclasses.replace(m, f_dep=None, h_dep=None))
        st = s.init_state(x0s, dtype=jnp.float64)
        # a non-trivial iterate so Jacobians are state-dependent
        st, out = s.step_fn(st, xL, pL, lhL)
        qps.append(s._build_qp(st, out.x1, pL, lhL))
    return qps


@pytest.mark.parametrize("linearize", ["lax", "pallas_interpret"])
def test_sparse_qp_bitwise_equals_dense(linearize):
    qp_sparse, qp_dense = _qp_pair(linearize)
    for field in ("A", "B", "c", "Ch", "Cs", "hofs", "qx", "qu"):
        a = np.asarray(getattr(qp_sparse, field))
        b = np.asarray(getattr(qp_dense, field))
        assert np.array_equal(a, b), f"{field} differs (not bitwise-exact)"
