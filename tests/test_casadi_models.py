"""Cross-check the casadi parity transcriptions against the production JAX
models (both claim the reference's scripts/<variant>/usv_model.py dynamics;
they only agree if both transcriptions are right)."""

import numpy as np
import pytest

from mpc_collisionavoidance_tpu.models import registry
from mpc_collisionavoidance_tpu.parity import casadi_models


@pytest.mark.parametrize("name", sorted(set(casadi_models.VARIANTS)))
def test_numeric_f_matches_jax_model(name):
    m = registry.get(casadi_models._registry_name(name))
    f_ref = casadi_models.numeric_f(name)
    rng = np.random.default_rng(hash(name) % 2**32)
    for _ in range(25):
        x = np.asarray(m.x0, float) + 0.8 * rng.standard_normal(m.nx)
        u = 0.5 * rng.standard_normal(m.nu)
        p = 5.0 + rng.standard_normal(m.np_) if m.np_ else np.zeros(0)
        want = np.asarray(m.f(x, u, p), float)
        got = np.asarray(f_ref(x, u, p), float)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=name)


@pytest.mark.parametrize("name", sorted(set(casadi_models.VARIANTS)))
def test_numeric_h_matches_jax_model(name):
    m = registry.get(casadi_models._registry_name(name))
    h_ref = casadi_models.numeric_h(name)
    if m.h is None:
        assert h_ref is None
        return
    assert h_ref is not None
    rng = np.random.default_rng(hash(name) % 2**32 + 1)
    for _ in range(25):
        x = np.asarray(m.x0, float) + 0.8 * rng.standard_normal(m.nx)
        u = 0.5 * rng.standard_normal(m.nu)
        p = 5.0 + rng.standard_normal(m.np_) if m.np_ else np.zeros(0)
        want = np.asarray(m.h(x, p), float)
        got = np.asarray(h_ref(x, u, p), float)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=name)


def test_piecewise_drag_branches_covered():
    """The if_else surge-drag switch at u > 1.25 must agree on BOTH branches
    (reference scripts/usv_pf_ca/usv_model.py:137-138)."""
    m = registry.get("usv_acados")
    f_ref = casadi_models.numeric_f("usv_acados")
    for u_val in (0.5, 1.9):
        x = np.array([u_val, 0.1, -0.05, 3.0, 2.0])
        u = np.array([1.0, -1.0])
        np.testing.assert_allclose(
            np.asarray(f_ref(x, u, np.zeros(0))),
            np.asarray(m.f(x, u, np.zeros(0))), rtol=1e-12, atol=1e-12)


def test_casadi_binding_importgated():
    """make_casadi_model_fn is constructible everywhere; calling it without
    casadi raises ImportError (the acados machine path is exercised in
    parity/run_acados_parity.py)."""
    fn = casadi_models.make_casadi_model_fn("usv_guidance_ca1")
    try:
        import casadi  # noqa: F401
        has_casadi = True
    except ImportError:
        has_casadi = False
    if has_casadi:
        x, u, p, f, h = fn()
        assert f.shape[0] == 8 and h.shape[0] == 8
    else:
        with pytest.raises(ImportError):
            fn()
