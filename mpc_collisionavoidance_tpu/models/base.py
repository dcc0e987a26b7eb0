"""Model container: a continuous-time OCP model as pure functions + static data.

This is the information content of the reference's per-variant
``scripts/<variant>/usv_model.py`` CasADi structs (e.g. reference
scripts/usv_guidance_ca1/usv_model.py:40-199): explicit dynamics, nonlinear
constraint expression, bounds and the default initial state — but expressed as
JAX-traceable functions instead of CasADi MX graphs, so Jacobians come from
`jax.jacfwd` instead of generated VDE C code.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np

Array = np.ndarray
DynFn = Callable[..., object]  # f(x, u, p) -> xdot
ConFn = Callable[..., object]  # h(x, p) -> (nh,)

def _empty():
    return np.zeros((0,))


@dataclasses.dataclass(frozen=True)
class Model:
    """A continuous-time control model x' = f(x, u, p) with constraints h(x, p).

    All bound arrays follow the acados convention of *index sets*: `idxbx`
    selects which states carry box bounds at the intermediate shooting nodes
    (stage 0 is pinned to the measured state by the solver, mirroring
    lbx0 = ubx0 = x0 in reference src/nmpc_guidance_ca1.cpp:509-510).
    """

    name: str
    nx: int
    nu: int
    np_: int                      # number of runtime parameters (obstacle table)
    f: DynFn                      # continuous dynamics f(x, u, p) -> xdot
    x0: Array                     # default initial state
    state_names: Tuple[str, ...]
    control_names: Tuple[str, ...]
    # control box bounds (always present; +-inf when unbounded)
    lbu: Array = dataclasses.field(default_factory=_empty)
    ubu: Array = dataclasses.field(default_factory=_empty)
    idxbu: Array = dataclasses.field(default_factory=_empty)
    # state box bounds at intermediate stages
    lbx: Array = dataclasses.field(default_factory=_empty)
    ubx: Array = dataclasses.field(default_factory=_empty)
    idxbx: Array = dataclasses.field(default_factory=_empty)
    # nonlinear constraints h(x, p) with lh <= h <= uh
    h: Optional[ConFn] = None
    nh: int = 0
    lh: Array = dataclasses.field(default_factory=_empty)
    uh: Array = dataclasses.field(default_factory=_empty)
    # structural input sparsity (the information CasADi extracts
    # symbolically for its VDE codegen): indices of (x, u) coordinates f
    # reads, and of x coordinates h reads.  None = dense.  Skipped
    # tangent passes are BITWISE-exact identity/zero columns (see
    # ops/sparsity.py); declarations are verified against jacfwd probing
    # in tests/test_sparsity.py.
    f_dep: Optional[Tuple[int, ...]] = None
    h_dep: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        assert len(self.state_names) == self.nx, self.name
        assert len(self.control_names) == self.nu, self.name
        assert self.x0.shape == (self.nx,), self.name
        if self.h is not None:
            assert self.nh > 0

    def empty_params(self) -> Array:
        return np.zeros((self.np_,))
