"""Framework configuration layer.

The reference has NO config system: dims live in C++ #defines, weights and
horizons in Python literals, rates hard-coded per node — with two latent
hazards SURVEY.md section 5 documents (loop rate accidentally tied to the
horizon macro; a dim macro that disagrees with the state enum).  This
module is the explicit replacement: one validated dataclass tree covering
model choice, horizon, solver engine, and mesh/batch shape, serializable
to/from plain dicts (JSON-able) so experiment configs are artifacts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from mpc_collisionavoidance_tpu.models import registry
from mpc_collisionavoidance_tpu.ocp import builders


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    engine: str = "lane"          # "lane" (throughput) | "instance" (vmap)
    ipm_iters: int = 12
    ipm_tol: float = 1e-7
    riccati: str = "lax"          # lane engine: "lax" | "pallas" | "pscan"
                                  # | "fused" (whole-IPM kernel)
    linearize: str = "lax"        # lane engine: "lax" | "pallas" (fused
                                  # rollout+VDE kernel, TPU only)
    qp_backend: str = "riccati"   # instance engine: "riccati" | "dense"
                                  # (full condensing, the qpOASES role)
    centering: str = "fixed"      # "fixed" | "adaptive" (lane engine:
                                  # per-lane sigma heuristic, ~8 IPM
                                  # iters to the f32 gap floor) |
                                  # "mehrotra" (both engines: full
                                  # predictor-corrector + use with
                                  # mu0="auto" for 1e5-scale weights,
                                  # docs/PERF.md)
    mu0: object = 1.0             # initial barrier weight: float | "auto"
    dtype: str = "float32"

    def __post_init__(self):
        if self.engine not in ("lane", "instance"):
            raise ValueError(f"unknown engine '{self.engine}'")
        if self.riccati not in ("lax", "pallas", "pallas_interpret",
                                "pscan", "fused", "fused_interpret"):
            raise ValueError(f"unknown riccati backend '{self.riccati}'")
        if self.linearize not in ("lax", "pallas", "pallas_interpret"):
            raise ValueError(
                f"unknown linearize backend '{self.linearize}'")
        if self.qp_backend not in ("riccati", "dense"):
            raise ValueError(f"unknown qp_backend '{self.qp_backend}'")
        if self.centering not in ("fixed", "adaptive", "mehrotra"):
            raise ValueError(f"unknown centering '{self.centering}'")
        if self.centering != "fixed" and self.riccati.startswith("fused"):
            raise ValueError(f"{self.centering} centering is not available "
                             "in the fused whole-IPM kernel")
        if self.centering == "adaptive" and self.engine == "instance":
            raise ValueError("adaptive centering is lane-engine-only; the "
                             "instance engine supports fixed/mehrotra")
        if isinstance(self.mu0, str) and self.mu0 != "auto":
            raise ValueError(f"unknown mu0 '{self.mu0}' (float or 'auto')")
        if self.engine == "instance" and self.riccati != "lax":
            raise ValueError("pallas riccati requires the lane engine")
        if self.engine == "instance" and self.linearize != "lax":
            raise ValueError("pallas linearize requires the lane engine")
        if self.engine == "lane" and self.qp_backend != "riccati":
            raise ValueError("the dense QP backend requires the "
                             "instance engine")


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    n_devices: Optional[int] = None   # None = all visible
    axis_name: str = "dp"
    batch_per_device: int = 1024


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    """Top-level config: model + horizon + solver + parallel layout."""
    model: str = "usv_guidance_ca1"
    N: int = 100
    Tf: float = 5.0
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    parallel: ParallelConfig = dataclasses.field(
        default_factory=ParallelConfig)

    def __post_init__(self):
        known = sorted(set(registry.names()) | set(builders.BUILDERS))
        if self.model not in known:
            raise ValueError(
                f"unknown model '{self.model}'; known: {known}")
        if self.N < 1 or self.Tf <= 0:
            raise ValueError(f"bad horizon N={self.N}, Tf={self.Tf}")

    # ------------------------------------------------------------------
    def build_spec(self):
        return builders.build(self.model, Tf=self.Tf, N=self.N)

    def build_solver(self):
        """Instantiate the configured solver engine for this OCP."""
        spec = self.build_spec()
        if self.solver.engine == "lane":
            from mpc_collisionavoidance_tpu.solver.batch import LaneRTISolver
            return LaneRTISolver(spec, ipm_iters=self.solver.ipm_iters,
                                 ipm_tol=self.solver.ipm_tol,
                                 riccati=self.solver.riccati,
                                 linearize=self.solver.linearize,
                                 centering=self.solver.centering,
                                 mu0=self.solver.mu0)
        from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver
        return RTISolver(spec, ipm_iters=self.solver.ipm_iters,
                         ipm_tol=self.solver.ipm_tol,
                         qp_backend=self.solver.qp_backend,
                         centering=self.solver.centering,
                         mu0=self.solver.mu0)

    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "FrameworkConfig":
        d = dict(d)
        if "solver" in d and isinstance(d["solver"], dict):
            d["solver"] = SolverConfig(**d["solver"])
        if "parallel" in d and isinstance(d["parallel"], dict):
            d["parallel"] = ParallelConfig(**d["parallel"])
        return cls(**d)
