"""Pallas TPU kernels for the solver hot path (SURVEY.md section 7, layer 4).

The reference's speed-of-light layer is BLASFEO's cache-tiled small-matrix
kernels inside HPIPM's Riccati recursion (SURVEY.md N2/N3).  The TPU
equivalent is not a faster 8x8 factorization — it is removing the XLA
per-op dispatch overhead of the 100-stage sequential sweep by fusing the
entire backward+forward Riccati recursion for a 128-lane block into ONE
Pallas program whose working set lives in VMEM.
"""

from mpc_collisionavoidance_tpu.kernels.riccati_pallas import (  # noqa: F401
    lqr_solve_lanes_pallas)
