"""Inner-loop speed + heading NMPC: the reference `nmpc_low_level` node.

Re-implements the 100 Hz thrust controller (reference
catkin_ws/src/nmpc_ca/src/nmpc_low_level.cpp) as a pure tick over the
usv_low_level OCP (8 states incl. the (sin psi, cos psi) heading embedding,
N = 100, Tf = 1 s):

- x0 packs INS feedback plus the CARRIED thrust commands past_Tport /
  past_Tstbd (reference :206-213 — thrusts are states because the inputs
  are thrust rates, so the node's own last command is fed back, not a
  measurement);
- the reference is driven by references: yref = (psi_d, sin psi_d,
  cos psi_d, u_d, 0...0) on every stage (reference :221-246);
- thrust commands come from the STAGE-1 state (reference :257-260), with a
  hard zero override when u_d == 0 (reference :262-265);
- Tx / Tz telemetry uses the c = 0.78 asymmetric thrust map
  (reference :292-293).

In the 2024 paper this role is played by the adaptive sliding-mode
controller; in-repo this NMPC is the equivalent (SURVEY.md section 3.5).
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mpc_collisionavoidance_tpu.ocp.spec import OCPSpec
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver, SolverState

# usv_low_level state indices
IPSI, ISIN, ICOS, ISU, ISV, ISR, ITPORT, ITSTBD = range(8)
THRUST_C = 0.78   # starboard asymmetry (reference scripts/usv_low_level/usv_model.py:77)
BEAM = 0.41       # hull beam B (reference :76)


class LowLevelMeasurements(NamedTuple):
    psi: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    r: jnp.ndarray


class ThrustCommands(NamedTuple):
    t_port: jnp.ndarray
    t_stbd: jnp.ndarray
    e_u: jnp.ndarray      # speed error telemetry (reference :273-279)
    e_psi: jnp.ndarray    # heading error telemetry
    tx: jnp.ndarray       # surge force Tx = Tp + c*Ts (reference :292)
    tz: jnp.ndarray       # yaw moment Tz = (Tp - c*Ts)*B/2 (reference :293)
    solver_status: jnp.ndarray


class LowLevelState(NamedTuple):
    solver: SolverState
    past_t_port: jnp.ndarray   # command memory (reference :268-269)
    past_t_stbd: jnp.ndarray


class LowLevelController:
    def __init__(self, spec: OCPSpec, solver: Optional[RTISolver] = None,
                 ipm_iters: int = 8):
        assert spec.model.name == "usv_low_level", spec.model.name
        self.spec = spec
        self.solver = solver or RTISolver(spec, ipm_iters=ipm_iters)

    def init_state(self, meas: LowLevelMeasurements,
                   dtype=jnp.float32) -> LowLevelState:
        zero = jnp.asarray(0.0, dtype)
        x0 = self._pack_x0(meas, zero, zero)
        return LowLevelState(solver=self.solver.init_state(x0, dtype=dtype),
                             past_t_port=zero, past_t_stbd=zero)

    @staticmethod
    def _pack_x0(meas: LowLevelMeasurements, past_t_port, past_t_stbd):
        return jnp.stack([meas.psi, jnp.sin(meas.psi), jnp.cos(meas.psi),
                          meas.u, meas.v, meas.r, past_t_port, past_t_stbd])

    def tick(self, state: LowLevelState, meas: LowLevelMeasurements,
             psi_d, u_d):
        """One 100 Hz inner-loop tick -> thrust commands."""
        dtype = state.solver.xbar.dtype
        psi_d = jnp.asarray(psi_d, dtype)
        u_d = jnp.asarray(u_d, dtype)
        x0 = self._pack_x0(meas, state.past_t_port, state.past_t_stbd)

        yref = jnp.concatenate([
            jnp.stack([psi_d, jnp.sin(psi_d), jnp.cos(psi_d), u_d]),
            jnp.zeros((6,), dtype)])                       # v, r, T.., U..
        yref_stages = jnp.broadcast_to(yref, (self.spec.N, 10))
        yref_e = yref[:8]

        params = jnp.zeros((self.spec.model.np_,), dtype)
        solver_state, out = self.solver.step_fn(
            state.solver, x0, params, yref=yref_stages, yref_e=yref_e)

        # thrust from stage-1 state; zero override when commanded speed is 0
        stop = u_d == 0.0
        t_port = jnp.where(stop, 0.0, out.x1[ITPORT])
        t_stbd = jnp.where(stop, 0.0, out.x1[ITSTBD])

        cmds = ThrustCommands(
            t_port=t_port, t_stbd=t_stbd,
            e_u=u_d - meas.u, e_psi=psi_d - meas.psi,
            tx=t_port + THRUST_C * t_stbd,
            tz=(t_port - THRUST_C * t_stbd) * BEAM / 2.0,
            solver_status=out.status)
        new_state = LowLevelState(solver=solver_state,
                                  past_t_port=out.x1[ITPORT],
                                  past_t_stbd=out.x1[ITSTBD])
        return new_state, cmds
