"""Full-model node controllers: the single-layer PF node and the
velocity/thrust node as pure, vmappable ticks.

Completes the L4 node layer (SURVEY.md N6/N8) alongside the flagship
(`guidance/controller.py`), the inner loop (`guidance/low_level.py`) and
the plain guidance variants (`guidance/variants.py`):

- `PFController` — the reference `nmpc_pf` node (reference
  catkin_ws/src/nmpc_ca/src/nmpc_pf.cpp): single-layer path-following NMPC
  over the FULL 14-state hydrodynamic model driving thrusters directly.
  Waypoint manager + crab-angle (sin chi, cos chi) packing + carried
  Tport/Tstbd command memory + stage-1 thrust extraction + Tx/Tz control
  input telemetry.
- `ThrustMPCController` — the reference `acados_mpc` node (reference
  src/acados_mpc.cpp): 5-state velocity/thrust NMPC that tracks
  u_des = 1.0 m/s and publishes thrusters from the stage-1 state with
  carried thrust memory.

The ROS pub/sub seams become function arguments and returned NamedTuples;
the nodes' mutable members (`past_Tport`, `past_Tstbd`, `k`, acados warm
start) become explicit state carries, so fleets batch under `jax.vmap` and
missions run under `jax.lax.scan`.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mpc_collisionavoidance_tpu.guidance.waypoints import (
    MissionState, mission_init, waypoint_manager)
from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver, SolverState

# usv_pf state indices (reference src/nmpc_pf.cpp:63-78)
(PPSI, PSIN, PCOS, PU, PV, PR, PYE, PX1, PY1, PAK, PNEDX, PNEDY,
 PTPORT, PTSTBD) = range(14)
# usv_acados state indices (reference src/acados_mpc.cpp:60-66)
AU, AV, AR, ATPORT, ATSTBD = range(5)

# Tx/Tz *telemetry* map of the pf node (reference src/nmpc_pf.cpp:372-373).
# Note the reference quirk reproduced here: the pf MODEL's thrust map uses
# c = 1.0 (scripts/usv_pf/usv_model.py:77) but the node's control-input
# telemetry uses the asymmetric c = 0.78.
THRUST_C = 0.78
BEAM = 0.41


class PFMeasurements(NamedTuple):
    """INS feedback (reference nmpc_pf.cpp velocity/position callbacks
    :198-213)."""
    u: jnp.ndarray
    v: jnp.ndarray
    r: jnp.ndarray
    nedx: jnp.ndarray
    nedy: jnp.ndarray
    psi: jnp.ndarray


class PFCommands(NamedTuple):
    """The pf node's published outputs (reference :349-376)."""
    t_port: jnp.ndarray      # left thruster  = x1[Tport] (stage-1 state)
    t_stbd: jnp.ndarray      # right thruster = x1[Tstbd]
    u_d: jnp.ndarray         # desired speed (0.7 cruising / 0.0 done, :241-266)
    e_u: jnp.ndarray         # speed error telemetry (:362)
    e_ye: jnp.ndarray        # cross-track error telemetry (:363)
    tx: jnp.ndarray          # Tx = Tp + 0.78*Ts (:372)
    tz: jnp.ndarray          # Tz = (Tp - 0.78*Ts)*B/2 (:373)
    target: jnp.ndarray      # (2,) current target waypoint (:234-236)
    ye: jnp.ndarray
    active: jnp.ndarray
    solver_status: jnp.ndarray


class PFState(NamedTuple):
    mission: MissionState
    solver: SolverState
    past_t_port: jnp.ndarray   # command memory (reference :359-360)
    past_t_stbd: jnp.ndarray


class PFController:
    """Single-layer path-following NMPC over the full hydrodynamic model
    (reference nmpc_pf.cpp; 14 states, N = 100, Tf = 1 s)."""

    def __init__(self, spec=None, solver: Optional[RTISolver] = None,
                 ipm_iters: int = 10, **build_kw):
        self.spec = spec or builders.build("usv_pf", **build_kw)
        assert self.spec.model.name == "usv_pf", self.spec.model.name
        self.solver = solver or RTISolver(self.spec, ipm_iters=ipm_iters)

    # ------------------------------------------------------------------
    @staticmethod
    def _pack_x0(meas: PFMeasurements, past_tp, past_ts, ye, x1, y1, ak):
        """Measurement -> OCP initial state (reference control() :273-291).

        The crab angle chi = psi + beta goes into the (sinpsi, cospsi)
        slots while the psi slot keeps the raw heading — that asymmetry is
        the reference's own packing (:273-283)."""
        u = jnp.where(meas.u == 0.0, 0.001, meas.u)   # callback guard :201-203
        beta = jnp.arctan2(meas.v, u + 0.001)
        chi = meas.psi + beta
        return jnp.stack([
            meas.psi, jnp.sin(chi), jnp.cos(chi), u, meas.v, meas.r,
            ye, x1, y1, ak, meas.nedx, meas.nedy, past_tp, past_ts])

    def _yref(self, ak, u_d, dtype):
        """Per-tick references (reference :299-329): drive (sinpsi, cospsi)
        to the segment heading and u to the cruise speed; all else zero."""
        ny = self.spec.cost.ny
        yvec = (jnp.zeros((ny,), dtype)
                .at[PSIN].set(jnp.sin(ak))
                .at[PCOS].set(jnp.cos(ak))
                .at[PU].set(u_d))
        yref = jnp.broadcast_to(yvec, (self.spec.N, ny))
        return yref, yvec[:self.spec.model.nx]

    # ------------------------------------------------------------------
    def init_state(self, meas: PFMeasurements, waypoints, n_wp,
                   dtype=jnp.float32) -> PFState:
        mission = mission_init(waypoints, n_wp, meas.psi, dtype)
        zero = jnp.asarray(0.0, dtype)
        x0 = self._pack_x0(
            PFMeasurements(*[jnp.asarray(m, dtype) for m in meas]),
            zero, zero, zero, zero, zero, zero)
        return PFState(mission=mission,
                       solver=self.solver.init_state(x0, dtype=dtype),
                       past_t_port=zero, past_t_stbd=zero)

    # ------------------------------------------------------------------
    def tick(self, state: PFState, meas: PFMeasurements, waypoints, n_wp):
        """One control tick (reference main loop :391-407; the node runs at
        `loop_rate(N)` = 100 Hz — the accidental horizon/rate tie noted in
        SURVEY.md section 5)."""
        dtype = state.solver.xbar.dtype
        mission, frame = waypoint_manager(
            state.mission, waypoints, n_wp, meas.nedx, meas.nedy)
        active = mission.active

        x0 = self._pack_x0(meas, state.past_t_port, state.past_t_stbd,
                           frame.ye, frame.x1, frame.y1, frame.ak)
        yref, yref_e = self._yref(frame.ak, frame.u_d, dtype)
        params = jnp.zeros((self.spec.model.np_,), dtype)
        solver_state, out = self.solver.step_fn(state.solver, x0, params,
                                                yref=yref, yref_e=yref_e)

        # thrust from the STAGE-1 state (inputs are thrust rates, :346-350)
        # with the hard zero override when u_des == 0 (:352-355)
        stop = frame.u_d == 0.0
        t_port = jnp.where(stop, 0.0, out.x1[PTPORT])
        t_stbd = jnp.where(stop, 0.0, out.x1[PTSTBD])
        # command memory <- raw stage-1 values, held while inactive (the
        # reference never calls control() once the mission ends, :259-267)
        past_tp = jnp.where(active, out.x1[PTPORT], state.past_t_port)
        past_ts = jnp.where(active, out.x1[PTSTBD], state.past_t_stbd)

        cmds = PFCommands(
            t_port=t_port, t_stbd=t_stbd, u_d=frame.u_d,
            e_u=frame.u_d - meas.u, e_ye=-frame.ye,
            tx=t_port + THRUST_C * t_stbd,
            tz=(t_port - THRUST_C * t_stbd) * BEAM / 2.0,
            target=frame.target, ye=frame.ye, active=active,
            solver_status=out.status)
        return PFState(mission=mission, solver=solver_state,
                       past_t_port=past_tp, past_t_stbd=past_ts), cmds


# ----------------------------------------------------------------------
class ThrustMeasurements(NamedTuple):
    """Local velocity feedback (reference acados_mpc.cpp :148-156)."""
    u: jnp.ndarray
    v: jnp.ndarray
    r: jnp.ndarray


class ThrustMPCCommands(NamedTuple):
    t_port: jnp.ndarray
    t_stbd: jnp.ndarray
    solver_status: jnp.ndarray


class ThrustMPCState(NamedTuple):
    solver: SolverState
    past_t_port: jnp.ndarray   # carried thrust memory (reference :209-210)
    past_t_stbd: jnp.ndarray


class ThrustMPCController:
    """Velocity/thrust NMPC (reference acados_mpc.cpp): tracks
    u_des = 1.0 m/s over the 5-state model at 20 Hz (:127, :221)."""

    U_DES = 1.0   # reference :127

    def __init__(self, spec=None, solver: Optional[RTISolver] = None,
                 ipm_iters: int = 10, **build_kw):
        self.spec = spec or builders.build("usv_acados", **build_kw)
        assert self.spec.model.name == "usv_acados", self.spec.model.name
        self.solver = solver or RTISolver(self.spec, ipm_iters=ipm_iters)

    @staticmethod
    def _pack_x0(meas: ThrustMeasurements, past_tp, past_ts):
        """reference control() :161-165 with the u == 0 guard :150-153."""
        u = jnp.where(meas.u == 0.0, 0.001, meas.u)
        return jnp.stack([u, meas.v, meas.r, past_tp, past_ts])

    def init_state(self, meas: ThrustMeasurements,
                   dtype=jnp.float32) -> ThrustMPCState:
        zero = jnp.asarray(0.0, dtype)
        x0 = self._pack_x0(
            ThrustMeasurements(*[jnp.asarray(m, dtype) for m in meas]),
            zero, zero)
        return ThrustMPCState(solver=self.solver.init_state(x0, dtype=dtype),
                              past_t_port=zero, past_t_stbd=zero)

    def tick(self, state: ThrustMPCState, meas: ThrustMeasurements,
             u_des: float = U_DES):
        """One 20 Hz tick: yref = (u_des, 0, ..., 0) on every stage
        (reference :171-189), thrust from the stage-1 state (:200-204),
        memory <- stage-1 (:209-210)."""
        dtype = state.solver.xbar.dtype
        x0 = self._pack_x0(meas, state.past_t_port, state.past_t_stbd)
        ny = self.spec.cost.ny
        yvec = jnp.zeros((ny,), dtype).at[AU].set(jnp.asarray(u_des, dtype))
        yref = jnp.broadcast_to(yvec, (self.spec.N, ny))
        params = jnp.zeros((self.spec.model.np_,), dtype)
        solver_state, out = self.solver.step_fn(
            state.solver, x0, params, yref=yref,
            yref_e=yvec[:self.spec.model.nx])

        cmds = ThrustMPCCommands(t_port=out.x1[ATPORT], t_stbd=out.x1[ATSTBD],
                              solver_status=out.status)
        return ThrustMPCState(solver=solver_state,
                              past_t_port=out.x1[ATPORT],
                              past_t_stbd=out.x1[ATSTBD]), cmds
