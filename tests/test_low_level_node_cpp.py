"""Native (C++) low-level thrust node vs the JAX implementation.

The native node (rt_client/nmpc_low_level_node.{h,cpp}) re-builds the
reference nmpc_low_level node's around-the-solver logic (reference
catkin_ws/src/nmpc_ca/src/nmpc_low_level.cpp:176-285) in C++.  Three tiers:

1. ctypes parity of the pure sub-steps (x0 packing incl. the u==0 guard,
   yref packing, stage-1 extraction with the zero-speed override and the
   carried-thrust memory) against the JAX controller's conventions.
2. live-server tick parity: the C++ node driven through a live
   usv_low_level serving engine must emit the same thrust trajectory as
   the JAX LowLevelController running the same solver configuration on
   the same measurement script.
3. end-to-end: the native two-node CASCADE (guidance node + low-level
   node + honest C++ hull plant, rt_client/cascade_demo.cpp) against two
   live servers — the reference's two-process ROS graph (SURVEY.md
   section 3.5) as a native deployment.
"""

import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from mpc_collisionavoidance_tpu.guidance.low_level import (  # noqa: E402
    BEAM, THRUST_C, LowLevelController, LowLevelMeasurements)
from mpc_collisionavoidance_tpu.ocp import builders  # noqa: E402

from tests.test_guidance_node_cpp import _ServerThread, build_dir  # noqa: F401,E402

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable")


class _LLMeas(ctypes.Structure):
    _fields_ = [("psi", ctypes.c_float), ("u", ctypes.c_float),
                ("v", ctypes.c_float), ("r", ctypes.c_float)]


class _LLCmds(ctypes.Structure):
    _fields_ = [("t_port", ctypes.c_float), ("t_stbd", ctypes.c_float),
                ("e_u", ctypes.c_float), ("e_psi", ctypes.c_float),
                ("tx", ctypes.c_float), ("tz", ctypes.c_float),
                ("solver_status", ctypes.c_uint32)]


class _LLNode(ctypes.Structure):
    _fields_ = [("past_t_port", ctypes.c_float),
                ("past_t_stbd", ctypes.c_float),
                ("have_cmd", ctypes.c_int), ("last", _LLCmds)]


@pytest.fixture(scope="module")
def ll_lib(build_dir):  # noqa: F811
    L = ctypes.CDLL(str(build_dir / "libnmpc_low_level_node.so"))
    L.ll_init.argtypes = [ctypes.POINTER(_LLNode)]
    L.ll_pack_x0.argtypes = [ctypes.POINTER(_LLNode),
                             ctypes.POINTER(_LLMeas), ctypes.c_float * 8]
    L.ll_pack_yref.argtypes = [ctypes.c_float, ctypes.c_float,
                               ctypes.c_float * 10]
    L.ll_extract.argtypes = [ctypes.POINTER(_LLNode), ctypes.c_float * 8,
                             ctypes.c_uint32, ctypes.POINTER(_LLMeas),
                             ctypes.c_float, ctypes.c_float,
                             ctypes.POINTER(_LLCmds)]
    L.ll_tick.restype = ctypes.c_int
    L.ll_tick.argtypes = [ctypes.POINTER(_LLNode), ctypes.c_void_p,
                          ctypes.c_uint32, ctypes.POINTER(_LLMeas),
                          ctypes.c_float, ctypes.c_float,
                          ctypes.POINTER(_LLCmds)]
    L.nmpc_rt_connect.restype = ctypes.c_void_p
    L.nmpc_rt_connect.argtypes = [ctypes.c_char_p, ctypes.c_int]
    L.nmpc_rt_close.argtypes = [ctypes.c_void_p]
    return L


def test_native_substep_parity(ll_lib):
    """Packing and extraction match the JAX controller's conventions
    (reference nmpc_low_level.cpp:176-285) over randomized ticks."""
    rng = np.random.default_rng(11)
    node = _LLNode()
    ll_lib.ll_init(ctypes.byref(node))
    past = np.zeros(2, np.float32)

    for t in range(200):
        u = 0.0 if t % 13 == 0 else float(rng.uniform(-0.5, 1.5))
        meas = _LLMeas(float(rng.uniform(-3, 3)), u,
                       float(rng.uniform(-0.4, 0.4)),
                       float(rng.uniform(-0.8, 0.8)))
        psi_d = float(rng.uniform(-3, 3))
        u_d = 0.0 if t % 7 == 0 else float(rng.uniform(0.0, 1.2))

        x0 = (ctypes.c_float * 8)()
        ll_lib.ll_pack_x0(ctypes.byref(node), ctypes.byref(meas), x0)
        jm = LowLevelMeasurements(
            psi=jnp.float32(meas.psi),
            u=jnp.float32(0.001 if u == 0.0 else u),  # reference :180-182
            v=jnp.float32(meas.v), r=jnp.float32(meas.r))
        x0_py = np.asarray(LowLevelController._pack_x0(
            jm, jnp.float32(past[0]), jnp.float32(past[1])))
        np.testing.assert_allclose(np.array(x0), x0_py, atol=2e-6,
                                   err_msg=f"x0 mismatch at tick {t}")

        yref = (ctypes.c_float * 10)()
        ll_lib.ll_pack_yref(psi_d, u_d, yref)
        yref_py = np.concatenate([
            [psi_d, np.sin(psi_d), np.cos(psi_d), u_d], np.zeros(6)])
        np.testing.assert_allclose(np.array(yref), yref_py, atol=2e-6)

        # synthetic stage-1 reply -> extraction
        x1 = rng.uniform(-20, 30, size=8).astype(np.float32)
        cmd = _LLCmds()
        ll_lib.ll_extract(ctypes.byref(node), (ctypes.c_float * 8)(*x1),
                          0, ctypes.byref(meas), psi_d, u_d,
                          ctypes.byref(cmd))
        tp, ts = (0.0, 0.0) if u_d == 0.0 else (x1[6], x1[7])
        assert abs(cmd.t_port - tp) < 1e-6 and abs(cmd.t_stbd - ts) < 1e-6
        # memory carries raw x1 thrusts even under the override
        # (reference :268-269)
        assert abs(node.past_t_port - x1[6]) < 1e-6
        assert abs(node.past_t_stbd - x1[7]) < 1e-6
        assert abs(cmd.e_u - (u_d - meas.u)) < 1e-6
        assert abs(cmd.e_psi - (psi_d - meas.psi)) < 1e-6
        assert abs(cmd.tx - (tp + THRUST_C * ts)) < 1e-5
        assert abs(cmd.tz - (tp - THRUST_C * ts) * BEAM / 2) < 1e-5
        past = x1[6:8].copy()


def test_native_tick_matches_jax_controller(ll_lib, tmp_path):
    """The C++ node through a live usv_low_level server must produce the
    same thrust trajectory as the JAX LowLevelController running the
    identical solver configuration on the same measurement script."""
    N, Tf, iters = 30, 1.0, 8
    spec = builders.usv_low_level(Tf=Tf, N=N)
    ctrl = LowLevelController(spec, ipm_iters=iters)

    rng = np.random.default_rng(5)
    T = 40
    # tick 20 measures u == 0: the guard (reference :180-182) rewrites
    # the measurement to 0.001, flowing into BOTH x0 and e_u.  The JAX
    # convention is caller-applied, the C++ node applies it in ll_tick.
    raw_u = [0.0 if t == 20 else 0.4 + 0.2 * np.sin(t / 5)
             for t in range(T)]
    script = [LowLevelMeasurements(
        psi=jnp.float32(0.3 * np.sin(t / 7)),
        u=jnp.float32(0.001 if raw_u[t] == 0.0 else raw_u[t]),
        v=jnp.float32(0.05 * np.cos(t / 9)),
        r=jnp.float32(0.1 * np.sin(t / 4))) for t in range(T)]
    psi_ds = 0.4 * np.cos(np.arange(T) / 10).astype(np.float32)
    u_ds = (0.8 + 0.1 * np.sin(np.arange(T) / 6)).astype(np.float32)

    st = ctrl.init_state(script[0], dtype=jnp.float32)
    tick = jax.jit(ctrl.tick)
    jax_thrust = []
    for t in range(T):
        st, cmds = tick(st, script[t], psi_ds[t], u_ds[t])
        jax_thrust.append([float(cmds.t_port), float(cmds.t_stbd)])
    jax_thrust = np.asarray(jax_thrust)

    sock = tmp_path / "ll.sock"
    native_thrust = []
    with _ServerThread(sock, N=N, Tf=Tf, ipm_iters=iters,
                       model="usv_low_level"):
        c = ll_lib.nmpc_rt_connect(str(sock).encode(), 30000)
        assert c
        node = _LLNode()
        ll_lib.ll_init(ctypes.byref(node))
        for t in range(T):
            meas = _LLMeas(float(script[t].psi), float(raw_u[t]),
                           float(script[t].v), float(script[t].r))
            cmd = _LLCmds()
            rc = ll_lib.ll_tick(ctypes.byref(node), c, t + 1,
                                ctypes.byref(meas), float(psi_ds[t]),
                                float(u_ds[t]), ctypes.byref(cmd))
            assert rc == 0, (t, rc)
            if raw_u[t] == 0.0:
                # e_u sees the guarded measurement (ADVICE r3)
                assert abs(cmd.e_u - (u_ds[t] - 0.001)) < 1e-6
            native_thrust.append([cmd.t_port, cmd.t_stbd])
        ll_lib.nmpc_rt_close(c)
    native_thrust = np.asarray(native_thrust)

    # same solver, same warm-start evolution, same float32 path -> tight
    np.testing.assert_allclose(native_thrust, jax_thrust, atol=1e-3)


@pytest.mark.slow
def test_native_cascade_mission(build_dir, tmp_path):  # noqa: F811
    """The native two-node cascade (guidance 20 Hz + low-level 100 Hz +
    honest C++ hull) drives the challenge-0 buoy line: cruise speed
    reached, all buoys cleared > 1.1 m, thrust bounds respected."""
    gsock, lsock = tmp_path / "g.sock", tmp_path / "ll.sock"
    # iteration counts picked for clean status-0 ticks in float32 (the
    # demo's <=2% bad-status gate): 12 IPM iters reach the f32 gap floor
    # on the warm-started low-level loop, 14 on the guidance loop
    with _ServerThread(gsock, N=40, Tf=3.0, ipm_iters=14):
        with _ServerThread(lsock, N=40, Tf=1.0, ipm_iters=12,
                           model="usv_low_level"):
            out = subprocess.run(
                [str(build_dir / "cascade_demo"), str(gsock), str(lsock),
                 "1400"],
                capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, (out.stdout, out.stderr)
    tail = out.stdout.strip().splitlines()[-1]
    assert "progressed 1" in tail and "thrust_violations 0" in tail, tail
