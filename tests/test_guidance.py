"""Guidance layer: waypoint manager, obstacle intake, full mission loop.

Oracle strategy mirrors SURVEY.md section 4: numpy re-implementations of the
reference node's arithmetic (sort-based top-8, body<->NED transforms,
segment projection) check the fixed-shape JAX versions, and the mission
closed loop is a self-checking experiment (reach every waypoint, never
collide) like the reference's offline sims.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.guidance import (
    GuidanceController, Measurements, mission_init, waypoint_manager)
from mpc_collisionavoidance_tpu.guidance import obstacles as obs
from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim import mission, scenarios


# ---------------------------------------------------------------------------
# waypoint manager

def _run_manager(wps, n_wp, track):
    st = mission_init(np.asarray(wps), n_wp, psi=0.0, dtype=jnp.float64)
    step = jax.jit(lambda s, xy: waypoint_manager(
        s, jnp.asarray(wps, jnp.float64), n_wp, xy[0], xy[1]))
    frames, states = [], []
    for xy in track:
        st, fr = step(st, jnp.asarray(xy, jnp.float64))
        frames.append(fr)
        states.append(st)
    return states, frames


def test_waypoint_advance_and_reprojection():
    # L-shaped course: east then north
    wps = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    # drive straight along segment 1, arrive near (10, 0), then move on
    track = [(0, 0), (5, 0), (9.2, 0.0), (9.6, 0.5), (10.2, 2.0)]
    states, frames = _run_manager(wps, 3, track)

    assert int(states[0].k) == 1 and int(states[1].k) == 1
    assert float(frames[1].ak) == 0.0                     # east segment
    # within 1 m of (10, 0) -> advance to segment 2 (north, ak = pi/2)
    assert int(states[2].k) == 2
    np.testing.assert_allclose(float(frames[2].ak), np.pi / 2)
    assert bool(frames[2].advanced)
    # past_psied re-projection: was psi - ak1 = 0, now shifted by ak1 - ak2
    np.testing.assert_allclose(float(states[2].past_psied), -np.pi / 2)
    # cross-track error now measured from the NEW segment: ye = -(x-10)
    np.testing.assert_allclose(float(frames[3].ye), -(9.6 - 10.0) * 1.0,
                               atol=1e-12)
    assert bool(states[4].active)  # still > 1 m from (10, 10)


def test_mission_completes_at_final_waypoint():
    wps = np.array([[0.0, 0.0], [5.0, 0.0]])
    track = [(0, 0), (3, 0), (4.5, 0.0), (4.7, 0.0)]
    states, frames = _run_manager(wps, 2, track)
    assert bool(states[1].active)
    assert float(frames[1].u_d) == 0.7                    # cruising
    assert not bool(states[2].active)                     # captured final wp
    assert float(frames[3].u_d) == 0.0                    # stop command


def test_unused_waypoint_capacity_is_masked():
    """Padding rows beyond n_wp must not affect the mission."""
    wps_tight = np.array([[0.0, 0.0], [5.0, 0.0]])
    wps_padded = np.vstack([wps_tight, [[77.0, -3.0], [1.0, 99.0]]])
    track = [(1, 0.2), (4.2, -0.1)]
    _, f_tight = _run_manager(wps_tight, 2, track)
    _, f_padded = _run_manager(wps_padded, 2, track)
    for a, b in zip(f_tight, f_padded):
        np.testing.assert_allclose(float(a.ye), float(b.ye))
        np.testing.assert_allclose(float(a.ak), float(b.ak))


# ---------------------------------------------------------------------------
# obstacle intake

def _numpy_intake_oracle(field, valid, nedx, nedy, psi):
    """Reference obstaclesCallback arithmetic with explicit sort
    (reference nmpc_guidance_ca1.cpp:252-346)."""
    R = np.array([[np.cos(psi), -np.sin(psi)], [np.sin(psi), np.cos(psi)]])
    vis = []
    for (X, Y, rad), ok in zip(field, valid):
        if not ok or np.hypot(X - nedx, Y - nedy) >= 100.0:
            continue
        body = R.T @ np.array([X - nedx, Y - nedy])
        vis.append((body[0], body[1], rad))
    p = np.full(16, 1000.0)
    r = np.zeros(8)
    order = sorted(range(len(vis)), key=lambda i: np.hypot(
        vis[i][0], vis[i][1]) - (vis[i][2] + 0.5))
    for slot, i in enumerate(order[:8]):
        bx, by, rad = vis[i]
        ned = R @ np.array([bx, by]) + np.array([nedx, nedy])
        p[2 * slot: 2 * slot + 2] = ned
        r[slot] = rad + 0.5
    return p, r


def test_intake_matches_sort_oracle():
    rng = np.random.default_rng(3)
    field = np.zeros((32, 3))
    valid = np.zeros(32, dtype=bool)
    n = 13                                   # > 8 forces truncation
    field[:n, :2] = rng.uniform(-30, 30, (n, 2))
    field[:n, 2] = rng.uniform(0.1, 2.0, n)
    field[5, :2] = (200.0, 200.0)            # beyond visibility radius
    valid[:n] = True
    nedx, nedy, psi = 1.5, -2.0, 0.7

    slots = jax.jit(obs.perceive)(jnp.asarray(field), jnp.asarray(valid),
                                  nedx, nedy, psi)
    p_ref, r_ref = _numpy_intake_oracle(field, valid, nedx, nedy, psi)
    np.testing.assert_allclose(np.asarray(slots.p_obs), p_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(slots.r_obs), r_ref, atol=1e-5)
    assert int(slots.n_visible) == n - 1


def test_intake_sentinel_fill_and_collision_flag():
    field, valid = scenarios.challenge0_field()          # 4 obstacles
    slots = obs.perceive(jnp.asarray(field), jnp.asarray(valid),
                         0.0, 0.0, 0.0)
    p = np.asarray(slots.p_obs)
    r = np.asarray(slots.r_obs)
    assert np.all(p[8:] == 1000.0) and np.all(r[4:] == 0.0)
    assert not bool(jnp.any(slots.collision))
    # stand inside the first buoy's inflated radius -> collision flag
    slots2 = obs.perceive(jnp.asarray(field), jnp.asarray(valid),
                          4.0, 4.2, 0.0)
    assert bool(jnp.any(slots2.collision))


# ---------------------------------------------------------------------------
# full mission closed loop

def _flagship_controller(N=60, Tf=3.0):
    spec = builders.usv_guidance_ca1(Tf=Tf, N=N)
    return GuidanceController(spec, ipm_iters=10)


def test_mission_closed_loop_challenge0():
    """Straight 30 m mission through the challenge-0 buoy line: must reach
    the final waypoint without entering any inflated buoy radius."""
    ctrl = _flagship_controller()
    field, valid = scenarios.challenge0_field()
    wps = np.array([[4.0, -5.0], [4.0, 25.0]])
    meas0 = Measurements(u=0.7, v=0.0, nedx=0.0, nedy=0.0, psi=0.0)

    log = jax.jit(lambda: mission.run_mission(
        ctrl, meas0, wps, 2, field, valid, n_steps=1200,
        dtype=jnp.float64))()
    pos = np.asarray(log.pos)
    assert np.all(np.isfinite(pos))
    # mission completes (controller goes inactive near (4, 25))
    active = np.asarray(log.cmds.active)
    assert not bool(active[-1])
    end = pos[np.argmax(~active)]
    assert np.hypot(end[0] - 4.0, end[1] - 25.0) < 1.2
    # clearance: never inside buoy radius + boat radius (1.5 m), minus the
    # 0.2 m soft-constraint band the OCP may legitimately use
    clear = np.asarray(mission.min_obstacle_clearance(log, field, valid))
    assert np.all(clear[:4] > 1.3), clear[:4]
    assert not np.any(np.asarray(log.cmds.collision))


def test_mission_vmaps_over_fleet():
    """A fleet of missions with different starting poses is one vmap."""
    ctrl = _flagship_controller(N=20, Tf=1.0)
    field, valid = scenarios.challenge0_field()
    wps = np.array([[4.0, -5.0], [4.0, 25.0]])
    B = 3
    meas0 = Measurements(
        u=jnp.full((B,), 0.7), v=jnp.zeros(B),
        nedx=jnp.linspace(-1, 1, B), nedy=jnp.zeros(B),
        psi=jnp.zeros(B))

    run = jax.vmap(lambda m: mission.run_mission(
        ctrl, m, wps, 2, field, valid, n_steps=40))
    log = jax.jit(run)(meas0)
    assert log.pos.shape == (B, 40, 2)
    assert np.all(np.isfinite(np.asarray(log.pos)))
    # different starts -> different tracks
    assert not np.allclose(np.asarray(log.pos)[0], np.asarray(log.pos)[1])
