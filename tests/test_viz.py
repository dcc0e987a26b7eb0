"""Live safety-marker stream (utils/viz.py) — the reference's rviz
obstacle/safety-band visualization role (src/nmpc_guidance_ca1.cpp:
378-414).  Pins: frames carry exactly the solver's perceived circles,
the JSONL stream round-trips, renderers run headless, and the CLI
mission command emits the stream."""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_collisionavoidance_tpu.guidance import (
    GuidanceController, Measurements)
from mpc_collisionavoidance_tpu.guidance import obstacles as obs
from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.sim import mission, scenarios
from mpc_collisionavoidance_tpu.utils import viz

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def mission_log():
    ctrl = GuidanceController(builders.usv_guidance_ca1(Tf=2.0, N=20),
                              ipm_iters=8)
    field, valid = scenarios.challenge0_field()
    wps = np.array([[4.0, -5.0], [4.0, 25.0]])
    log = jax.jit(lambda m: mission.run_mission(
        ctrl, m, wps, 2, field, valid, n_steps=80))(
        Measurements(u=0.7, v=0.0, nedx=4.0, nedy=-5.0,
                     psi=np.float32(np.pi / 2)))
    return log, field, valid


def test_frames_match_solver_perception(mission_log):
    """Every frame's circles == the perception pipeline's non-sentinel
    slots at that pose (inflated radius = obstacle + boat radius, the
    value the solver constrains on)."""
    log, field, valid = mission_log
    frames = viz.frames_from_mission(log, field, valid, stride=7)
    assert len(frames) == len(range(0, 80, 7))
    checked = 0
    for fr in frames:
        slots = obs.perceive(jnp.asarray(field, jnp.float32),
                             jnp.asarray(valid), fr.x, fr.y, fr.psi)
        want = viz._slots_to_xyr(np.asarray(slots.p_obs),
                                 np.asarray(slots.r_obs))
        np.testing.assert_allclose(fr.obstacles, want, atol=1e-4)
        np.testing.assert_allclose(fr.safety_radii,
                                   fr.obstacles[:, 2] + viz.SAFETY_BAND)
        checked += len(fr.obstacles)
    assert checked > 0, "no obstacle ever visible — scenario broken"


def test_jsonl_stream_roundtrip(mission_log, tmp_path):
    log, field, valid = mission_log
    frames = viz.frames_from_mission(log, field, valid, stride=10)
    path = tmp_path / "markers.jsonl"
    n = viz.write_jsonl(frames, str(path))
    assert n == len(frames)
    # one self-contained JSON object per line -> consumable live
    lines = path.read_text().strip().split("\n")
    assert len(lines) == n
    json.loads(lines[0])
    back = viz.read_jsonl(str(path))
    for a, b in zip(frames, back):
        assert a.t == b.t and a.collision == b.collision
        np.testing.assert_allclose(a.obstacles, b.obstacles, atol=1e-4)
        assert abs(a.x - b.x) < 1e-9 and abs(a.psi - b.psi) < 1e-9


def test_render_animation_headless(mission_log, tmp_path):
    log, field, valid = mission_log
    frames = viz.frames_from_mission(log, field, valid, stride=20)
    out = viz.render_animation(frames, str(tmp_path / "mission.gif"),
                               fps=5, dpi=50)
    data = Path(out).read_bytes()
    assert data[:6] in (b"GIF87a", b"GIF89a") and len(data) > 1000


def test_live_viewer_headless_sink(mission_log, tmp_path):
    log, field, valid = mission_log
    frames = viz.frames_from_mission(log, field, valid, stride=20)
    path = tmp_path / "live.jsonl"
    v = viz.LiveViewer(headless_sink=str(path))
    for fr in frames:
        v.update(fr)
    v.close()
    assert len(viz.read_jsonl(str(path))) == len(frames)


@pytest.mark.slow
def test_cli_mission_markers(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mpc_collisionavoidance_tpu", "mission",
         "--steps", "120", "--stride", "4", "--platform", "cpu",
         "--markers", str(tmp_path / "m.jsonl")],
        capture_output=True, text=True, timeout=600, cwd=str(REPO))
    assert out.returncode == 0, (out.stdout, out.stderr)
    head = json.loads(out.stdout.strip().splitlines()[0])
    assert head["frames"] == 30
    assert (tmp_path / "m.jsonl").exists()
    frames = viz.read_jsonl(str(tmp_path / "m.jsonl"))
    assert len(frames) == 30
