"""Experiment CLI: the reference's main.py run experience as one command."""

import json
import pytest
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(*args, timeout=300):
    return subprocess.run([sys.executable, "-m", "mpc_collisionavoidance_tpu",
                           *args], capture_output=True, text=True,
                          cwd=REPO, timeout=timeout)


def test_cli_models_lists_zoo():
    out = _run("models")
    assert out.returncode == 0
    assert "usv_guidance_ca1" in out.stdout
    assert len(out.stdout.strip().splitlines()) == 13


def test_cli_run_json_metrics(tmp_path):
    cfg = {"model": "usv_guidance4", "N": 10, "Tf": 0.1,
           "solver": {"engine": "instance", "ipm_iters": 6}}
    cfg_path = tmp_path / "exp.json"
    cfg_path.write_text(json.dumps(cfg))
    out = _run("run", "--config", str(cfg_path), "--steps", "30",
               "--platform", "cpu")
    assert out.returncode == 0, out.stderr[-500:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["model"] == "usv_guidance4"
    assert metrics["finite"] is True
    assert metrics["solves_per_s_closed_loop"] > 0


def test_cli_run_rejects_unknown_model():
    out = _run("run", "--model", "usv_bogus", "--steps", "5")
    assert out.returncode != 0
    assert "unknown model" in (out.stdout + out.stderr)


def test_cli_run_uses_variant_reference_defaults(tmp_path):
    """`run --model usv_acados` with no -N/--tf picks the variant's own
    reference horizon (N=20, Tf=1 — SURVEY.md 2.4), not the flagship's."""
    out = _run("run", "--model", "usv_acados", "--steps", "40",
               "--platform", "cpu")
    assert out.returncode == 0, out.stderr[-500:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["N"] == 20 and metrics["Tf"] == 1.0
    assert metrics["finite"] is True


@pytest.mark.slow
def test_cli_race(tmp_path):
    """`race` runs the curved-track race car and saves the track plot."""
    out = _run("race", "--steps", "120", "--platform", "cpu",
               "--plots", str(tmp_path / "race"))
    assert out.returncode == 0, out.stderr[-500:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["finite"] is True
    assert metrics["s_final"] > 0.3          # made progress on the track
    assert (tmp_path / "race_track.png").exists()
