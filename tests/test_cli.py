"""Experiment CLI: the reference's main.py run experience as one command."""

import json
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
