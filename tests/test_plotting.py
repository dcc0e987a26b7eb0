"""Dashboard rendering smoke tests (headless Agg backend)."""

import numpy as np

from mpc_collisionavoidance_tpu.utils import plotting


def test_flagship_dashboard(tmp_path):
    T = 50
    simX = np.random.default_rng(0).standard_normal((T, 8))
    simU = np.random.default_rng(1).standard_normal((T, 1))
    obstacles = np.array([[4.0, 4.0], [4.0, 7.0]])
    radii = np.array([1.5, 1.5])
    f1, f2 = plotting.plot_flagship(simX, simU, 0.05, obstacles, radii,
                                    save_path=str(tmp_path / "flag"))
    assert (tmp_path / "flag_timeseries.png").exists()
    assert (tmp_path / "flag_xy.png").exists()


def test_cascade_dashboard(tmp_path):
    from mpc_collisionavoidance_tpu.sim.cascade import CascadeLog
    T = 40
    z = np.zeros(T)
    log = CascadeLog(pos=np.stack([z, z], axis=1), psi=z, u=z, psi_d=z,
                     u_d=z, thrust=np.stack([z, z], axis=1), ye=z,
                     active=z > 0, collision=z > 0)
    plotting.plot_cascade(log, 0.05, save_path=str(tmp_path / "casc"))
    assert (tmp_path / "casc_xy.png").exists()


def test_pf_family_dashboard(tmp_path):
    rng = np.random.default_rng(0)
    simX = rng.standard_normal((50, 14))
    simU = rng.standard_normal((50, 2))
    figs = plotting.plot_pf_family(simX, simU, 0.01,
                                   obstacles=[[3.0, 2.0]], radii=[0.5],
                                   save_path=str(tmp_path / "pf"))
    assert len(figs) == 3
    for suffix in ("timeseries", "xy", "errors"):
        assert (tmp_path / f"pf_{suffix}.png").exists()


def test_race_track_plot(tmp_path):
    from mpc_collisionavoidance_tpu.utils import track as trk

    t = trk.make_synthetic_track(n_samples=128)
    simX = np.zeros((40, 6))
    simX[:, 0] = np.linspace(0, t.length, 40)
    simX[:, 1] = 0.05 * np.sin(np.linspace(0, 6, 40))
    plotting.plot_race_track(t, simX, save_path=str(tmp_path / "race"))
    assert (tmp_path / "race_track.png").exists()
