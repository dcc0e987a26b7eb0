"""Scenario dashboards, the analog of the reference's per-variant plotFcn.py.

The reference renders a 5-row time-series dashboard (input, body
velocities, heading error, command memory, cross-track error) plus an XY
trajectory with obstacle circles after each offline run (reference
scripts/usv_guidance_ca1/plotFcn.py:100-159).  These helpers produce the
same views from our sim logs, plus a cascade dashboard covering the
two-solver pipeline.  Matplotlib is imported lazily with the Agg backend
so sims on headless TPU hosts can always save figures.
"""

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_flagship(simX, simU, dt, obstacles=None, radii=None,
                  save_path=None):
    """5-row dashboard + XY track for a usv_guidance_ca1 run.

    simX: (T, 8) state log in ca1 layout, simU: (T, 1) psi_e_d rate input,
    obstacles: (n, 2) NED centers, radii: (n,).  Returns the two figures.
    """
    plt = _plt()
    simX = np.asarray(simX)
    simU = np.asarray(simU)
    t = np.arange(len(simX)) * dt

    fig1, axes = plt.subplots(5, 1, figsize=(8, 11), sharex=True)
    axes[0].step(t, simU[:, 0], color="r")
    axes[0].set_ylabel("rad/s")
    axes[0].legend(["psieddot"])
    axes[0].set_title("closed-loop simulation")
    axes[1].plot(t, simX[:, 0:2])
    axes[1].set_ylabel("m/s")
    axes[1].legend(["u", "v"])
    axes[2].step(t, simX[:, 3], color="r")
    axes[2].set_ylabel("rad")
    axes[2].legend(["chie"])
    axes[3].step(t, simX[:, 4], color="r")
    axes[3].set_ylabel("rad")
    axes[3].legend(["psied"])
    axes[4].step(t, simX[:, 2], color="r")
    axes[4].set_ylabel("m")
    axes[4].set_xlabel("t [s]")
    axes[4].legend(["ye"])
    for ax in axes:
        ax.grid(True)

    fig2 = _xy_figure(plt, simX[:, 6], simX[:, 5], obstacles, radii)
    if save_path:
        fig1.savefig(f"{save_path}_timeseries.png", dpi=110,
                     bbox_inches="tight")
        fig2.savefig(f"{save_path}_xy.png", dpi=110, bbox_inches="tight")
    return fig1, fig2


def plot_cascade(log, dt, obstacles=None, radii=None, save_path=None):
    """Dashboard for a `sim.cascade.run_cascade` log: commands vs response
    at both cascade levels + XY track."""
    plt = _plt()
    t = np.arange(len(np.asarray(log.psi))) * dt

    fig1, axes = plt.subplots(4, 1, figsize=(8, 9), sharex=True)
    axes[0].plot(t, np.asarray(log.psi), label="psi")
    axes[0].plot(t, np.asarray(log.psi_d), "--", label="psi_d")
    axes[0].set_ylabel("rad")
    axes[0].set_title("cascaded guidance + low-level NMPC")
    axes[1].plot(t, np.asarray(log.u), label="u")
    axes[1].plot(t, np.asarray(log.u_d), "--", label="u_d")
    axes[1].set_ylabel("m/s")
    axes[2].plot(t, np.asarray(log.thrust)[:, 0], label="Tport")
    axes[2].plot(t, np.asarray(log.thrust)[:, 1], label="Tstbd")
    axes[2].set_ylabel("N")
    axes[3].plot(t, np.asarray(log.ye), label="ye")
    axes[3].set_ylabel("m")
    axes[3].set_xlabel("t [s]")
    for ax in axes:
        ax.grid(True)
        ax.legend(loc="upper right")

    pos = np.asarray(log.pos)
    fig2 = _xy_figure(plt, pos[:, 1], pos[:, 0], obstacles, radii)
    if save_path:
        fig1.savefig(f"{save_path}_timeseries.png", dpi=110,
                     bbox_inches="tight")
        fig2.savefig(f"{save_path}_xy.png", dpi=110, bbox_inches="tight")
    return fig1, fig2


def _xy_figure(plt, east, north, obstacles, radii):
    """XY track in the reference's plot convention: y (east) on the
    horizontal axis, x (north) on the vertical (plotFcn.py:135-143)."""
    fig = plt.figure(figsize=(6, 8))
    ax = fig.gca()
    ax.plot(east, north, label="trajectory")
    if obstacles is not None:
        obstacles = np.asarray(obstacles)
        radii = np.asarray(radii)
        for (ox, oy), r in zip(obstacles, radii):
            ax.add_patch(plt.Circle((oy, ox), r, alpha=0.5))
    ax.set_xlabel("east y [m]")
    ax.set_ylabel("north x [m]")
    ax.set_aspect("equal", adjustable="datalim")
    ax.grid(True)
    ax.legend()
    return fig
