"""Density-matrix plotting: heatmaps and animations.

Counterpart of ``/root/reference/pytdscf/util/{plot_heatmap,anim_density_matrix}.py``.
"""

from __future__ import annotations

import numpy as np


def plot_heatmap(
    rho_t: np.ndarray,
    times=None,
    filename: str | None = None,
    gui: bool = False,
    component: str = "abs",
):
    """Heatmap of the diagonal of ρ(t) over time (time on x, basis on y)."""
    import matplotlib

    if not gui:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rho_t = np.asarray(rho_t)
    if rho_t.ndim == 3:  # (t, d, d) → diagonals
        data = np.einsum("tii->ti", rho_t)
    else:
        data = rho_t
    comp = {
        "abs": np.abs, "real": np.real, "imag": np.imag,
    }[component]
    fig, ax = plt.subplots()
    extent = None
    if times is not None:
        extent = [times[0], times[-1], 0, data.shape[1]]
    im = ax.imshow(
        comp(data).T, aspect="auto", origin="lower",
        interpolation="nearest", extent=extent,
    )
    fig.colorbar(im, ax=ax, label=f"{component} ρ_ii")
    ax.set_xlabel("time")
    ax.set_ylabel("basis index")
    if filename:
        fig.savefig(filename, dpi=150)
    if gui:
        plt.show()
    plt.close(fig)
    return fig


def anim_density_matrix(
    rho_t: np.ndarray,
    filename: str = "density.gif",
    interval_ms: int = 100,
    component: str = "abs",
):
    """Hinton-style animation of a (t, d, d) density-matrix trajectory."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    rho_t = np.asarray(rho_t)
    comp = {"abs": np.abs, "real": np.real, "imag": np.imag}[component]
    vmax = comp(rho_t).max()
    fig, ax = plt.subplots()
    im = ax.imshow(comp(rho_t[0]), vmin=0 if component == "abs" else -vmax,
                   vmax=vmax, interpolation="nearest")
    fig.colorbar(im, ax=ax)

    def update(frame):
        im.set_data(comp(rho_t[frame]))
        ax.set_title(f"step {frame}")
        return (im,)

    anim = animation.FuncAnimation(
        fig, update, frames=rho_t.shape[0], interval=interval_ms, blit=True
    )
    anim.save(filename, writer="pillow")
    plt.close(fig)
    return filename
