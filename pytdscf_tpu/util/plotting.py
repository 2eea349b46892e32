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


class ComplexMatrixAnimation:
    """Phase-coloured Hinton animation of a (t, d, d) complex trajectory.

    Feature parity with the reference's annotated animator
    (``/root/reference/pytdscf/util/anim_density_matrix.py``): square
    size encodes |ρ_ij| (relative to the global maximum), colour encodes
    arg(ρ_ij) on a cyclic map with a phase colourbar, frames carry a
    timestamped title, axes carry basis-state labels, and each square
    can be annotated with its complex value.  The implementation is a
    single reused ``PolyCollection`` per frame (vertices + colours
    updated in place) rather than per-element Rectangles — O(d²) numpy
    per frame, no artist churn.
    """

    def __init__(
        self,
        rho_t: np.ndarray,
        times: np.ndarray | None = None,
        *,
        title: str = "Density matrix",
        row_names: list[str] | None = None,
        col_names: list[str] | None = None,
        time_unit: str = "fs",
        cmap: str = "hsv",
        add_text: bool = False,
    ) -> None:
        rho_t = np.asarray(rho_t, dtype=complex)
        if rho_t.ndim != 3:
            raise ValueError("rho_t must have shape (time, row, col)")
        self.rho_t = rho_t
        nt, self.nrow, self.ncol = rho_t.shape
        self.times = (
            np.arange(nt, dtype=float) if times is None else np.asarray(times)
        )
        if self.times.shape != (nt,):
            raise ValueError("times must match rho_t's leading dimension")
        for names, dim, what in (
            (row_names, self.nrow, "row_names"),
            (col_names, self.ncol, "col_names"),
        ):
            if names is not None and len(names) != dim:
                raise ValueError(f"{what} must have length {dim}")
        self.title = title
        self.row_names = row_names
        self.col_names = col_names
        self.time_unit = time_unit
        self.cmap = cmap
        self.add_text = add_text
        self.maxabs = max(float(np.abs(rho_t).max()), 1e-300)

    # ------------------------------------------------------------------
    def _frame_quads(self, frame: int):
        """(verts, phases) for one frame: centred squares, area ∝ |ρ|."""
        m = self.rho_t[frame]
        half = 0.5 * np.sqrt(np.abs(m) / self.maxabs).clip(0.0, 1.0)
        jj, ii = np.meshgrid(
            np.arange(self.ncol), np.arange(self.nrow)
        )
        cx, cy = jj.ravel(), ii.ravel()
        h = half.ravel()
        verts = np.stack(
            [
                np.stack([cx - h, cy - h], axis=1),
                np.stack([cx + h, cy - h], axis=1),
                np.stack([cx + h, cy + h], axis=1),
                np.stack([cx - h, cy + h], axis=1),
            ],
            axis=1,
        )
        phases = (np.angle(m).ravel() + 2 * np.pi) % (2 * np.pi)
        return verts, phases

    def _setup(self):
        import matplotlib.pyplot as plt
        from matplotlib import cm as mcm
        from matplotlib.collections import PolyCollection

        fig, ax = plt.subplots(
            figsize=(max(6, 0.6 * self.ncol), max(5, 0.6 * self.nrow))
        )
        ax.set_facecolor("#d9d9d9")
        ax.set_xlim(-0.6, self.ncol - 0.4)
        ax.set_ylim(self.nrow - 0.4, -0.6)  # matrix orientation
        ax.set_aspect("equal")
        ax.set_xticks(range(self.ncol))
        ax.set_yticks(range(self.nrow))
        ax.tick_params(
            top=True, labeltop=True, bottom=False, labelbottom=False
        )
        if self.col_names is not None:
            ax.set_xticklabels(self.col_names, rotation=45)
        if self.row_names is not None:
            ax.set_yticklabels(self.row_names)
        import matplotlib as mpl

        cmap = mpl.colormaps[self.cmap]
        verts, phases = self._frame_quads(0)
        coll = PolyCollection(
            verts, facecolors=cmap(phases / (2 * np.pi)), edgecolors="none"
        )
        ax.add_collection(coll)
        # cyclic phase colourbar
        sm = mcm.ScalarMappable(cmap=cmap)
        sm.set_clim(0, 2 * np.pi)
        cbar = fig.colorbar(
            sm, ax=ax, ticks=[0, np.pi / 2, np.pi, 3 * np.pi / 2, 2 * np.pi]
        )
        cbar.ax.set_yticklabels(
            ["0", "π/2", "π", "3π/2", "2π"]
        )
        cbar.set_label("arg ρ_ij")
        texts = []
        if self.add_text:
            for i in range(self.nrow):
                for j in range(self.ncol):
                    texts.append(
                        ax.text(
                            j, i, "", ha="center", va="center", fontsize=7
                        )
                    )
        return fig, ax, coll, cmap, texts

    def _update(self, ax, coll, cmap, texts, frame: int) -> None:
        verts, phases = self._frame_quads(frame)
        coll.set_verts(verts)
        coll.set_facecolors(cmap(phases / (2 * np.pi)))
        ax.set_title(
            f"{self.title}  t = {self.times[frame]:.2f} {self.time_unit}"
        )
        if texts:
            m = self.rho_t[frame]
            for q, txt in enumerate(texts):
                v = m[q // self.ncol, q % self.ncol]
                txt.set_text(
                    f"{v.real:+.2f}\n{v.imag:+.2f}j"
                    if abs(v) > 1e-3 * self.maxabs
                    else ""
                )

    def save(
        self, filename: str = "density.gif", interval_ms: int = 100
    ) -> str:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import animation

        fig, ax, coll, cmap, texts = self._setup()

        def update(frame):
            self._update(ax, coll, cmap, texts, frame)
            return (coll,)

        anim = animation.FuncAnimation(
            fig, update, frames=self.rho_t.shape[0], interval=interval_ms
        )
        writer = "ffmpeg" if filename.endswith(".mp4") else "pillow"
        anim.save(filename, writer=writer)
        plt.close(fig)
        return filename


def anim_density_matrix(
    rho_t: np.ndarray,
    filename: str = "density.gif",
    interval_ms: int = 100,
    component: str = "abs",
    times: np.ndarray | None = None,
    row_names: list[str] | None = None,
    col_names: list[str] | None = None,
    title: str = "Density matrix",
    time_unit: str = "fs",
    add_text: bool = False,
):
    """Animate a (t, d, d) density-matrix trajectory.

    ``component='abs'`` (default) renders the annotated phase-coloured
    Hinton animation (:class:`ComplexMatrixAnimation`); ``'real'`` /
    ``'imag'`` keep the simple component heatmap animation.
    """
    rho_t = np.asarray(rho_t)
    if component == "abs":
        return ComplexMatrixAnimation(
            rho_t, times, title=title, row_names=row_names,
            col_names=col_names, time_unit=time_unit, add_text=add_text,
        ).save(filename, interval_ms=interval_ms)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    comp = {"real": np.real, "imag": np.imag}[component]
    vmax = np.abs(comp(rho_t)).max()
    fig, ax = plt.subplots()
    im = ax.imshow(comp(rho_t[0]), vmin=-vmax, vmax=vmax,
                   interpolation="nearest")
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
