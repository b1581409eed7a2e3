"""Publication plotting (host-side matplotlib, kept thin).

Parity: reference `src/visualization/plots.py` (C22) — publication styling
(:64-135), 2D lattice-Gaussian scatter/heat (:184-250), convergence
comparison (:251), trace/ACF plots (:408-532), lattice points + Voronoi
(:533-691), QQ plots (:692), TVD evolution (:738), importance weights
(:807), algorithm comparison (:863-992), multi-format save (:993-1125).

All functions take numpy arrays (device arrays are pulled to host first) and
return the matplotlib Figure; `save` handles multi-format output + data
sidecars.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


STYLE = {
    "figure.figsize": (6.0, 4.0),
    "figure.dpi": 120,
    "font.size": 10,
    "axes.grid": True,
    "grid.alpha": 0.3,
    "lines.linewidth": 1.6,
    "savefig.bbox": "tight",
}


class PlottingTools:
    """Thin stateful wrapper carrying style + output directory."""

    def __init__(self, output_dir: str = "results/figures",
                 formats: Sequence[str] = ("png", "pdf")):
        self.output_dir = output_dir
        self.formats = formats
        plt.rcParams.update(STYLE)

    # -- persistence -------------------------------------------------------

    def save(self, fig, name: str, data: Optional[Dict] = None):
        """Multi-format save + JSON data sidecar (reference :993-1125)."""
        os.makedirs(self.output_dir, exist_ok=True)
        for ext in self.formats:
            fig.savefig(os.path.join(self.output_dir, f"{name}.{ext}"))
        if data is not None:
            with open(os.path.join(self.output_dir, f"{name}_data.json"),
                      "w") as f:
                json.dump(data, f, indent=2, default=float)
        plt.close(fig)

    def save_tikz(self, name: str, curves: Dict[str, tuple],
                  xlabel: str = "x", ylabel: str = "y",
                  xmode: str = "normal", ymode: str = "normal"):
        """Export line plots as a standalone pgfplots/TikZ .tex file
        (reference :993-1125 ships a TikZ export alongside PNG/PDF so paper
        figures can be regenerated natively in LaTeX).

        curves: {legend label: (x array, y array)}; x/ymode "log" selects
        logarithmic axes.
        """
        os.makedirs(self.output_dir, exist_ok=True)
        path = os.path.join(self.output_dir, f"{name}.tex")
        lines = [
            r"\documentclass[tikz]{standalone}",
            r"\usepackage{pgfplots}",
            r"\pgfplotsset{compat=1.17}",
            r"\begin{document}",
            r"\begin{tikzpicture}",
            (r"\begin{axis}[xlabel={%s}, ylabel={%s}, xmode=%s, ymode=%s,"
             r" legend pos=outer north east, grid=major]"
             % (xlabel, ylabel, xmode, ymode)),
        ]
        for label, (x, y) in curves.items():
            x = np.asarray(x).ravel()
            y = np.asarray(y).ravel()
            coords = " ".join(f"({xv:.8g},{yv:.8g})" for xv, yv in zip(x, y))
            lines.append(r"\addplot coordinates {%s};" % coords)
            lines.append(r"\addlegendentry{%s}" % label.replace("_", r"\_"))
        lines += [r"\end{axis}", r"\end{tikzpicture}", r"\end{document}", ""]
        with open(path, "w") as f:
            f.write("\n".join(lines))
        return path

    # -- plots -------------------------------------------------------------

    def lattice_gaussian_2d(self, points, sigma: float, center=None,
                            name: str = "lattice_gaussian_2d"):
        """Scatter + density heat of 2D samples (reference :184-250)."""
        pts = np.asarray(points)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 4))
        ax1.scatter(pts[:, 0], pts[:, 1], s=4, alpha=0.25)
        ax1.set_title(f"samples (sigma={sigma:g})")
        ax1.set_aspect("equal")
        h = ax2.hist2d(pts[:, 0], pts[:, 1], bins=40, cmap="viridis")
        fig.colorbar(h[3], ax=ax2)
        ax2.set_title("empirical density")
        if center is not None:
            c = np.asarray(center)
            for ax in (ax1, ax2):
                ax.plot([c[0]], [c[1]], "r+", markersize=12)
        self.save(fig, name)
        return fig

    def trace_plot(self, chain, name: str = "trace", max_dims: int = 4):
        """Trace plots of the first coordinates (reference :408-470)."""
        x = np.asarray(chain)
        d = min(x.shape[1] if x.ndim > 1 else 1, max_dims)
        fig, axes = plt.subplots(d, 1, sharex=True, figsize=(6, 1.8 * d))
        axes = np.atleast_1d(axes)
        for i in range(d):
            axes[i].plot(x[:, i] if x.ndim > 1 else x, lw=0.6)
            axes[i].set_ylabel(f"x[{i}]")
        axes[-1].set_xlabel("step")
        self.save(fig, name)
        return fig

    def acf_plot(self, acf, name: str = "acf"):
        """Autocorrelation stem plot (reference :470-532)."""
        a = np.asarray(acf)
        fig, ax = plt.subplots()
        ax.stem(np.arange(len(a)), a, basefmt=" ")
        ax.axhline(0, color="k", lw=0.8)
        ax.set_xlabel("lag")
        ax.set_ylabel("ACF")
        self.save(fig, name, data={"acf": a.tolist()})
        return fig

    def convergence_comparison(self, results: Sequence[Dict],
                               x_key: str = "sigma_over_eta",
                               y_keys: Sequence[str] = ("klein_tvd",
                                                        "imhk_tvd"),
                               name: str = "convergence_comparison"):
        """Klein-vs-IMHK TVD curves (reference :251)."""
        fig, ax = plt.subplots()
        xs = [r[x_key] for r in results]
        for yk in y_keys:
            ax.plot(xs, [r.get(yk) for r in results], "o-", label=yk)
        ax.set_xlabel(x_key)
        ax.set_ylabel("TVD to target")
        ax.set_yscale("log")
        ax.legend()
        self.save(fig, name, data={"results": list(results)})
        return fig

    def tvd_evolution(self, decay: Sequence[Dict], name: str = "tvd_evolution"):
        """Empirical TVD vs t with the (1-delta)^t bound (reference :738)."""
        fig, ax = plt.subplots()
        ts = [r["t"] for r in decay]
        ax.loglog(ts, [r["tvd"] for r in decay], "o-", label="empirical")
        if "bound" in decay[0]:
            ax.loglog(ts, [max(r["bound"], 1e-12) for r in decay], "--",
                      label="(1-delta)^t")
        ax.set_xlabel("t")
        ax.set_ylabel("TVD")
        ax.legend()
        self.save(fig, name, data={"decay": list(decay)})
        return fig

    def importance_weights(self, log_ws, name: str = "importance_weights"):
        """Histogram of Klein log-weights (reference :807)."""
        lw = np.ravel(np.asarray(log_ws))
        fig, ax = plt.subplots()
        ax.hist(lw, bins=60, density=True)
        ax.set_xlabel("log w(x)")
        ax.set_ylabel("density")
        self.save(fig, name, data={"mean": float(lw.mean()),
                                   "std": float(lw.std()),
                                   "max": float(lw.max())})
        return fig

    def scaling_plot(self, rows: Sequence[Dict], x_key: str, y_key: str,
                     name: str = "scaling", loglog: bool = True):
        """Generic scaling curve (delta-scaling :356, perf scaling etc.)."""
        fig, ax = plt.subplots()
        xs = [r[x_key] for r in rows]
        ys = [r[y_key] for r in rows]
        (ax.loglog if loglog else ax.plot)(xs, ys, "o-")
        ax.set_xlabel(x_key)
        ax.set_ylabel(y_key)
        self.save(fig, name, data={"rows": list(rows)})
        return fig

    def qq_plot(self, samples, sigma: float, name: str = "qq"):
        """QQ plot of a coordinate vs the continuous Gaussian (reference
        :692)."""
        x = np.sort(np.ravel(np.asarray(samples)))
        from scipy import stats as _st
        q = _st.norm.ppf((np.arange(len(x)) + 0.5) / len(x), scale=sigma)
        fig, ax = plt.subplots()
        ax.plot(q, x, ".", ms=2)
        lim = max(abs(q[0]), abs(q[-1]))
        ax.plot([-lim, lim], [-lim, lim], "r--", lw=1)
        ax.set_xlabel("normal quantile")
        ax.set_ylabel("sample quantile")
        self.save(fig, name)
        return fig


def lattice_points_2d(basis, radius: int = 5, samples=None,
                      voronoi: bool = True, output_dir: str = "results/figures",
                      name: str = "lattice_points"):
    """2D lattice points + optional Voronoi cells + optional sample overlay
    (reference plots.py:533-691). Standalone helper (no PlottingTools state).
    """
    import itertools
    B = np.asarray(basis, dtype=np.float64)
    coords = np.array(list(itertools.product(range(-radius, radius + 1),
                                             repeat=2)))
    pts = coords @ B.T
    fig, ax = plt.subplots(figsize=(5, 5))
    if voronoi:
        try:
            from scipy.spatial import Voronoi, voronoi_plot_2d
            vor = Voronoi(pts)
            voronoi_plot_2d(vor, ax=ax, show_points=False,
                            show_vertices=False, line_width=0.6,
                            line_colors="gray")
        except Exception:
            pass
    ax.plot(pts[:, 0], pts[:, 1], "k.", ms=4)
    if samples is not None:
        s = np.asarray(samples)
        ax.plot(s[:, 0], s[:, 1], "r.", ms=1.5, alpha=0.3)
    # basis vectors
    for v, color in zip(B.T, ("C0", "C1")):
        ax.annotate("", xy=v, xytext=(0, 0),
                    arrowprops=dict(arrowstyle="->", color=color, lw=2))
    lim = radius * max(np.linalg.norm(B, axis=0))
    ax.set_xlim(-lim * 0.6, lim * 0.6)
    ax.set_ylim(-lim * 0.6, lim * 0.6)
    ax.set_aspect("equal")
    os.makedirs(output_dir, exist_ok=True)
    fig.savefig(os.path.join(output_dir, f"{name}.png"))
    plt.close(fig)
    return fig
