"""Visualization tests: every plot kind writes its figure files and (where
it emits one) a JSON data sidecar whose content round-trips (reference
tests/unit/test_visualization.py golden-file style checks, 752 LoC)."""

import json
import os

import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.visualization import PlottingTools
from lattice_gaussian_mcmc_tpu.visualization.plots import lattice_points_2d


@pytest.fixture
def pt(tmp_path):
    return PlottingTools(str(tmp_path), formats=("png",))


def _files(pt, name, sidecar=False):
    base = os.path.join(pt.output_dir, name)
    assert os.path.exists(base + ".png"), f"{name}.png not written"
    assert os.path.getsize(base + ".png") > 1000
    if sidecar:
        with open(base + "_data.json") as f:
            return json.load(f)
    return None


def test_lattice_gaussian_2d(pt, rng):
    pts = rng.normal(0, 2, (500, 2)).round()
    pt.lattice_gaussian_2d(pts, sigma=2.0, center=(0, 0), name="lg2d")
    _files(pt, "lg2d")


def test_trace_and_acf(pt, rng):
    chain = rng.normal(0, 1, (200, 6))
    pt.trace_plot(chain, name="tr")
    _files(pt, "tr")
    acf = 0.8 ** np.arange(20)
    data = pt.acf_plot(acf, name="acf") and _files(pt, "acf", sidecar=True)
    np.testing.assert_allclose(data["acf"], acf)


def test_convergence_comparison_sidecar(pt):
    rows = [{"sigma_over_eta": s, "klein_tvd": 0.1 / s, "imhk_tvd": 0.05 / s}
            for s in (0.5, 1.0, 2.0)]
    pt.convergence_comparison(rows, name="cc")
    data = _files(pt, "cc", sidecar=True)
    assert len(data["results"]) == 3
    assert data["results"][0]["sigma_over_eta"] == 0.5


def test_tvd_evolution(pt):
    decay = [{"t": t, "tvd": 0.5 * 0.8 ** t, "bound": 0.9 ** t}
             for t in range(1, 20)]
    pt.tvd_evolution(decay, name="tvd")
    data = _files(pt, "tvd", sidecar=True)
    assert len(data["decay"]) == 19


def test_importance_weights_stats(pt, rng):
    lw = rng.normal(-3, 0.5, 2000)
    pt.importance_weights(lw, name="iw")
    data = _files(pt, "iw", sidecar=True)
    assert abs(data["mean"] - lw.mean()) < 1e-9
    assert data["max"] == lw.max()


def test_qq_plot(pt, rng):
    pt.qq_plot(rng.normal(0, 3, 1000).round(), sigma=3.0, name="qq")
    _files(pt, "qq")


def test_delta_scaling(pt):
    rows = [{"dimension": n, "delta": 1.0 / n, "delta_theory": 0.8 / n}
            for n in (64, 16, 32)]  # deliberately unsorted
    pt.delta_scaling(rows, name="ds")
    data = _files(pt, "ds", sidecar=True)
    # sidecar rows come back sorted by dimension
    assert [r["dimension"] for r in data["rows"]] == [16, 32, 64]


def test_algorithm_comparison_panel(pt):
    rows = []
    for algo, speed in (("klein", 1e6), ("imhk", 5e5)):
        for n in (64, 128, 256):
            rows.append({"algorithm": algo, "dimension": n,
                         "samples_per_sec": speed / n,
                         "acceptance": 0.9, "tvd": 0.01,
                         "ess_per_sec": None})  # one empty panel
    pt.algorithm_comparison_panel(rows, name="acp")
    data = _files(pt, "acp", sidecar=True)
    assert len(data["rows"]) == 6


def test_sensitivity_heatmap_grid(pt):
    rows = [{"sigma_over_eta": s, "dimension": n, "acceptance": s / (s + n)}
            for s in (0.5, 1.0, 2.0) for n in (16, 64)]
    rows.pop(3)  # missing cell -> NaN
    pt.sensitivity_heatmap(rows, name="sh")
    data = _files(pt, "sh", sidecar=True)
    grid = np.asarray(data["z"], dtype=float)
    assert grid.shape == (2, 3)
    assert np.isnan(grid).sum() == 1
    assert data["z_key"] == "acceptance"


def test_convergence_multipanel(pt, rng):
    chain = rng.normal(0, 1, (300, 3))
    acf = 0.7 ** np.arange(15)
    decay = [{"t": t, "tvd": 0.4 * 0.9 ** t} for t in range(1, 10)]
    pt.convergence_multipanel(chain, acf, decay, rng.normal(-2, 1, 500),
                              name="cmp")
    _files(pt, "cmp")


def test_scaling_plot(pt):
    rows = [{"dimension": n, "samples_per_sec": 1e6 / n} for n in (16, 256)]
    pt.scaling_plot(rows, "dimension", "samples_per_sec", name="sc")
    data = _files(pt, "sc", sidecar=True)
    assert len(data["rows"]) == 2


def test_save_tikz(pt):
    x = np.arange(5.0)
    path = pt.save_tikz("curve", {"label_a": (x, x ** 2)},
                        xlabel="n", ylabel="t", ymode="log")
    txt = open(path).read()
    assert r"\addplot" in txt and "label\\_a" in txt
    assert "ymode=log" in txt


def test_lattice_points_2d(tmp_path):
    B = np.array([[2.0, 0.5], [0.0, 1.0]])
    samples = np.array([[0.0, 0.0], [2.0, 0.5]])
    lattice_points_2d(B, radius=3, samples=samples,
                      output_dir=str(tmp_path), name="lp")
    assert os.path.getsize(os.path.join(tmp_path, "lp.png")) > 1000
