"""Comprehensive convergence reporting.

Parity: reference `src/diagnostics/convergence.py` (C17,
ConvergenceDiagnostics) — empirical mixing time from multi-chain max-TVD
(:152-190), uniform ergodicity over starting points (:213-250), minorization
constant (:252-290), importance-weight distribution + ESS (:292-329),
worst-case starting point (:331-363), distance-to-mode vs sigma sqrt(n)
(:365-400), batch-means SE / optimal batch size (:446-526), comprehensive
report (:528-581).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.diagnostics.convergence import (
    batch_means_variance,
    tvd_histogram,
)
from lattice_gaussian_mcmc_tpu.diagnostics.mcmc import (
    effective_sample_size,
    integrated_autocorr_time,
    mcse,
)
from lattice_gaussian_mcmc_tpu.samplers.imhk import imhk_chain
from lattice_gaussian_mcmc_tpu.samplers.klein import (
    KleinPrecomp,
    klein_sample_batch,
)
from lattice_gaussian_mcmc_tpu.utils.stats import logmeanexp


def empirical_mixing_time(chains, threshold: float = 0.1,
                          n_bins: int = 32) -> int:
    """Mixing time from multi-chain max pairwise binned TVD of growing
    prefixes (reference :152-190). chains: (C, T) scalar summaries."""
    chains = np.asarray(chains)
    C, T = chains.shape
    checkpoints = [t for t in (10, 30, 100, 300, 1000, 3000, 10000, T) if t <= T]
    for t in checkpoints:
        tvds = []
        for a in range(C):
            for b in range(a + 1, C):
                x = jnp.asarray(chains[a, :t])
                y = jnp.asarray(chains[b, :t])
                tvds.append(float(tvd_histogram(x, y, n_bins)))
        if tvds and max(tvds) < threshold:
            return t
    return T


def importance_weight_report(log_ws) -> Dict[str, float]:
    """Weight distribution + importance-sampling ESS
    ESS_w = (sum w)^2 / sum w^2 (reference :292-329)."""
    lw = jnp.ravel(jnp.asarray(log_ws))
    m = jnp.max(lw)
    w = jnp.exp(lw - m)
    ess_w = float(jnp.sum(w)) ** 2 / float(jnp.sum(w * w))
    return {
        "log_w_mean": float(jnp.mean(lw)),
        "log_w_std": float(jnp.std(lw)),
        "log_w_max": float(m),
        "is_ess": ess_w,
        "is_ess_fraction": ess_w / lw.size,
        "spectral_gap_bound": float(jnp.exp(logmeanexp(lw) - m)),
    }


def minorization_constant(log_ws) -> float:
    """The IMHK kernel satisfies P(x, .) >= delta pi(.) with
    delta = 1/max w — estimated self-normalized from sampled weights
    (reference :252-290)."""
    lw = jnp.ravel(jnp.asarray(log_ws))
    return float(jnp.exp(logmeanexp(lw) - jnp.max(lw)))


def uniform_ergodicity_test(pre: KleinPrecomp, key, n_starts: int = 8,
                            n_steps: int = 500) -> Dict[str, object]:
    """Run chains from dispersed starting points; uniform ergodicity means
    the final-coordinate distributions agree (max pairwise TVD small)
    (reference :213-250)."""
    finals = []
    for s in range(n_starts):
        coeffs, _, _ = imhk_chain(jax.random.fold_in(key, s), pre,
                                  n_samples=n_steps)
        finals.append(np.asarray(coeffs)[:, 0])
    tvds = []
    for a in range(n_starts):
        for b in range(a + 1, n_starts):
            tvds.append(float(tvd_histogram(jnp.asarray(finals[a]),
                                            jnp.asarray(finals[b]), 32)))
    return {"max_pairwise_tvd": max(tvds), "uniformly_ergodic":
            max(tvds) < 0.15}


def distance_to_mode(points, center, sigma: float) -> Dict[str, float]:
    """Distance concentration around sigma sqrt(n) (reference :365-400)."""
    pts = np.asarray(points)
    c = np.asarray(center)
    d = np.linalg.norm(pts - c, axis=1)
    n = pts.shape[1]
    expected = sigma * np.sqrt(n)
    return {"mean_distance": float(d.mean()),
            "expected_distance": float(expected),
            "relative_error": float(abs(d.mean() - expected) / expected)}


def gs_decay_correlation(coeffs, gs_norms, sigma: float) -> Dict[str, object]:
    """Gram-Schmidt-decay vs coordinate-usage correlation (reference
    src/diagnostics/convergence.py:402-444).

    Klein's conditional width at coordinate i is sigma_i = sigma/||b*_i||,
    so the per-coordinate std of the sampled coefficients should track
    1/||b*_i||: a strong negative correlation between log||b*_i|| and
    log std_i indicates the sampler actually exercises the decaying tail of
    the GS profile (coordinates with small ||b*_i|| carry wide conditionals),
    while correlation ~0 flags truncation/window starvation there.
    """
    X = np.asarray(coeffs, dtype=np.float64)
    g = np.asarray(gs_norms, dtype=np.float64)
    usage = X.std(axis=0)
    predicted = sigma / g
    # discrete floor: a conditional with sigma_i << 1 concentrates on one
    # integer and contributes ~0 std regardless of g — exclude those
    active = predicted > 0.3
    if active.sum() >= 3 and np.ptp(g[active]) > 0:
        corr = float(np.corrcoef(np.log(g[active]),
                                 np.log(np.maximum(usage[active], 1e-12)))[0, 1])
        pred_corr = float(np.corrcoef(predicted[active],
                                      usage[active])[0, 1])
    else:
        corr = float("nan")
        pred_corr = float("nan")
    return {
        "log_gs_vs_log_usage_corr": corr,
        "predicted_vs_observed_usage_corr": pred_corr,
        "n_active_coords": int(active.sum()),
        "gs_decay_ratio": float(g.max() / g.min()),
        "usage_profile_ok": bool(np.isnan(pred_corr) or pred_corr > 0.5),
    }


def optimal_batch_size(x, candidates=(8, 16, 32, 64, 128)) -> int:
    """Batch size minimizing batch-means variance instability via tau_int
    heuristic b ~ T^(1/3) * tau^(2/3) (reference :487-526)."""
    x = jnp.asarray(x)
    T = x.shape[0]
    tau = float(integrated_autocorr_time(x))
    target = T ** (1 / 3) * tau ** (2 / 3)
    return int(min(candidates, key=lambda b: abs(T / b - target)))


def comprehensive_report(pre: KleinPrecomp, key, n_samples: int = 5000,
                         n_chains: int = 4) -> Dict[str, object]:
    """The full C17-style report (reference :528-581)."""
    k1, k2, k3 = jax.random.split(key, 3)
    Xk, lw = klein_sample_batch(k1, pre, min(n_samples, 4096))
    gs_norms = np.asarray(pre.sigma / pre.sigmas)
    chains = []
    for c in range(n_chains):
        coeffs, _, state = imhk_chain(jax.random.fold_in(k2, c), pre,
                                      n_samples=n_samples)
        chains.append(np.asarray(coeffs)[:, 0])
    chains = np.stack(chains)
    x0 = jnp.asarray(chains[0])
    return {
        "importance_weights": importance_weight_report(lw),
        "gs_decay": gs_decay_correlation(Xk, gs_norms, float(pre.sigma)),
        "minorization_delta": minorization_constant(lw),
        "empirical_mixing_time": empirical_mixing_time(chains),
        "uniform_ergodicity": uniform_ergodicity_test(pre, k3),
        "ess": float(effective_sample_size(x0)),
        "tau_int": float(integrated_autocorr_time(x0)),
        "mcse": float(mcse(x0)),
        "batch_means_variance": float(batch_means_variance(x0)),
        "optimal_batch_size": optimal_batch_size(x0),
    }
