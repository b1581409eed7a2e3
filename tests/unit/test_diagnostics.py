"""Diagnostics: ESS/tau_int, TVD, R-hat, Wasserstein, spectral gap
(reference tests/unit/test_diagnostics.py methodology)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.diagnostics import (
    autocorrelation,
    integrated_autocorr_time,
    effective_sample_size,
    ess_batch_means,
    gelman_rubin,
    tvd_histogram,
    tvd_vs_exact,
    kl_divergence_discrete,
    wasserstein_1d,
    sliced_wasserstein,
    mixing_time_from_tvd,
    batch_means_variance,
    spectral_gap_mc,
    empirical_transition_gap,
    kmeans_discretize,
    mcse,
    diagnose_chain,
    jump_distances,
)
from lattice_gaussian_mcmc_tpu.diagnostics.spectral import (
    mixing_time_bounds,
    rejection_spectrum,
)


def ar1(rng, T, rho, size=1):
    x = np.zeros((T, size))
    eps = rng.normal(size=(T, size))
    for t in range(1, T):
        x[t] = rho * x[t - 1] + np.sqrt(1 - rho**2) * eps[t]
    return x.squeeze()


def test_acf_iid(rng):
    x = jnp.asarray(rng.normal(size=20_000))
    acf = np.asarray(autocorrelation(x, 50))
    assert abs(acf[0] - 1.0) < 1e-9
    assert np.all(np.abs(acf[1:]) < 0.05)


def test_tau_int_ar1(rng):
    rho = 0.9
    x = jnp.asarray(ar1(rng, 200_000, rho))
    tau = float(integrated_autocorr_time(x, 512))
    expected = (1 + rho) / (1 - rho)  # = 19
    assert abs(tau - expected) / expected < 0.15


def test_ess_iid(rng):
    x = jnp.asarray(rng.normal(size=50_000))
    ess = float(effective_sample_size(x))
    assert 0.8 * 50_000 < ess < 1.3 * 50_000
    essb = float(ess_batch_means(x))
    assert 0.5 * 50_000 < essb < 2.0 * 50_000


def test_ess_multivariate_min(rng):
    a = ar1(rng, 50_000, 0.95)
    b = rng.normal(size=50_000)
    X = jnp.asarray(np.stack([a, b], axis=1))
    ess = float(effective_sample_size(X))
    assert ess < 10_000  # dominated by the sticky dimension


def test_gelman_rubin_converged(rng):
    chains = jnp.asarray(rng.normal(size=(4, 10_000)))
    r = float(gelman_rubin(chains))
    assert abs(r - 1.0) < 0.01


def test_gelman_rubin_diverged(rng):
    chains = np.stack([rng.normal(size=5000),
                       rng.normal(loc=10.0, size=5000)])
    r = float(gelman_rubin(jnp.asarray(chains)))
    assert r > 1.5


def test_tvd_histogram_same_dist(key, rng):
    x = jnp.asarray(rng.normal(size=50_000))
    y = jnp.asarray(rng.normal(size=50_000))
    assert float(tvd_histogram(x, y)) < 0.03


def test_tvd_histogram_different(rng):
    x = jnp.asarray(rng.normal(size=20_000))
    y = jnp.asarray(rng.normal(loc=3.0, size=20_000))
    assert float(tvd_histogram(x, y)) > 0.5


def test_tvd_vs_exact_pmf(rng):
    from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import exact_pmf
    support, probs = exact_pmf(2.0)
    samples = rng.choice(support, p=probs, size=100_000)
    assert tvd_vs_exact(samples, support, probs) < 0.02
    assert kl_divergence_discrete(samples, support, probs) < 0.05


def test_wasserstein(rng):
    x = jnp.asarray(rng.normal(size=10_000))
    y = jnp.asarray(rng.normal(loc=2.0, size=10_000))
    w = float(wasserstein_1d(x, y))
    assert abs(w - 2.0) < 0.1


def test_sliced_wasserstein(key, rng):
    X = jnp.asarray(rng.normal(size=(5000, 3)))
    Y = jnp.asarray(rng.normal(size=(5000, 3)) + np.array([1.0, 0, 0]))
    w = float(sliced_wasserstein(key, X, Y))
    assert 0.2 < w < 1.2


def test_mixing_time_from_tvd():
    tvds = np.array([0.9, 0.6, 0.4, 0.3, 0.2, 0.1, 0.05])
    assert mixing_time_from_tvd(tvds, 0.25) == 4
    assert mixing_time_from_tvd(np.ones(5), 0.25) == 5


def test_batch_means_variance_ar1(rng):
    rho = 0.8
    x = jnp.asarray(ar1(rng, 100_000, rho))
    v = float(batch_means_variance(x, 64))
    expected = (1 + rho) / (1 - rho)  # long-run variance of unit-var AR(1)
    assert abs(v - expected) / expected < 0.4


def test_spectral_gap_mc_uniform_weights():
    lw = jnp.zeros(100)
    assert abs(float(spectral_gap_mc(lw)) - 1.0) < 1e-6


def test_kmeans_and_transition_gap(key, rng):
    # two well-separated clusters with rare switching -> small gap
    T = 4000
    switch = rng.random(T) < 0.02
    state = np.cumsum(switch) % 2
    x = rng.normal(size=(T, 2)) * 0.2 + state[:, None] * 5.0
    gap = empirical_transition_gap(key, jnp.asarray(x), k=4)
    assert 0.0 < gap < 0.3
    labels, centers = kmeans_discretize(key, jnp.asarray(x), k=2)
    assert set(np.unique(np.asarray(labels))) <= {0, 1}


def test_mixing_time_bounds():
    b = mixing_time_bounds(0.5, 0.25)
    assert b["upper"] > 0 and b["lower"] >= 0
    assert mixing_time_bounds(0.0)["upper"] == float("inf")


def test_rejection_spectrum():
    np.testing.assert_allclose(rejection_spectrum(2.0), [1.0, 0.5])


def test_mcse_and_diagnose(rng):
    x = jnp.asarray(rng.normal(size=(10_000, 2)))
    se = float(mcse(x[:, 0]))
    assert abs(se - 1 / np.sqrt(10_000)) < 5e-3
    d = diagnose_chain(x)
    assert d["n_samples"] == 10_000
    assert float(d["ess_per_sample"]) > 0.5
    j = jump_distances(x)
    assert float(j["frac_zero"]) == 0.0


def test_mcse_spectral(rng):
    from lattice_gaussian_mcmc_tpu.diagnostics.mcmc import mcse_spectral
    x = jnp.asarray(rng.normal(size=20_000))
    se = float(mcse_spectral(x))
    assert abs(se - 1 / np.sqrt(20_000)) < 3e-3


def test_gs_decay_correlation(rng):
    """Usage std tracks sigma/||b*_i|| when the sampler exercises the GS
    profile (reference convergence.py:402-444)."""
    from lattice_gaussian_mcmc_tpu.diagnostics.report import (
        gs_decay_correlation,
    )
    g = np.geomspace(4.0, 0.5, 64)
    sigma = 2.0
    X = rng.normal(0, sigma / g[None, :], (4000, 64))
    out = gs_decay_correlation(X, g, sigma)
    assert out["log_gs_vs_log_usage_corr"] < -0.95
    assert out["predicted_vs_observed_usage_corr"] > 0.95
    assert out["usage_profile_ok"]
    # starved sampler: flat usage regardless of the GS profile
    Xflat = rng.normal(0, 1.0, (4000, 64))
    bad = gs_decay_correlation(Xflat, g, sigma)
    assert abs(bad["predicted_vs_observed_usage_corr"]) < 0.5


def test_memory_snapshot_keys():
    from lattice_gaussian_mcmc_tpu.utils.profiling import memory_snapshot
    snap = memory_snapshot()
    assert snap.get("peak_rss_mb", 0) > 10  # a real python process
