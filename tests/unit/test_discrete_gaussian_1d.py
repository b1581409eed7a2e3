"""1D discrete Gaussian base samplers vs the exact pmf (reference
methodology: experiments/klein_validation_suite.py:52-147 — TVD < 0.02,
KL < 0.05 gates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import (
    build_cdt,
    exact_pmf,
    log_partition_window,
    sample_cdt,
    sample_dgauss,
    sample_dgauss_rejection,
    sample_dgauss_with_logz,
)
from lattice_gaussian_mcmc_tpu.ops.theta import log_rho_Z, rho_Z


def empirical_tvd_kl(samples, support, probs):
    samples = np.asarray(samples).astype(np.int64)
    lo, hi = support[0], support[-1]
    counts = np.bincount(np.clip(samples - lo, 0, hi - lo),
                         minlength=len(support)).astype(np.float64)
    emp = counts / counts.sum()
    tvd = 0.5 * np.abs(emp - probs).sum()
    mask = emp > 0
    kl = np.sum(emp[mask] * np.log(emp[mask] / probs[mask]))
    return tvd, kl


@pytest.mark.parametrize("sigma,center", [(1.0, 0.0), (5.0, 0.3), (2.0, -7.6),
                                          (0.8, 0.5)])
def test_window_sampler_matches_exact_pmf(key, sigma, center):
    n = 200_000
    centers = jnp.full((n,), center)
    sigmas = jnp.full((n,), sigma)
    z = sample_dgauss(key, centers, sigmas, window=64)
    support, probs = exact_pmf(sigma, center)
    tvd, kl = empirical_tvd_kl(np.asarray(z), support, probs)
    assert tvd < 0.02, f"TVD {tvd}"
    assert kl < 0.05, f"KL {kl}"


def test_window_logz_matches_rho(key):
    # window logZ should equal log rho_Z for window >> sigma
    sigma, center = 3.0, 0.4
    lz = log_partition_window(jnp.asarray(center), jnp.asarray(sigma), window=64)
    expected = log_rho_Z(jnp.asarray(sigma), jnp.asarray(center))
    np.testing.assert_allclose(float(lz), float(expected), rtol=1e-6)


def test_cdt_sampler(key):
    sigma, center = 4.0, 1.25
    cdt = build_cdt(sigma, center)
    z = sample_cdt(key, cdt, shape=(200_000,))
    support, probs = exact_pmf(sigma, center)
    tvd, kl = empirical_tvd_kl(np.asarray(z), support, probs)
    assert tvd < 0.02 and kl < 0.05


def test_rejection_sampler(key):
    sigma, center = 30.0, -2.7  # large sigma: the rejection regime
    z = sample_dgauss_rejection(key, jnp.full((100_000,), center),
                                jnp.full((100_000,), sigma))
    support, probs = exact_pmf(sigma, center)
    tvd, kl = empirical_tvd_kl(np.asarray(z), support, probs)
    assert tvd < 0.03 and kl < 0.08


def test_rho_Z_regimes():
    # direct vs Poisson agree near the crossover
    for sigma in [0.7, 0.9, 1.0, 1.5, 3.0]:
        for c in [0.0, 0.3, 0.5]:
            s = jnp.asarray(sigma, dtype=jnp.float64)
            direct = sum(np.exp(-0.5 * ((k - c) / sigma) ** 2)
                         for k in range(-60, 61))
            np.testing.assert_allclose(float(rho_Z(s, c)), direct, rtol=1e-6)


def test_reproducibility(key):
    a = sample_dgauss(key, jnp.zeros(100), jnp.full(100, 2.0))
    b = sample_dgauss(key, jnp.zeros(100), jnp.full(100, 2.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gumbel_and_logz_consistent(key):
    z, lz = sample_dgauss_with_logz(key, jnp.asarray(0.2), jnp.asarray(2.0))
    assert np.isfinite(float(lz))
    assert abs(float(z)) < 30
