"""Interpret-mode coverage for the Z^n Pallas base sampler (VERDICT r1 weak
#9: previously only exercised on real TPU by the benchmark)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import exact_pmf
from lattice_gaussian_mcmc_tpu.ops.kernels.zn_pallas import sample_zn_pallas


def _draw(key, num, sigma, center=0.0, window=64):
    # force_tpu_interpret_mode (not interpret=True) — it simulates the TPU
    # hardware PRNG, which plain CPU interpret mode does not implement
    with pltpu.force_tpu_interpret_mode():
        z = sample_zn_pallas(key, num, sigma, center=center,
                             window=window, rows=8, tile=128, host_rng=True)
    return np.asarray(z)


def test_zn_pallas_moments(key):
    sigma = 3.0
    z = _draw(key, 8 * 128 * 8, sigma)
    assert z.shape == (8192,)
    np.testing.assert_allclose(z, np.round(z))  # integer-valued
    assert abs(z.mean()) < 4 * sigma / np.sqrt(len(z))
    assert abs(z.std() - sigma) < 0.15


def test_zn_pallas_tvd_vs_exact(key):
    sigma = 2.0
    z = _draw(key, 8 * 128 * 16, sigma)
    support, probs = exact_pmf(sigma)
    lo = int(support[0])
    counts = np.zeros(len(support))
    idx = np.clip(z.astype(np.int64) - lo, 0, len(support) - 1)
    np.add.at(counts, idx, 1.0)
    emp = counts / counts.sum()
    tvd = 0.5 * np.abs(emp - np.asarray(probs)).sum()
    assert tvd < 0.03, tvd


def test_zn_pallas_nonzero_center(key):
    z = _draw(key, 8 * 128 * 8, 1.5, center=0.5, window=32)
    # D_{Z,1.5,0.5} is symmetric about 0.5
    assert abs(z.mean() - 0.5) < 0.1


def test_zn_pallas_batch_constraint(key):
    with pytest.raises(AssertionError):
        with pltpu.force_tpu_interpret_mode():
            sample_zn_pallas(key, 1000, 2.0, rows=8, tile=128, host_rng=True)
