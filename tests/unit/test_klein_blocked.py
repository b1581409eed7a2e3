"""Blocked (MXU) Klein path vs the vmapped reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
)
from lattice_gaussian_mcmc_tpu.samplers import (
    klein_precompute,
    klein_sample_batch,
)
from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
    imhk_steps_batch_blocked,
    klein_sample_batch_blocked,
)

from tests.unit.test_klein import enumerate_target, empirical_dist, tvd_dicts


def test_blocked_matches_target_2d(key):
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    sigma = 2.0
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, sigma)
    X, lw = klein_sample_batch_blocked(key, pre, 100_000, block=8)
    target = enumerate_target(basis, sigma, np.zeros(2), radius=15)
    assert tvd_dicts(empirical_dist(X), target) < 0.02


def test_blocked_crosses_blocks_correctly(key, rng):
    # an 8x8 triangular basis with strong cross-block coupling, block=4
    B8 = np.triu(rng.integers(-3, 4, (8, 8))).astype(float) + np.diag([4.0] * 8)
    lat = lattice_from_basis(B8, dtype=jnp.float64)
    pre = klein_precompute(lat, 8.0)
    Xa, la = klein_sample_batch_blocked(key, pre, 50_000, block=4)
    Xv, lv = klein_sample_batch(jax.random.fold_in(key, 1), pre, 50_000)
    # same law: per-coordinate moments and weight distribution agree
    np.testing.assert_allclose(np.asarray(Xa).mean(0), np.asarray(Xv).mean(0),
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(Xa).std(0), np.asarray(Xv).std(0),
                               rtol=0.05)
    np.testing.assert_allclose(float(la.mean()), float(lv.mean()), atol=0.05)


def test_blocked_padding(key):
    # n = 10 with block = 8 exercises the padding path
    lat = identity_lattice(10, dtype=jnp.float64)
    pre = klein_precompute(lat, 3.0)
    X, lw = klein_sample_batch_blocked(key, pre, 20_000, block=8)
    assert X.shape == (20_000, 10)
    assert abs(float(X.std()) - 3.0) < 0.05
    assert abs(float(X.mean())) < 0.05


def test_blocked_imhk_steps(key):
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, 0.35)
    X0, lw0 = klein_sample_batch_blocked(key, pre, 20_000, block=8)
    X, lw, acc = imhk_steps_batch_blocked(jax.random.fold_in(key, 1), pre,
                                          X0, lw0, n_steps=10, block=8)
    rate = float(acc.mean()) / 10
    assert 0.9 < rate < 1.0
    target = enumerate_target(basis, 0.35, np.zeros(2), radius=12)
    assert tvd_dicts(empirical_dist(X), target) < 0.01
