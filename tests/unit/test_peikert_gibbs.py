"""Peikert convolution sampler + annealed Gibbs CVP decoding."""

import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
)
from lattice_gaussian_mcmc_tpu.samplers import PeikertSampler
from lattice_gaussian_mcmc_tpu.samplers.gibbs import (
    annealed_gibbs_decode,
    gibbs_chain,
)

from tests.unit.test_klein import enumerate_target, empirical_dist, tvd_dicts


def test_peikert_identity_matches_target(key):
    # sigma small enough that the joint-TVD Monte-Carlo noise floor
    # (~0.5*sqrt(n_states/N)) sits below the gate
    lat = identity_lattice(2, dtype=jnp.float64)
    sigma = 3.0
    s = PeikertSampler(lat, sigma)
    coeffs = s.sample(key, 150_000, return_coeffs=True)
    target = enumerate_target(np.eye(2), sigma, np.zeros(2), radius=20)
    emp = empirical_dist(coeffs)
    assert tvd_dicts(emp, target) < 0.025


def test_peikert_general_basis(key):
    basis = np.array([[2.0, 1.0], [0.0, 2.0]])
    sigma = 8.0  # needs sigma >= r * s1(B) ~ 3.6
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    s = PeikertSampler(lat, sigma)
    coeffs = s.sample(key, 200_000, return_coeffs=True)
    target = enumerate_target(basis, sigma, np.zeros(2), radius=25)
    emp = empirical_dist(coeffs)
    assert tvd_dicts(emp, target) < 0.03
    # second-moment check: covariance of points ~ sigma^2 I
    pts = np.asarray(coeffs) @ basis.T
    cov = np.cov(pts.T)
    np.testing.assert_allclose(np.diag(cov), sigma**2, rtol=0.05)


def test_peikert_rejects_small_sigma():
    basis = np.array([[5.0, 0.0], [0.0, 5.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    with pytest.raises(ValueError):
        PeikertSampler(lat, sigma=1.0)


def test_gibbs_chain_stationary(key):
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    sigma = 2.0
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    trace, x = gibbs_chain(key, lat, jnp.zeros(2), sigma, n_sweeps=30_000)
    # discard burn-in, compare with enumerated target
    coeffs = np.asarray(trace)[1000:]
    target = enumerate_target(basis, sigma, np.zeros(2), radius=15)
    emp = empirical_dist(coeffs)
    assert tvd_dicts(emp, target) < 0.05  # correlated samples: looser gate


def test_annealed_gibbs_decodes_cvp(key, rng):
    # plant a known closest point: t = B x* + small noise
    B = rng.integers(-4, 5, size=(6, 6)).astype(np.float64)
    while abs(np.linalg.det(B)) < 1:
        B = rng.integers(-4, 5, size=(6, 6)).astype(np.float64)
    lat = lattice_from_basis(B, dtype=jnp.float64)
    x_star = rng.integers(-3, 4, size=6).astype(np.float64)
    noise = rng.normal(scale=0.05, size=6)
    t = jnp.asarray(B @ x_star + noise)
    point, coeffs, d2 = annealed_gibbs_decode(key, lat, t, sigma0=2.0,
                                              n_sweeps=40, n_chains=32)
    np.testing.assert_allclose(np.asarray(coeffs), x_star)
    assert float(d2) <= np.sum(noise**2) + 1e-9


def test_annealed_gibbs_beats_or_matches_babai(key, rng):
    B = rng.integers(-9, 10, size=(8, 8)).astype(np.float64)
    while abs(np.linalg.det(B)) < 1:
        B = rng.integers(-9, 10, size=(8, 8)).astype(np.float64)
    lat = lattice_from_basis(B, dtype=jnp.float64)
    t = jnp.asarray(rng.normal(scale=15.0, size=8))
    babai_pt, _ = lat.decode_cvp(t)
    d_babai = float(jnp.sum((babai_pt - t) ** 2))
    _, _, d_gibbs = annealed_gibbs_decode(key, lat, t, sigma0=3.0,
                                          n_sweeps=60, n_chains=64)
    assert float(d_gibbs) <= d_babai + 1e-9
