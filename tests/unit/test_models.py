"""GMRF / CAR / Ising models (reference src/models/ C21 — functional here;
the reference's versions depended on a stub grid with no neighbors)."""

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.models import (
    car_precision,
    gmrf_log_density,
    gmrf_precision,
    gmrf_sample,
    grid_adjacency,
    ising_energy,
    ising_gibbs_sweep,
    ising_sample,
)
from lattice_gaussian_mcmc_tpu.models.grid import coords_to_site, site_to_coords


def test_grid_adjacency_degrees():
    W = grid_adjacency((3, 3))
    np.testing.assert_array_equal(W, W.T)
    degs = sorted(W.sum(1).tolist())
    assert degs == [2, 2, 2, 2, 3, 3, 3, 3, 4]
    Wp = grid_adjacency((3, 3), periodic=True)
    assert np.all(Wp.sum(1) == 4)


def test_site_coords_roundtrip():
    shape = (4, 5)
    for s in range(20):
        assert coords_to_site(site_to_coords(s, shape), shape) == s


def test_gmrf_sampling_covariance(key):
    Q = gmrf_precision((3, 3), tau=1.0, kappa=0.5)
    x = gmrf_sample(key, Q, shape=(30_000,))
    emp = np.cov(np.asarray(x).T)
    true = np.linalg.inv(np.asarray(Q))
    assert np.abs(emp - true).max() / np.abs(true).max() < 0.05


def test_gmrf_log_density_gradient():
    Q = gmrf_precision((2, 2), kappa=1.0)
    b = jnp.ones(4)
    x = jnp.asarray([0.5, -1.0, 2.0, 0.0])
    g = jax.grad(lambda z: gmrf_log_density(z, Q, b))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(-(Q @ x) + b),
                               rtol=1e-9)


def test_car_precision_spd():
    Q = np.asarray(car_precision((3, 3), rho=0.9))
    assert np.all(np.linalg.eigvalsh(Q) > 0)
    import pytest
    with pytest.raises(ValueError):
        car_precision((2, 2), rho=1.5)


def test_ising_energy_ground_state():
    spins = jnp.ones((8, 8))
    # periodic 2D grid: E = -J * 2 * N for all-up
    assert float(ising_energy(spins, J=1.0)) == -2.0 * 64


def test_ising_phase_transition(key):
    _, _, m_hot = ising_sample(jax.random.fold_in(key, 0), (24, 24),
                               beta=0.25, n_sweeps=200)
    _, _, m_cold = ising_sample(jax.random.fold_in(key, 1), (24, 24),
                                beta=0.6, n_sweeps=200)
    assert abs(float(m_hot)) < 0.25
    assert abs(float(m_cold)) > 0.7


def test_ising_sweep_preserves_shape(key):
    sp = jnp.ones((6, 6))
    out = ising_gibbs_sweep(key, sp, beta=0.5)
    assert out.shape == (6, 6)
    assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}
