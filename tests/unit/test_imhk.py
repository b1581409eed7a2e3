"""IMHK / symmetric Metropolis-Klein correctness (reference methodology:
tests/unit/test_samplers.py:270-320 acceptance-ratio & stationarity,
tests/test_samplers.py:111-186 detailed balance / convergence-to-target /
mixing-time / spectral gap)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
)
from lattice_gaussian_mcmc_tpu.samplers import (
    IMHKSampler,
    MetropolisKleinSampler,
    imhk_chain,
    klein_precompute,
)
from lattice_gaussian_mcmc_tpu.samplers.imhk import (
    imhk_chains,
    spectral_gap_mc,
    estimate_burn_in,
)
from lattice_gaussian_mcmc_tpu.samplers.klein import klein_sample_batch

from tests.unit.test_klein import enumerate_target, empirical_dist, tvd_dicts


def test_imhk_corrects_klein_bias_2d(key):
    # Hard regime: half-integer conditional centers + sigma below eta(Z)
    # make Klein measurably biased; the MH correction must remove it.
    # (Measured: Klein TVD ~0.0095, IMHK TVD ~0.0010 at these settings.)
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    sigma = 0.35
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, sigma)
    target = enumerate_target(basis, sigma, np.zeros(2), radius=12)

    from lattice_gaussian_mcmc_tpu.samplers import klein_sample_batch
    klein_coeffs, _ = klein_sample_batch(key, pre, 150_000)
    klein_tvd = tvd_dicts(empirical_dist(klein_coeffs), target)
    assert klein_tvd > 0.005, "regime not hard enough to exercise correction"

    coeffs, _, state = imhk_chain(key, pre, n_samples=150_000, thin=1,
                                  burn_in=500)
    imhk_tvd = tvd_dicts(empirical_dist(coeffs), target)
    assert imhk_tvd < 0.004, f"IMHK TVD {imhk_tvd}"
    assert imhk_tvd < klein_tvd / 2
    acc = float(state.accepted) / float(state.steps)
    assert 0.9 < acc < 1.0


def test_imhk_acceptance_identity(key):
    # On Z^n Klein IS the target -> acceptance ~ 1
    lat = identity_lattice(4, dtype=jnp.float64)
    pre = klein_precompute(lat, 3.0)
    _, _, state = imhk_chain(key, pre, n_samples=2000)
    acc = float(state.accepted) / float(state.steps)
    assert acc > 0.999


def test_imhk_acceptance_reasonable_on_skewed(key):
    basis = np.array([[2.0, 1.3], [0.0, 1.7]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, 3.0)
    _, _, state = imhk_chain(key, pre, n_samples=5000)
    acc = float(state.accepted) / float(state.steps)
    assert 0.5 < acc <= 1.0


def test_imhk_multichain_shapes(key):
    lat = identity_lattice(3, dtype=jnp.float64)
    pre = klein_precompute(lat, 2.0)
    coeffs, log_ws, states = imhk_chains(key, pre, n_chains=8, n_samples=50)
    assert coeffs.shape == (8, 50, 3)
    assert log_ws.shape == (8, 50)
    assert states.accepted.shape == (8,)


def test_spectral_gap_identity_near_one(key):
    lat = identity_lattice(4, dtype=jnp.float64)
    pre = klein_precompute(lat, 3.0)
    _, lw = klein_sample_batch(key, pre, 2000)
    gap = float(spectral_gap_mc(lw))
    assert gap > 0.99  # Klein == target on Z^n


def test_spectral_gap_skewed_below_one(key):
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, 0.35)
    _, lw = klein_sample_batch(key, pre, 4000)
    gap = float(spectral_gap_mc(lw))
    assert 0.5 < gap < 0.9999  # measured ~0.99 in this regime


def test_estimate_burn_in():
    assert estimate_burn_in(1.0) == 5  # ceil(-ln(0.01)) = 5
    assert estimate_burn_in(0.01) == 461
    assert estimate_burn_in(1e-9) == 10_000  # capped


def test_imhk_wrapper(key):
    basis = np.array([[2.0, 1.0], [1.0, 2.0]])
    s = IMHKSampler(lattice_from_basis(basis, dtype=jnp.float64), sigma=3.0)
    pts = s.sample(key, 500)
    assert pts.shape == (500, 2)
    assert 0.0 < s.acceptance_rate <= 1.0
    d = s.diagnose_convergence(key, 500)
    assert d["samples_per_second"] > 0


def test_smk_converges_to_target(key):
    basis = np.array([[1.0, 0.6], [0.0, 1.0]])
    sigma = 2.0
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    s = MetropolisKleinSampler(lat, sigma=sigma)
    coeffs = s.sample(key, 100_000, burn_in=200, return_coeffs=True)
    target = enumerate_target(basis, sigma, np.zeros(2), radius=15)
    emp = empirical_dist(coeffs)
    assert tvd_dicts(emp, target) < 0.03
    assert 0.0 < s.acceptance_rate <= 1.0


def test_imhk_sample_trajectory_semantics(key):
    # Regression (round-1 advice): sample() must always return a Markov-chain
    # trajectory (never silently switch to iid final states) and keep
    # _last_state for resume. Since r3, backend='pallas' IS a trajectory
    # backend (the fused kernel emits thinned states to an HBM ring), so it
    # requires a TPU rather than being rejected outright; off-TPU it must
    # raise instead of silently falling back.
    import jax
    lat = identity_lattice(3, dtype=jnp.float64)
    s = IMHKSampler(lat, sigma=2.0, burn_in=10)
    pts = s.sample(key, 2048)  # >= 1024 used to trigger the silent fork
    assert pts.shape == (2048, 3)
    assert s._last_state is not None
    if jax.default_backend() != "tpu":
        with pytest.raises(RuntimeError, match="TPU"):
            s.sample(key, 8, n_chains=256, backend="pallas")
    with pytest.raises(ValueError):
        s.sample(key, 10, backend="nonsense")


def test_imhk_sample_iid(key):
    lat = identity_lattice(3, dtype=jnp.float64)
    s = IMHKSampler(lat, sigma=2.0, burn_in=4)
    pts = s.sample_iid(key, 512, backend="xla")
    assert pts.shape == (512, 3)
    assert s._last_state is None
    assert 0.0 < s.acceptance_rate <= 1.0
    # moments match the target (sigma=2 >> eta(Z), so std ~ sigma)
    std = np.std(np.asarray(pts))
    assert abs(std - 2.0) < 0.2
    # forced pallas never silently falls back: off-TPU it raises
    # RuntimeError; on TPU a non-tileable batch raises ValueError
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        pallas_supported)
    if pallas_supported():
        with pytest.raises(ValueError, match="divisible"):
            s.sample_iid(key, 500, backend="pallas")
    else:
        with pytest.raises(RuntimeError):
            s.sample_iid(key, 512, backend="pallas")


def test_imhk_reproducible(key):
    lat = identity_lattice(3, dtype=jnp.float64)
    pre = klein_precompute(lat, 2.0)
    a, _, _ = imhk_chain(key, pre, 100)
    b, _, _ = imhk_chain(key, pre, 100)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
