"""Klein sampler statistical correctness (reference methodology:
tests/unit/test_samplers.py:57-217 — exact-pmf comparison, QR accuracy,
moment checks; experiments/klein_validation_suite.py Exp2: 2D Klein vs full
enumerated target)."""

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
    KleinSampler,
    klein_precompute,
    klein_sample_batch,
)
from lattice_gaussian_mcmc_tpu.samplers.klein import (
    klein_log_density,
    klein_points,
)


def enumerate_target(basis, sigma, center, radius):
    """Exact D_{Lambda,sigma,c} pmf by enumeration over a coefficient box."""
    n = basis.shape[0]
    coords = list(itertools.product(range(-radius, radius + 1), repeat=n))
    X = np.array(coords, dtype=np.float64)
    pts = X @ basis.T
    logp = -0.5 * np.sum((pts - center) ** 2, axis=1) / sigma**2
    p = np.exp(logp - logp.max())
    p /= p.sum()
    return {tuple(map(int, x)): pi for x, pi in zip(coords, p)}


def empirical_dist(coeffs):
    coeffs = np.asarray(coeffs).astype(np.int64)
    uniq, counts = np.unique(coeffs, axis=0, return_counts=True)
    total = counts.sum()
    return {tuple(map(int, u)): c / total for u, c in zip(uniq, counts)}


def tvd_dicts(p, q):
    keys = set(p) | set(q)
    return 0.5 * sum(abs(p.get(k, 0.0) - q.get(k, 0.0)) for k in keys)


@pytest.mark.parametrize("sigma", [1.5, 3.0])
def test_klein_identity_2d_exact(key, sigma):
    lat = identity_lattice(2, dtype=jnp.float64)
    pre = klein_precompute(lat, sigma)
    coeffs, _ = klein_sample_batch(key, pre, 100_000)
    target = enumerate_target(np.eye(2), sigma, np.zeros(2), radius=25)
    emp = empirical_dist(coeffs)
    assert tvd_dicts(emp, target) < 0.02


def test_klein_general_2d_exact(key):
    basis = np.array([[2.0, 1.0], [0.0, 3.0]])
    sigma = 4.0
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, sigma)
    coeffs, _ = klein_sample_batch(key, pre, 150_000)
    # IMHK target pmf restricted to coefficient box; Klein is close (not
    # exact) to D_Lambda — tolerance reflects the Klein-vs-target gap at
    # sigma well above max||b*||.
    target = enumerate_target(basis, sigma, np.zeros(2), radius=15)
    emp = empirical_dist(coeffs)
    assert tvd_dicts(emp, target) < 0.03


def test_klein_center_shift(key):
    basis = np.array([[1.0, 0.3], [0.0, 1.0]])
    center = np.array([0.7, -1.2])
    sigma = 3.0
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, sigma, center=center)
    coeffs, _ = klein_sample_batch(key, pre, 100_000)
    pts = np.asarray(klein_points(lat.basis, coeffs))
    # mean of D_{Lambda,sigma,c} ~ c for sigma >> eta
    se = sigma / np.sqrt(pts.shape[0])
    np.testing.assert_allclose(pts.mean(axis=0), center, atol=8 * se + 0.02)


def test_klein_moments_zn64(key):
    # BASELINE config 2: i.i.d. Z^64; mean-norm error < 2%
    n, sigma = 64, 5.0
    lat = identity_lattice(n, dtype=jnp.float64)
    pre = klein_precompute(lat, sigma)
    coeffs, _ = klein_sample_batch(key, pre, 20_000)
    pts = np.asarray(coeffs)
    assert abs(pts.mean()) < 0.05
    emp_std = pts.std()
    # discrete Gaussian variance ~ sigma^2 for sigma >> 1
    assert abs(emp_std - sigma) / sigma < 0.02
    mean_norm = np.linalg.norm(pts, axis=1).mean()
    expected = sigma * np.sqrt(n)
    assert abs(mean_norm - expected) / expected < 0.02


def test_klein_log_density_normalized(key):
    # sum over an enumeration box of exp(log q) should be ~1
    basis = np.array([[1.0, 0.4], [0.0, 1.2]])
    sigma = 2.5
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, sigma)
    coords = np.array(list(itertools.product(range(-12, 13), repeat=2)),
                      dtype=np.float64)
    logq = np.asarray(klein_log_density(jnp.asarray(coords), pre))
    total = np.exp(logq).sum()
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)


def test_klein_seed_reproducibility(key):
    lat = identity_lattice(8, dtype=jnp.float64)
    pre = klein_precompute(lat, 2.0)
    a, _ = klein_sample_batch(key, pre, 64)
    b, _ = klein_sample_batch(key, pre, 64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # chain-indexed keys: first 32 of a 64-batch == a 32-batch
    c, _ = klein_sample_batch(key, pre, 32)
    np.testing.assert_array_equal(np.asarray(a)[:32], np.asarray(c))


def test_klein_sampler_wrapper(key):
    basis = np.array([[3.0, 1.0], [1.0, 2.0]])
    s = KleinSampler(lattice_from_basis(basis, dtype=jnp.float64), sigma=4.0)
    pts = s.sample(key, 1000)
    assert pts.shape == (1000, 2)
    info = s.diagnostic_info()
    assert info["max_conditional_sigma"] >= info["min_conditional_sigma"]


def test_pathological_basis_warns(pathological_basis):
    import warnings
    lat = lattice_from_basis(pathological_basis, dtype=jnp.float64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        KleinSampler(lat, sigma=0.5)
        # nearly-dependent basis: conditional sigma blows up -> window warning
        assert any("window" in str(x.message) or "sigma" in str(x.message)
                   for x in w)


class TestAdaptivePrecision:
    """Adaptive-precision path selection (reference klein.py:273-302)."""

    def test_well_conditioned_stays_f32(self, key):
        from lattice_gaussian_mcmc_tpu.samplers.adaptive import (
            adaptive_klein_sample,
            choose_precision,
            f32_law_distortion_bound,
        )
        from lattice_gaussian_mcmc_tpu.lattices import identity_lattice
        from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
        lat = identity_lattice(8, dtype=jnp.float32)
        pre = klein_precompute(lat, 3.0)
        assert f32_law_distortion_bound(pre) < 1e-3
        assert choose_precision(pre) == "f32"
        X, lw, info = adaptive_klein_sample(key, lat, 3.0, 64)
        assert info["path"].startswith("xla_f32") or \
            info["path"] == "pallas_f32"
        assert X.shape == (64, 8)

    def test_ill_conditioned_escalates(self, key, rng):
        from lattice_gaussian_mcmc_tpu.samplers.adaptive import (
            adaptive_klein_sample,
            choose_precision,
        )
        from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
        from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
        # huge center magnitude + wide conditional sigma blow up the f32
        # rounding of c_i relative to the narrow last coordinate
        n = 8
        B = np.triu(rng.uniform(-1, 1, (n, n))) + np.diag(
            np.geomspace(1e4, 1e-3, n))
        lat = lattice_from_basis(B, dtype=jnp.float32)
        sigma = 0.45 * float(np.max(np.asarray(lat.gs_norms)))
        pre = klein_precompute(lat, sigma)
        assert choose_precision(pre, rtol=1e-2) == "f64"
        X, lw, info = adaptive_klein_sample(key, lat, sigma, 32, rtol=1e-2)
        assert info["path"] == "xla_f64"
        assert X.dtype == jnp.float64


class TestWindowBudget:
    """Total-tail-budget window policy (suggest_window_budget): the
    throughput lever behind the r4 bench window (16 vs tau's 24 on the
    NTRU-512 FALCON profile); validated end-to-end on hardware by
    scripts/validate_pallas_scale.py at the same policy."""

    def test_budget_bound_holds(self):
        from math import erfc, sqrt
        from lattice_gaussian_mcmc_tpu.samplers.klein import (
            suggest_window_budget,
        )
        rng = np.random.default_rng(3)
        for _ in range(5):
            sig = rng.uniform(0.3, 2.5, size=256)
            budget = 10 ** rng.uniform(-4, -2)
            w = suggest_window_budget(sig, budget)
            d = (w / 2 - 0.5) / (sig * sqrt(2.0))
            assert sum(erfc(x) for x in d) <= budget
            assert w % 8 == 0
            if w > 8:  # minimality: the next-narrower window must violate
                d2 = (w / 2 - 4 - 0.5) / (sig * sqrt(2.0))
                assert sum(erfc(x) for x in d2) > budget

    def test_monotone_in_budget_and_sigma(self):
        from lattice_gaussian_mcmc_tpu.samplers.klein import (
            suggest_window_budget,
        )
        sig = np.linspace(0.5, 1.8, 128)
        assert (suggest_window_budget(sig, 1e-6)
                >= suggest_window_budget(sig, 1e-2))
        assert (suggest_window_budget(2 * sig, 1e-3)
                >= suggest_window_budget(sig, 1e-3))

    def test_precompute_tail_budget_narrows_window(self):
        from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
        from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
        rng = np.random.default_rng(5)
        n = 32
        B = np.triu(rng.uniform(-0.5, 0.5, (n, n))) + np.eye(n)
        lat = lattice_from_basis(B, dtype=jnp.float64)
        sigma = 1.5 * float(np.max(np.asarray(lat.gs_norms)))
        pre_tau = klein_precompute(lat, sigma, tau=6.0)
        pre_b = klein_precompute(lat, sigma, tail_budget=5e-3)
        assert pre_b.window <= pre_tau.window
        # the budget window still samples a law close to the tau law
        key = jax.random.key(0)
        from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
            klein_sample_batch_blocked,
        )
        Xa, _ = klein_sample_batch_blocked(key, pre_tau, 2048, 32)
        Xb, _ = klein_sample_batch_blocked(key, pre_b, 2048, 32)
        ma, mb = np.mean(np.asarray(Xa), 0), np.mean(np.asarray(Xb), 0)
        sa = np.std(np.asarray(Xa), 0) / np.sqrt(2048)
        assert np.all(np.abs(ma - mb) < 6 * sa + 1e-9)
