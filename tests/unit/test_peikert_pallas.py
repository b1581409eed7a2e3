"""Peikert Pallas kernel: interpret-mode validation against the XLA law.

The kernel (ops/kernels/peikert_pallas.py) must reproduce the windowed
inverse-CDF law of ops/discrete_gaussian.py around centers c' - L2 z —
these tests feed host randomness so the comparison is deterministic
(hardware statistical validation lives in scripts/validate_pallas_scale.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
from lattice_gaussian_mcmc_tpu.samplers.peikert import peikert_precompute
from lattice_gaussian_mcmc_tpu.ops.kernels.peikert_pallas import (
    peikert_rounds_pallas,
    peikert_sample_batch_pallas,
    suggest_peikert_window,
)


def _setup(n=16, seed=0, sigma_mult=3.0):
    rng = np.random.default_rng(seed)
    B0 = np.triu(rng.uniform(-0.5, 0.5, (n, n))) + np.eye(n)
    lat = lattice_from_basis(B0, dtype=jnp.float32)
    s1 = float(jnp.linalg.norm(lat.basis, ord=2))
    pre = peikert_precompute(lat, sigma=sigma_mult * s1)
    return lat, pre


def test_window_policy_monotone():
    assert suggest_peikert_window(1.5, 64, 1e-6) >= \
        suggest_peikert_window(1.5, 64, 1e-2)
    assert suggest_peikert_window(3.0, 64, 1e-3) >= \
        suggest_peikert_window(1.5, 64, 1e-3)
    # constant-width profile: larger n -> more total tail -> wider or equal
    assert suggest_peikert_window(1.5, 1024, 1e-2) >= \
        suggest_peikert_window(1.5, 16, 1e-2)


def test_moments_interpret(key):
    lat, pre = _setup()
    w = suggest_peikert_window(float(pre.r), lat.n)
    B = 8192
    X = np.asarray(peikert_sample_batch_pallas(
        key, pre, B, window=w, tile=512, interpret=True, host_rng=True))
    assert X.shape == (B, lat.n)
    assert np.allclose(X, np.round(X))
    G = np.asarray(lat.basis.T @ lat.basis)
    target_cov = float(pre.sigma) ** 2 * np.linalg.inv(G)
    se = np.sqrt(np.diag(target_cov) / B)
    assert np.all(np.abs(X.mean(0)) < 5 * se)
    ratio = np.var(X, axis=0, ddof=1) / np.diag(target_cov)
    # chi^2 concentration at B=8192: 5 sigma ~ 1 +- 0.08
    assert np.all(np.abs(ratio - 1.0) < 0.12), ratio


def test_matches_xla_windowed_icdf_law(key):
    """With identical host randomness the kernel must agree with a pure-XLA
    evaluation of the same windowed inverse-CDF law (boundary round-off can
    flip an index with probability ~1e-6 per coordinate; assert the
    mismatch rate stays at that scale)."""
    lat, pre = _setup(n=24)
    n, window = lat.n, 16
    B = 2048
    X = np.asarray(peikert_sample_batch_pallas(
        key, pre, B, window=window, tile=512, interpret=True, host_rng=True))

    # replicate the kernel's exact randomness layout (peikert_pallas.py
    # peikert_sample_batch_pallas: seed, zin, unif from split(key, 3))
    _, k_z, k_u = jax.random.split(key, 3)
    zin = jax.random.normal(k_z, (n, B), dtype=jnp.float32)
    unif = jax.random.uniform(k_u, (n, B), dtype=jnp.float32)
    L2 = np.asarray(pre.L2, np.float32)
    cp = np.asarray(pre.cprime, np.float32)
    C = cp[:, None] - L2 @ np.asarray(zin, np.float32)
    r = float(pre.r)
    offs = np.arange(window, dtype=np.float32) - window // 2
    base = np.round(C)
    delta = base - C
    a = 1.0 / r ** 2
    lm = -a * (0.5 * offs[:, None, None] ** 2
               + delta[None, :, :] * offs[:, None, None])
    wgt = np.exp(lm.astype(np.float32))
    cdf = np.cumsum(wgt, axis=0)
    target = np.asarray(unif) * cdf[-1]
    idx = np.sum(cdf < target[None, :, :], axis=0)
    Z = base - window // 2 + np.clip(idx, 0, window - 1)
    mismatch = np.mean(X.T != Z)
    assert mismatch < 1e-3, mismatch


def test_rounds_ring_interpret(key):
    lat, pre = _setup()
    w = suggest_peikert_window(float(pre.r), lat.n)
    R = np.asarray(peikert_rounds_pallas(
        key, pre, 1024, n_rounds=3, window=w, tile=512, interpret=True,
        host_rng=True))
    assert R.shape == (3, 1024, lat.n)
    assert not np.allclose(R[0], R[1])
    G = np.asarray(lat.basis.T @ lat.basis)
    target = np.diag(float(pre.sigma) ** 2 * np.linalg.inv(G))
    for i in range(3):
        ratio = np.mean(np.var(R[i], axis=0, ddof=1) / target)
        assert abs(ratio - 1.0) < 0.15, (i, ratio)


def test_padding_non_multiple_of_8(key):
    lat, pre = _setup(n=12)
    X = np.asarray(peikert_sample_batch_pallas(
        key, pre, 512, window=16, tile=256, interpret=True, host_rng=True))
    assert X.shape == (512, 12)
    assert np.allclose(X, np.round(X))


@pytest.mark.tpu
def test_hardware_moments():
    """On-chip PRNG path: moments against the analytic covariance.

    n=128, NOT a tiny lattice: Mosaic's remote compile has been observed
    to hang indefinitely on this kernel at n=16 (sub-MXU operand shapes),
    while n >= 128 compiles in ~30 s (scripts/peikert_microbench.py)."""
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        pallas_supported,
    )
    if not pallas_supported():
        pytest.skip("needs TPU")
    lat, pre = _setup(n=128)
    w = suggest_peikert_window(float(pre.r), lat.n)
    X = np.asarray(peikert_sample_batch_pallas(
        jax.random.key(5), pre, 65536, window=w, tile=1024))
    G = np.asarray(lat.basis.T @ lat.basis)
    target_cov = float(pre.sigma) ** 2 * np.linalg.inv(G)
    ratio = np.var(X, axis=0, ddof=1) / np.diag(target_cov)
    assert np.all(np.abs(ratio - 1.0) < 0.06), ratio
