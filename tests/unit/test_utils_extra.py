"""Sampler math utils (C8 parity), convergence report (C17), checkpointing,
reporting."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
)
from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import exact_pmf
from lattice_gaussian_mcmc_tpu.samplers.utils import (
    build_alias_table,
    discrete_gaussian_moments,
    imhk_mixing_time_bound,
    log_partition_bounds,
    log_partition_mc,
    rho_inverse_radius,
    sample_alias,
    sample_coset,
    sample_ellipsoidal,
)
from lattice_gaussian_mcmc_tpu.ops.theta import log_partition_zn


def test_alias_table_matches_pmf(key):
    support, probs = exact_pmf(2.0)
    table = build_alias_table(probs)
    idx = sample_alias(key, table, shape=(200_000,))
    counts = np.bincount(np.asarray(idx), minlength=len(probs))
    emp = counts / counts.sum()
    assert 0.5 * np.abs(emp - probs).sum() < 0.02


def test_log_partition_mc_matches_closed_form(key):
    # Z^n: closed-form partition vs MC estimate
    n, sigma = 4, 2.0
    lat = identity_lattice(n, dtype=jnp.float64)
    mc = float(log_partition_mc(key, lat, sigma, n_samples=2048))
    exact = float(log_partition_zn(jnp.asarray(sigma, jnp.float64), n))
    np.testing.assert_allclose(mc, exact, rtol=1e-6)  # weights are constant


def test_log_partition_bounds(key):
    basis = np.array([[2.0, 1.0], [0.0, 2.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    sigma = 4.0
    lo, hi = log_partition_bounds(lat, sigma)
    mc = float(log_partition_mc(key, lat, sigma, n_samples=4096))
    assert float(lo) - 0.1 <= mc <= float(hi) + 1e-6


def test_rho_inverse_radius():
    r = rho_inverse_radius(2.0, 0.99, n=16)
    assert 2.0 * np.sqrt(16) < r < 4.0 * np.sqrt(16)


def test_coset_sampler(key):
    lat = identity_lattice(2, dtype=jnp.float64)
    shift = jnp.asarray([0.5, 0.25])
    pts = sample_coset(key, lat, 3.0, shift, 50_000)
    # all points lie on Z^2 + shift
    frac = np.asarray(pts) - np.floor(np.asarray(pts))
    np.testing.assert_allclose(frac[:, 0], 0.5, atol=1e-9)
    np.testing.assert_allclose(frac[:, 1], 0.25, atol=1e-9)
    # mean ~ 0 (discrete Gaussian on the coset centered at origin)
    assert np.abs(np.asarray(pts).mean(0)).max() < 0.3


def test_ellipsoidal_sampler(key):
    lat = identity_lattice(2, dtype=jnp.float64)
    Sigma = jnp.asarray([[9.0, 0.0], [0.0, 1.0]])
    pts = np.asarray(sample_ellipsoidal(key, lat, Sigma, 50_000))
    assert abs(pts[:, 0].std() - 3.0) < 0.1
    assert abs(pts[:, 1].std() - 1.0) < 0.05


def test_moments_and_mixing_bound():
    m = discrete_gaussian_moments(3.0)
    assert abs(m[1]) < 1e-9
    assert abs(m[2] - 9.0) < 0.1
    assert imhk_mixing_time_bound(0.5, 0.25) == pytest.approx(
        np.log(4.0) / 0.5)


def test_comprehensive_report(key):
    from lattice_gaussian_mcmc_tpu.diagnostics.report import (
        comprehensive_report,
    )
    from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    pre = klein_precompute(lat, 0.5)
    rep = comprehensive_report(pre, key, n_samples=1000, n_chains=2)
    assert 0 < rep["minorization_delta"] <= 1.0
    assert rep["uniform_ergodicity"]["uniformly_ergodic"]
    assert rep["ess"] > 100
    assert rep["importance_weights"]["is_ess_fraction"] > 0.5


def test_checkpoint_roundtrip(tmp_path, key):
    from lattice_gaussian_mcmc_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    state = {"coeffs": jnp.arange(12.0).reshape(3, 4),
             "log_w": jnp.asarray([1.0, 2.0, 3.0]),
             "accepted": jnp.asarray([5, 6, 7], jnp.int32)}
    save_checkpoint(str(tmp_path / "ckpt"), state, step=10)
    restored, step = restore_checkpoint(str(tmp_path / "ckpt"), state)
    assert step == 10
    for k in state:
        np.testing.assert_array_equal(np.asarray(state[k]),
                                      np.asarray(restored[k]))


def test_latex_table_and_reporting(tmp_path):
    from lattice_gaussian_mcmc_tpu.experiments.reporting import latex_table
    rows = [{"a": 1.0, "b": "x"}, {"a": 2.5, "b": "y"}]
    tex = latex_table(rows, ["a", "b"], caption="test")
    assert r"\begin{tabular}" in tex and "2.5" in tex


def test_sampling_stats():
    from lattice_gaussian_mcmc_tpu.utils.profiling import SamplingStats
    s = SamplingStats(samples_generated=100, time_elapsed=2.0, ess=50.0)
    assert s.samples_per_second == 50.0
    assert s.ess_per_second == 25.0
