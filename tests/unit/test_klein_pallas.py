"""Pallas Klein kernel vs the XLA samplers (CPU interpret mode with
host-provided uniforms; the hardware-PRNG path is exercised on real TPU by
bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
)
from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
    klein_sample_batch_pallas,
)
from lattice_gaussian_mcmc_tpu.samplers import (
    klein_precompute,
    klein_sample_batch,
)

from tests.unit.test_klein import enumerate_target, empirical_dist, tvd_dicts


def _pallas_cpu(key, pre, B, **kw):
    kw.setdefault("tile", 128)
    with pltpu.force_tpu_interpret_mode():
        return klein_sample_batch_pallas(key, pre, B, host_rng=True, **kw)


@pytest.mark.slow
def test_pallas_matches_target_2d(key):
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    sigma = 2.0
    lat = lattice_from_basis(basis, dtype=jnp.float32)
    pre = klein_precompute(lat, sigma)
    X, lw = _pallas_cpu(key, pre, 128 * 300)
    target = enumerate_target(basis, sigma, np.zeros(2), radius=15)
    assert tvd_dicts(empirical_dist(X), target) < 0.025


@pytest.mark.slow
def test_pallas_matches_xla_moments(key, rng):
    B8 = np.triu(rng.integers(-3, 4, (8, 8))).astype(float) + np.diag([4.0] * 8)
    lat = lattice_from_basis(B8, dtype=jnp.float32)
    pre = klein_precompute(lat, 8.0)
    Xp, lp = _pallas_cpu(key, pre, 128 * 100)
    Xv, lv = klein_sample_batch(jax.random.fold_in(key, 1), pre, 12800)
    np.testing.assert_allclose(np.asarray(Xp).mean(0), np.asarray(Xv).mean(0),
                               atol=0.6)
    np.testing.assert_allclose(np.asarray(Xp).std(0), np.asarray(Xv).std(0),
                               rtol=0.06)
    np.testing.assert_allclose(float(lp.mean()), float(lv.mean()), atol=0.05)


@pytest.mark.slow
def test_pallas_multiblock_rows(key):
    # n = 384 exercises the multi-block path (3 blocks of 128)
    lat = identity_lattice(384, dtype=jnp.float32)
    pre = klein_precompute(lat, 3.0)
    X, lw = _pallas_cpu(key, pre, 256)
    assert X.shape == (256, 384)
    assert abs(float(X.std()) - 3.0) < 0.05
    assert abs(float(X.mean())) < 0.05


@pytest.mark.skipif(jax.default_backend() not in ("tpu",),
                    reason="fused path uses the TPU hardware PRNG")
def test_fused_imhk_hardware_hard_regime():
    """Hard-regime validation on real TPU: sigma=0.35 half-integer centers.
    Exact values (enumeration with the kernel's own window discretization):
    Klein bias TVD 0.0096, IMHK stationary acceptance 0.9904, IMHK-12 ~ pi."""
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        imhk_steps_batch_pallas)
    import itertools
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    sigma = 0.35
    lat = lattice_from_basis(basis, dtype=jnp.float32)
    pre = klein_precompute(lat, sigma)
    B = 131072
    key = jax.random.key(11)
    X, lw = klein_sample_batch_pallas(key, pre, B, tile=4096)
    X12, _, acc = imhk_steps_batch_pallas(jax.random.fold_in(key, 1), pre,
                                          X, lw, 12, tile=4096)
    coords = list(itertools.product(range(-8, 9), repeat=2))
    pts = np.array(coords, float) @ basis.T
    logp = -0.5 * np.sum(pts**2, 1) / sigma**2
    p = np.exp(logp - logp.max())
    p /= p.sum()
    target = {tuple(map(int, c)): v for c, v in zip(coords, p)}
    assert tvd_dicts(empirical_dist(X12), target) < 0.005
    acc_rate = float(jnp.sum(acc)) / (B * 12)
    assert abs(acc_rate - 0.9904) < 0.01


@pytest.mark.skipif(jax.default_backend() not in ("tpu",),
                    reason="fused path uses the TPU hardware PRNG")
def test_trajectory_mode_hardware():
    """Trajectory-mode fused kernel on real TPU: the HBM ring must carry a
    genuine Markov-chain trajectory — final slot == final state, every kept
    slab statistically at the target (after the kernel's own burn-in), and
    acceptance counted across all steps."""
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        imhk_steps_batch_pallas,
        imhk_trajectory_pallas,
    )
    import itertools
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    sigma = 0.35
    lat = lattice_from_basis(basis, dtype=jnp.float32)
    pre = klein_precompute(lat, sigma)
    B = 8192
    key = jax.random.key(3)
    X, lw = klein_sample_batch_pallas(key, pre, B, tile=1024)
    X, lw, _ = imhk_steps_batch_pallas(jax.random.fold_in(key, 1), pre,
                                       X, lw, 12, tile=1024)  # burn-in
    Xf, lwf, acc, traj, tlw = imhk_trajectory_pallas(
        jax.random.fold_in(key, 2), pre, X, lw,
        jnp.zeros((B,), jnp.float32), n_keep=6, thin=2, tile=1024)
    assert traj.shape == (6, B, 2) and tlw.shape == (6, B)
    assert bool(jnp.all(traj[-1] == Xf))
    np.testing.assert_allclose(np.asarray(tlw[-1]), np.asarray(lwf))
    a = float(jnp.mean(acc)) / 12
    assert 0.9 < a <= 1.0  # stationary acceptance here is 0.9904
    # every kept slab is at the stationary law
    coords = list(itertools.product(range(-8, 9), repeat=2))
    pts = np.array(coords, float) @ basis.T
    logp = -0.5 * np.sum(pts**2, 1) / sigma**2
    p = np.exp(logp - logp.max())
    p /= p.sum()
    target = {tuple(map(int, c)): v for c, v in zip(coords, p)}
    for k in (0, 3, 5):
        assert tvd_dicts(empirical_dist(traj[k]), target) < 0.02


def test_babai_pallas_matches_xla(key, rng):
    """Batched Babai kernel (interpret mode) == the XLA nearest-plane."""
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        babai_decode_batch_pallas)
    from lattice_gaussian_mcmc_tpu.ops.linalg import babai_nearest_plane
    B8 = np.triu(rng.integers(-3, 4, (8, 8))).astype(float) + \
        np.diag([5.0] * 8)
    lat = lattice_from_basis(B8, dtype=jnp.float32)
    pre = klein_precompute(lat, 8.0)
    targets = jnp.asarray(rng.normal(scale=20.0, size=(256, 8)),
                          dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        Xp = babai_decode_batch_pallas(pre, targets, tile=128, interpret=True)
    Xx = jax.vmap(lambda t: babai_nearest_plane(lat.Q, lat.R, t))(
        targets.astype(lat.Q.dtype))
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(Xx), atol=1e-5)


def test_ring_mode_round0_matches_single_draw(key):
    """klein_sample_ring_pallas round 0 consumes the identical host-uniform
    rows [0, n) that klein_sample_batch_pallas's single draw does, so the
    draws must agree EXACTLY; later rounds use fresh rows and must differ."""
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        klein_sample_ring_pallas,
    )
    basis = np.array([[1.0, 0.5], [0.0, 1.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float32)
    pre = klein_precompute(lat, 2.0)
    B = 256
    with pltpu.force_tpu_interpret_mode():
        X1, lw1 = klein_sample_batch_pallas(key, pre, B, host_rng=True,
                                            tile=128)
        XR, lwR = klein_sample_ring_pallas(key, pre, B, n_rounds=3,
                                           host_rng=True, tile=128)
    assert XR.shape == (3, B, 2) and lwR.shape == (3, B)
    np.testing.assert_array_equal(np.asarray(XR[0]), np.asarray(X1))
    np.testing.assert_allclose(np.asarray(lwR[0]), np.asarray(lw1),
                               rtol=1e-6)
    assert not np.array_equal(np.asarray(XR[1]), np.asarray(XR[0]))
    # every round is a valid Klein draw: per-round first/second moments
    # (a pooled TVD at this B sits on its MC noise floor — moments have
    # far more power per sample here)
    # coeff covariance of D_{Lambda,sigma} ~ sigma^2 (B^T B)^{-1}
    target_std = 2.0 * np.sqrt(np.diag(
        np.linalg.inv(basis.T @ basis)))
    for i in range(3):
        Xi = np.asarray(XR[i], dtype=np.float64)
        se = target_std / np.sqrt(B)
        assert np.all(np.abs(Xi.mean(0)) < 5 * se), (i, Xi.mean(0))
        assert np.all(np.abs(Xi.std(0) / target_std - 1.0) < 0.12), \
            (i, Xi.std(0), target_std)


@pytest.mark.slow
def test_interleave_variant_bitwise_identical():
    """KLEIN_INTERLEAVE=1 must produce BIT-IDENTICAL draws to the default
    kernel with host randomness: the interleaved lane-halves consume
    exactly the uniform lanes the full-width rows would (subprocess —
    the flag is read at module import)."""
    import subprocess
    import sys

    code = r"""
import os
os.environ["KLEIN_INTERLEAVE"] = "%s"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu
from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
    klein_sample_batch_pallas)
lat = lattice_from_basis(np.array([[1.0, 0.5], [0.0, 1.0]]),
                         dtype=jnp.float32)
pre = klein_precompute(lat, 2.0)
with pltpu.force_tpu_interpret_mode():
    X, lw = klein_sample_batch_pallas(jax.random.key(7), pre, 256,
                                      host_rng=True, tile=256)
np.save("/tmp/interleave_%s.npy", np.asarray(X))
"""
    for flag in ("0", "1"):
        r = subprocess.run([sys.executable, "-c", code % (flag, flag)],
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
    a = np.load("/tmp/interleave_0.npy")
    b = np.load("/tmp/interleave_1.npy")
    np.testing.assert_array_equal(a, b)
