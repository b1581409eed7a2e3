"""Fused SMK Pallas kernel correctness (CPU, plain `interpret=True`).

Two layers of validation, mirroring how the IMHK kernel was proven
(tests/unit/test_klein_pallas.py):

1. *MH-ratio math*: debug mode exposes the proposal and every component of
   the acceptance ratio (forward/reverse log-normalizer sums, target
   quadratics). Each is recomputed independently with the XLA Klein
   density/weight functions (`klein_log_density`, recentered precomps) —
   this checks the kernel's recentered-coordinate identities
   (ops/kernels/smk_pallas.py docstring) against the straightforward
   formulation of `smk_step` (samplers/imhk.py:117-162; reference MH
   semantics src/samplers/imhk.py:141-177).
2. *Stationarity*: chains started at EXACT target samples (host
   enumeration) must remain target-distributed after fused SMK steps —
   invariance of pi under the kernel's transition, smooth and hard regime.

NOTE: plain `interpret=True` (not `pltpu.force_tpu_interpret_mode`) —
the force context does not honor `input_output_aliases`, so the aliased
chain-state buffer would start as a NaN canary.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
from lattice_gaussian_mcmc_tpu.ops.kernels.smk_pallas import (
    smk_steps_batch_pallas,
)
from lattice_gaussian_mcmc_tpu.samplers.klein import (
    klein_log_density,
    klein_precompute,
)

from tests.unit.test_klein import empirical_dist, enumerate_target, tvd_dicts

BASIS_2D = np.array([[1.0, 0.5], [0.0, 1.0]])


def _target_start(rng, basis, sigma, B, radius=15):
    """Exact D_{Lambda,sigma} coefficient samples by host enumeration."""
    target = enumerate_target(basis, sigma, np.zeros(basis.shape[0]), radius)
    coords = np.array(list(target.keys()), dtype=np.float64)
    probs = np.array(list(target.values()))
    idx = rng.choice(len(coords), size=B, p=probs)
    return jnp.asarray(coords[idx], dtype=jnp.float32), target


def _xla_log_alpha(lat, pre_t, sigma_prop, window, X, P):
    """log alpha for current coeffs X (B, n) and proposals P, straight from
    the XLA Klein density (the smk_step formulation, samplers/imhk.py)."""
    r_diag = jnp.diagonal(lat.R)
    sigmas_prop = jnp.asarray(sigma_prop, lat.R.dtype) / r_diag
    pre_p = pre_t.replace(sigmas=sigmas_prop, window=window)
    hp = jax.lax.Precision.HIGHEST

    def one(x, y):
        cs_x = jnp.dot(lat.Q.T, jnp.dot(pre_t.basis, x, precision=hp),
                       precision=hp) / r_diag
        cs_y = jnp.dot(lat.Q.T, jnp.dot(pre_t.basis, y, precision=hp),
                       precision=hp) / r_diag
        log_q_y_x = klein_log_density(y, pre_p.replace(cs=cs_x))
        log_q_x_y = klein_log_density(x, pre_p.replace(cs=cs_y))

        def log_pi(z):
            resid = (jnp.dot(pre_t.U, z, precision=hp) - pre_t.cs) * r_diag
            return -0.5 * jnp.sum(resid * resid) / (pre_t.sigma ** 2)

        return log_pi(y) - log_pi(x) + log_q_x_y - log_q_y_x

    return jax.vmap(one)(X.astype(lat.R.dtype), P.astype(lat.R.dtype))


def test_smk_debug_components_match_xla(key, rng):
    """Kernel MH components == XLA smk_step math on a 4D basis with
    non-trivial couplings and a non-zero start state."""
    B4 = np.triu(rng.integers(-2, 3, (4, 4))).astype(float) + np.diag(
        [3.0, 4.0, 3.0, 5.0])
    lat = lattice_from_basis(B4, dtype=jnp.float32)
    sigma_t, sigma_prop = 6.0, 2.5
    pre = klein_precompute(lat, sigma_t)
    X0 = jnp.asarray(rng.integers(-2, 3, (128, 4)), dtype=jnp.float32)
    _, acc, dbg = smk_steps_batch_pallas(
        key, pre, X0, n_steps=1, sigma_prop=sigma_prop, tile=128,
        interpret=True, host_rng=True, debug=True)
    # recover the kernel's actual window from the helper it uses
    from lattice_gaussian_mcmc_tpu.samplers.klein import suggest_window
    window = suggest_window(float(jnp.max(pre.sigmas * (sigma_prop /
                                                        sigma_t))))
    P = jnp.asarray(dbg["p"], jnp.float32)
    la_ref = _xla_log_alpha(lat, pre, sigma_prop, window, X0, P)
    la_ker = jnp.asarray(dbg["log_alpha"])
    np.testing.assert_allclose(np.asarray(la_ker), np.asarray(la_ref),
                               atol=5e-3)
    # target quadratics: qn = -log pi(y), qc = -log pi(x) (up to the
    # constant-free form) — check their difference too
    hp = jax.lax.Precision.HIGHEST
    r_diag = jnp.diagonal(lat.R)

    def neg_log_pi(z):
        resid = (jnp.dot(pre.U, z.astype(lat.R.dtype), precision=hp)
                 - pre.cs) * r_diag
        return 0.5 * jnp.sum(resid * resid) / (pre.sigma ** 2)

    qn_ref = jax.vmap(neg_log_pi)(P)
    qc_ref = jax.vmap(neg_log_pi)(X0)
    np.testing.assert_allclose(np.asarray(dbg["qn"]), np.asarray(qn_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dbg["qc"]), np.asarray(qc_ref),
                               rtol=1e-4, atol=1e-3)
    # acceptance counter consistent with the replayed decisions: acc in
    # [0, 1] per chain after one step
    assert float(jnp.max(acc)) <= 1.0 and float(jnp.min(acc)) >= 0.0


@pytest.mark.slow
def test_smk_stationarity_2d_smooth(key, rng):
    """pi is invariant under the fused SMK transition (smooth regime)."""
    sigma = 2.0
    lat = lattice_from_basis(BASIS_2D, dtype=jnp.float32)
    pre = klein_precompute(lat, sigma)
    B = 12800
    X0, target = _target_start(rng, BASIS_2D, sigma, B)
    Xs, acc = smk_steps_batch_pallas(key, pre, X0, n_steps=3,
                                     sigma_prop=1.5, tile=3200,
                                     interpret=True, host_rng=True)
    # sample-size-aware gate: the start batch IS target-distributed, so its
    # empirical TVD is the MC noise floor for this B; invariance means the
    # post-step TVD stays at that floor.
    tvd0 = tvd_dicts(empirical_dist(X0), target)
    tvd3 = tvd_dicts(empirical_dist(Xs), target)
    assert tvd3 < tvd0 + 0.01, (tvd0, tvd3)
    acc_rate = float(jnp.mean(acc)) / 3
    assert 0.2 < acc_rate < 1.0


@pytest.mark.slow
def test_smk_stationarity_2d_hard(key, rng):
    """Invariance in the hard regime (sigma below smoothing, half-integer
    structure exercised; window small, delta terms large)."""
    sigma = 0.6
    lat = lattice_from_basis(BASIS_2D, dtype=jnp.float32)
    pre = klein_precompute(lat, sigma)
    B = 12800
    X0, target = _target_start(rng, BASIS_2D, sigma, B, radius=8)
    Xs, acc = smk_steps_batch_pallas(key, pre, X0, n_steps=3,
                                     sigma_prop=0.6, tile=3200,
                                     interpret=True, host_rng=True)
    tvd0 = tvd_dicts(empirical_dist(X0), target)
    tvd3 = tvd_dicts(empirical_dist(Xs), target)
    assert tvd3 < tvd0 + 0.01, (tvd0, tvd3)
    acc_rate = float(jnp.mean(acc)) / 3
    assert 0.05 < acc_rate < 1.0


@pytest.mark.slow
def test_smk_converges_from_far_start(key, rng):
    """Chains started far from the target reach it: the local random-walk
    move actually mixes on a small lattice."""
    sigma = 1.5
    lat = lattice_from_basis(BASIS_2D, dtype=jnp.float32)
    pre = klein_precompute(lat, sigma)
    B = 12800
    X0 = jnp.full((B, 2), 6.0, jnp.float32)  # point (9, 6): ~7 sigma out
    target = enumerate_target(BASIS_2D, sigma, np.zeros(2), 15)
    # diffusive relaxation needs ~(dist/sigma_prop)^2 ~ 25 steps; run 48
    Xs, acc = smk_steps_batch_pallas(key, pre, X0, n_steps=48,
                                     sigma_prop=1.5, tile=12800,
                                     interpret=True, host_rng=True)
    # MC noise floor for B=12800 over ~80 support points is ~0.03
    assert tvd_dicts(empirical_dist(Xs), target) < 0.06


def test_smk_pallas_call_has_no_input_output_aliases():
    """Structural pin of the r4 DMA-race fix (smk_pallas.py ~line 252): the
    SMK chain state must flow through a REGULAR input window into scratch,
    never through input_output_aliases — an aliased window read as the
    kernel's first operation races its own input DMA on multi-program
    grids, a hardware-only failure interpret mode CANNOT catch. This test
    fails any refactor that reintroduces aliasing; the behavioral gate is
    the hardware validate_smk path (scripts/validate_pallas_scale.py)."""
    import ast
    import inspect

    from lattice_gaussian_mcmc_tpu.ops.kernels import smk_pallas

    tree = ast.parse(inspect.getsource(smk_pallas))
    calls = [node for node in ast.walk(tree)
             if isinstance(node, ast.Call)
             and isinstance(node.func, ast.Attribute)
             and node.func.attr == "pallas_call"]
    assert calls, "expected at least one pl.pallas_call in smk_pallas"
    for call in calls:
        kw_names = {kw.arg for kw in call.keywords}
        assert "input_output_aliases" not in kw_names, (
            "SMK pallas_call reintroduced input_output_aliases — this "
            "races the state window's input DMA on multi-program grids "
            "(hardware only); keep the state in scratch loaded from a "
            "regular input window")
