"""MCMC chain metrics — jitted reductions.

Parity: reference `src/diagnostics/mcmc_diag.py` — ACF (:12-33), integrated
autocorrelation time with Sokal windowing (:36-56), ESS autocorr/batch-means,
multivariate = min over dims (:59-104), acceptance rate (:107-117), jump
distances (:120-136), `diagnose_chain` (:139-210), MCSE (:213-247).

TPU redesign: ACF via FFT (the reference's convergence_diag.py:75-112 FFT
path), Sokal's adaptive window realized with static shapes via a masked
cumulative-sum + argmax trick (no data-dependent loop bounds under jit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_lag",))
def autocorrelation(x, max_lag: int = 256):
    """Normalized ACF of a scalar chain x (T,) up to max_lag via FFT."""
    T = x.shape[0]
    xc = x - jnp.mean(x)
    nfft = 2 * T  # zero-pad to avoid circular wrap
    f = jnp.fft.rfft(xc, n=nfft)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft)[:T] / T
    acf = acov / jnp.maximum(acov[0], jnp.finfo(x.dtype).tiny)
    return acf[: max_lag + 1]


@partial(jax.jit, static_argnames=("max_lag",))
def pooled_acf(ring, max_lag: int = 24):
    """Cross-chain pooled ACF of a (T, B) trajectory ring, ON DEVICE.

    Chains are centered per-chain over time; lag-l autocovariance pools the
    products over every chain and admissible time pair. Designed for the
    fused trajectory kernel's HBM ring: the (T, B) array never leaves the
    device — only the (max_lag,) ACF crosses the host link, which on the
    tunneled single-chip setup is ~10 MB/s and would otherwise dominate the
    whole trajectory dispatch (results/kernel_profile/trajectory_breakdown
    .json quantifies this). Parity: same estimator as the host-side loop
    the r3 bench used (reference mcmc_diag.py:12-33 pooled over chains).
    """
    T = ring.shape[0]
    xc = ring - jnp.mean(ring, axis=0, keepdims=True)
    num = [jnp.mean(xc * xc)]
    for lag in range(1, max_lag):
        num.append(jnp.mean(xc[: T - lag] * xc[lag:]))
    num = jnp.stack(num)
    return num / jnp.maximum(num[0], jnp.finfo(ring.dtype).tiny)


@partial(jax.jit, static_argnames=("max_lag", "c"))
def integrated_autocorr_time(x, max_lag: int = 256, c: float = 5.0):
    """tau_int with Sokal's automatic windowing: tau(W) = 1 + 2 sum_{t<=W}
    acf(t), window W = smallest W with W >= c * tau(W). Static-shape
    implementation: compute tau(W) for all W, take the first admissible one.
    """
    acf = autocorrelation(x, max_lag)
    L = acf.shape[0] - 1  # may be < max_lag for short chains
    cumsum = jnp.cumsum(acf[1:])
    w = jnp.arange(1, L + 1, dtype=x.dtype)
    taus = 1.0 + 2.0 * cumsum
    admissible = w >= c * taus
    # first admissible index; if none, use max_lag
    idx = jnp.argmax(admissible)
    found = jnp.any(admissible)
    tau = jnp.where(found, taus[idx], taus[-1])
    return jnp.maximum(tau, 1.0)


@partial(jax.jit, static_argnames=("max_lag",))
def effective_sample_size(x, max_lag: int = 256):
    """ESS = T / tau_int for a scalar chain; for multivariate input (T, d)
    returns the minimum over dimensions (reference mcmc_diag.py:59-104)."""
    if x.ndim == 1:
        return x.shape[0] / integrated_autocorr_time(x, max_lag)
    ess_d = jax.vmap(lambda col: x.shape[0] /
                     integrated_autocorr_time(col, max_lag),
                     in_axes=1)(x)
    return jnp.min(ess_d)


@partial(jax.jit, static_argnames=("n_batches",))
def ess_batch_means(x, n_batches: int = 32):
    """Batch-means ESS: T * var(batch means within) ... classic estimator
    ESS = T * sigma^2_hat / sigma^2_bm where sigma^2_bm = B * var(means)."""
    T = x.shape[0]
    B = T // n_batches
    xb = x[: n_batches * B].reshape(n_batches, B)
    means = jnp.mean(xb, axis=1)
    var_bm = B * jnp.var(means, ddof=1)
    var_x = jnp.var(x, ddof=1)
    return T * var_x / jnp.maximum(var_bm, jnp.finfo(x.dtype).tiny)


def acceptance_rate(accepted, total):
    return jnp.asarray(accepted, jnp.float32) / jnp.maximum(
        jnp.asarray(total, jnp.float32), 1.0)


@jax.jit
def jump_distances(chain):
    """Mean/std of consecutive jump norms (reference mcmc_diag.py:120-136).
    chain: (T, d)."""
    d = jnp.linalg.norm(jnp.diff(chain, axis=0), axis=-1)
    return {"mean_jump": jnp.mean(d), "std_jump": jnp.std(d),
            "frac_zero": jnp.mean(d == 0.0)}


@partial(jax.jit, static_argnames=("n_batches",))
def mcse(x, n_batches: int = 32):
    """Monte-Carlo standard error via batch means
    (reference mcmc_diag.py:213-247)."""
    T = x.shape[0]
    B = T // n_batches
    xb = x[: n_batches * B].reshape(n_batches, B)
    means = jnp.mean(xb, axis=1)
    return jnp.sqrt(B * jnp.var(means, ddof=1) / T)


def diagnose_chain(chain, max_lag: int = 256):
    """Summary dict for one chain (T, d) (reference mcmc_diag.py:139-210)."""
    chain = jnp.asarray(chain)
    ess = effective_sample_size(chain, max_lag)
    jumps = jump_distances(chain)
    return {
        "n_samples": chain.shape[0],
        "ess_min": ess,
        "ess_per_sample": ess / chain.shape[0],
        "tau_int_max": chain.shape[0] / jnp.maximum(ess, 1e-12),
        "mean": jnp.mean(chain, axis=0),
        "std": jnp.std(chain, axis=0),
        **jumps,
    }


@jax.jit
def mcse_spectral(x):
    """Spectral-density-at-zero MCSE (reference mcmc_diag.py:213-247
    'spectral' variant): sigma^2 = S(0) estimated by averaging the
    periodogram over the lowest nonzero frequencies."""
    T = x.shape[0]
    xc = x - jnp.mean(x)
    f = jnp.fft.rfft(xc)
    psd = (jnp.abs(f) ** 2) / T
    k = jnp.maximum(T // 50, 2)
    mask = (jnp.arange(psd.shape[0]) >= 1) & (jnp.arange(psd.shape[0]) <= k)
    s0 = jnp.sum(jnp.where(mask, psd, 0.0)) / jnp.maximum(
        jnp.sum(mask.astype(psd.dtype)), 1.0)
    return jnp.sqrt(s0 / T)
