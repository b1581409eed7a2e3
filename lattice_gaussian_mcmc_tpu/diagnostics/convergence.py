"""Convergence metrics: TVD, Gelman-Rubin R-hat, Wasserstein, mixing time.

Parity: reference `src/diagnostics/convergence_diag.py` — discrete/histogram/
marginal TVD (:15-72), Gelman-Rubin (:176-213), Wasserstein-p incl. sliced
(:233-292), mixing time from TVD threshold (:295-313), batch-means variance
(:316-344); and `src/diagnostics/convergence.py` binned TVD vs target
(:47-98). All are pure jitted reductions; the mesh-aware (psum) versions
live in `parallel/collectives.py`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def tvd_discrete(samples_a, samples_b):
    """TVD between two empirical distributions over integer vectors
    (host-side; exact over observed support)."""
    a = np.asarray(samples_a).astype(np.int64)
    b = np.asarray(samples_b).astype(np.int64)
    keys_a, counts_a = np.unique(a, axis=0, return_counts=True)
    keys_b, counts_b = np.unique(b, axis=0, return_counts=True)
    da = {tuple(k): c / len(a) for k, c in zip(keys_a, counts_a)}
    db = {tuple(k): c / len(b) for k, c in zip(keys_b, counts_b)}
    keys = set(da) | set(db)
    return 0.5 * sum(abs(da.get(k, 0.0) - db.get(k, 0.0)) for k in keys)


@partial(jax.jit, static_argnames=("n_bins",))
def tvd_histogram(x, y, n_bins: int = 64, lo=None, hi=None):
    """Binned TVD between two scalar sample sets (jitted; static bin count —
    reference convergence.py:47-98 binned TVD estimate)."""
    if lo is None:
        lo = jnp.minimum(jnp.min(x), jnp.min(y))
    if hi is None:
        hi = jnp.maximum(jnp.max(x), jnp.max(y))
    edges_scale = (hi - lo) / n_bins
    ix = jnp.clip(((x - lo) / edges_scale).astype(jnp.int32), 0, n_bins - 1)
    iy = jnp.clip(((y - lo) / edges_scale).astype(jnp.int32), 0, n_bins - 1)
    hx = jnp.zeros(n_bins, x.dtype).at[ix].add(1.0) / x.shape[0]
    hy = jnp.zeros(n_bins, y.dtype).at[iy].add(1.0) / y.shape[0]
    return 0.5 * jnp.sum(jnp.abs(hx - hy))


def tvd_vs_exact(samples, support, probs):
    """TVD of integer samples vs an exact pmf on `support` (host-side;
    mass outside the support counts fully — reference klein_validation
    methodology)."""
    samples = np.asarray(samples).astype(np.int64)
    support = np.asarray(support)
    probs = np.asarray(probs)
    lo, hi = support[0], support[-1]
    inside = (samples >= lo) & (samples <= hi)
    counts = np.bincount(samples[inside] - lo, minlength=len(support))
    emp = counts / len(samples)
    tvd = 0.5 * (np.abs(emp - probs).sum() + (1 - inside.mean()))
    return float(tvd)


def kl_divergence_discrete(samples, support, probs, eps: float = 1e-12):
    """KL(empirical || exact) over the support (reference gate KL < 0.05)."""
    samples = np.asarray(samples).astype(np.int64)
    lo, hi = support[0], support[-1]
    inside = (samples >= lo) & (samples <= hi)
    counts = np.bincount(samples[inside] - lo, minlength=len(support))
    emp = counts / max(inside.sum(), 1)
    mask = emp > 0
    return float(np.sum(emp[mask] * np.log(emp[mask] / (probs[mask] + eps))))


@jax.jit
def gelman_rubin(chains):
    """Gelman-Rubin R-hat. chains: (C, T) scalar or (C, T, d) (returns per-dim
    for the latter). R-hat = sqrt(((T-1)/T W + B/T) / W)
    (reference convergence_diag.py:176-213)."""
    if chains.ndim == 2:
        chains = chains[..., None]
    C, T, d = chains.shape
    means = jnp.mean(chains, axis=1)            # (C, d)
    variances = jnp.var(chains, axis=1, ddof=1)  # (C, d)
    W = jnp.mean(variances, axis=0)
    B = T * jnp.var(means, axis=0, ddof=1)
    var_hat = (T - 1) / T * W + B / T
    rhat = jnp.sqrt(var_hat / jnp.maximum(W, 1e-300))
    return rhat.squeeze()


@jax.jit
def wasserstein_1d(x, y):
    """W1 between two equal-size 1D sample sets = mean |sorted diff|
    (reference convergence_diag.py:233-292)."""
    return jnp.mean(jnp.abs(jnp.sort(x) - jnp.sort(y)))


@partial(jax.jit, static_argnames=("n_proj",))
def sliced_wasserstein(key, X, Y, n_proj: int = 32):
    """Sliced W1 for multivariate samples: average W1 over random
    projections."""
    d = X.shape[1]
    dirs = jax.random.normal(key, (n_proj, d), dtype=X.dtype)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    px = X @ dirs.T  # (N, P)
    py = Y @ dirs.T
    w = jnp.mean(jnp.abs(jnp.sort(px, axis=0) - jnp.sort(py, axis=0)), axis=0)
    return jnp.mean(w)


def mixing_time_from_tvd(tvds, threshold: float = 0.25):
    """First time index where TVD drops (and stays) below threshold
    (reference convergence_diag.py:295-313). Host-side on a small array."""
    tvds = np.asarray(tvds)
    below = tvds < threshold
    # require staying below: suffix-and
    stay = np.logical_and.accumulate(below[::-1])[::-1]
    idx = np.argmax(stay)
    return int(idx) if stay.any() else len(tvds)


@partial(jax.jit, static_argnames=("n_batches",))
def batch_means_variance(x, n_batches: int = 32):
    """Long-run variance estimate sigma^2 = B * var(batch means)
    (reference convergence_diag.py:316-344)."""
    T = x.shape[0]
    B = T // n_batches
    xb = x[: n_batches * B].reshape(n_batches, B)
    return B * jnp.var(jnp.mean(xb, axis=1), ddof=1)


def ks_2sample(x, y):
    """Two-sample Kolmogorov-Smirnov test as a jitted sort/searchsorted
    reduction (the reference calls scipy.stats.ks_2samp at
    src/diagnostics/convergence.py:17,229 for its empirical mixing-time and
    ergodicity checks). Returns (D, p_asymptotic).

    p uses the asymptotic Kolmogorov distribution
    Q(lam) = 2 sum_k (-1)^{k-1} exp(-2 k^2 lam^2), 32 terms.
    """
    x = jnp.sort(jnp.ravel(x))
    y = jnp.sort(jnp.ravel(y))
    n, m = x.shape[0], y.shape[0]
    allv = jnp.concatenate([x, y])
    # right-continuous ECDFs evaluated at every sample point
    cdf_x = jnp.searchsorted(x, allv, side="right").astype(x.dtype) / n
    cdf_y = jnp.searchsorted(y, allv, side="right").astype(x.dtype) / m
    d = jnp.max(jnp.abs(cdf_x - cdf_y))
    en = jnp.sqrt(n * m / (n + m))
    lam = (en + 0.12 + 0.11 / en) * d  # Stephens' small-sample correction
    k = jnp.arange(1, 33, dtype=x.dtype)
    p = 2.0 * jnp.sum((-1.0) ** (k - 1) * jnp.exp(-2.0 * (k * lam) ** 2))
    # The truncated alternating series diverges from the true survival
    # function as lam -> 0 (at lam=0 every term is 1 and the even-length
    # truncation sums to 0 — the exact inversion of the true p=1). For
    # lam < 0.3 the true Q(lam) is 1 to within ~1e-9, so short-circuit.
    p = jnp.where(lam < 0.3, 1.0, p)
    return d, jnp.clip(p, 0.0, 1.0)
