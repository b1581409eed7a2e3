"""1D discrete Gaussian base samplers over Z — TPU-native building blocks.

Capability parity with the reference's exact 1D samplers
(`src/core/discrete_gaussian.py:43-439`, `src/samplers/klein.py:101-179`,
`src/samplers/utils.py:37-137`: rejection, CDT-table, per-coordinate vector
samplers), re-designed for XLA:

- The reference builds a *dynamic* per-(mu, sigma) support table with Python
  caching and draws with `np.random.choice`. On TPU every shape must be
  static, so we use a **fixed-width integer window** centered at round(mu)
  with on-the-fly logits and a Gumbel-max draw — exact on the window, and the
  window tail mass is < exp(-tau^2/2) with tau = half_width/sigma (tau >= 6
  gives < 2e-8 truncation, far below the reference's TVD<0.02 gate).
- A CDT (cumulative distribution table) path mirrors the reference's
  `CDTSampler` for *fixed* (sigma, center): table built once, vectorized
  inverse-CDF via searchsorted on uniforms.
- A rounding-rejection path mirrors `RejectionSampler`
  (`src/core/discrete_gaussian.py:59-133`): propose continuous N(mu, sigma),
  round, accept with exp(-((z-mu)^2-(y-mu)^2)/(2 sigma^2)); K fixed rounds
  with masked first-accept (no data-dependent loop under jit).

All samplers are pure functions of a PRNG key: vmap/scan/shard_map friendly.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.utils.stats import logsumexp

DEFAULT_WINDOW = 64


def window_offsets(window: int, dtype=jnp.float32) -> jax.Array:
    """Static integer offsets [-W/2, ..., W/2 - 1] around the rounded center."""
    return jnp.arange(window, dtype=dtype) - window // 2


def dgauss_logits(center, sigma, window: int = DEFAULT_WINDOW):
    """Unnormalized log-probabilities of D_{Z, sigma, center} on the window.

    Returns (support, logits): support[k] = round(center) + k - W/2,
    logits[k] = -(support[k]-center)^2 / (2 sigma^2). Broadcasts over leading
    dims of `center`/`sigma`.
    """
    center = jnp.asarray(center)
    sigma = jnp.asarray(sigma)
    base = jnp.round(center)
    offs = window_offsets(window, dtype=center.dtype)
    support = base[..., None] + offs
    z = (support - center[..., None]) / sigma[..., None]
    return support, -0.5 * z * z


def log_partition_window(center, sigma, window: int = DEFAULT_WINDOW):
    """log Z = log sum_{z in window} rho_{sigma,center}(z). This is the exact
    normalizer of the (windowed) proposal — the quantity whose product over
    coordinates is the IMHK importance weight (reference
    `src/samplers/imhk.py:102-124` computes it pointwise; here it is free)."""
    _, logits = dgauss_logits(center, sigma, window)
    return logsumexp(logits, axis=-1)


def _gumbel(key, shape, dtype):
    u = jax.random.uniform(key, shape, dtype=dtype, minval=jnp.finfo(dtype).tiny)
    return -jnp.log(-jnp.log(u))


def sample_dgauss(key, center, sigma, window: int = DEFAULT_WINDOW):
    """Draw z ~ D_{Z, sigma, center} (windowed) via Gumbel-max. Exact
    categorical sampling on the window; works for any broadcastable batch of
    (center, sigma)."""
    z, _ = sample_dgauss_with_logz(key, center, sigma, window)
    return z


def sample_dgauss_with_logz(key, center, sigma, window: int = DEFAULT_WINDOW):
    """Draw z and also return log Z of the window (both needed by Klein/IMHK).

    Returns (z, log_Z) with z a float array of integer values (kept float so
    downstream dots stay on the VPU/MXU without casts).
    """
    support, logits = dgauss_logits(center, sigma, window)
    g = _gumbel(key, logits.shape, logits.dtype)
    idx = jnp.argmax(logits + g, axis=-1)
    z = jnp.take_along_axis(support, idx[..., None], axis=-1)[..., 0]
    return z, logsumexp(logits, axis=-1)


def sample_dgauss_inverse_cdf(key, center, sigma, window: int = DEFAULT_WINDOW):
    """Inverse-CDF draw on the window (single uniform per draw; alternative to
    Gumbel-max with identical distribution, slightly cheaper RNG)."""
    z, _ = sample_dgauss_icdf_with_logz(key, center, sigma, window)
    return z


def sample_dgauss_icdf_with_logz(key, center, sigma,
                                 window: int = DEFAULT_WINDOW):
    """Inverse-CDF draw + log-normalizer. One uniform per draw (vs W gumbels
    for the Gumbel-max path) — this is the RNG-lean variant the blocked
    throughput path uses; the law is identical.

    Implementation note: instead of take_along_axis on the support we
    reconstruct z = round(center) - W/2 + idx arithmetically, which lowers to
    pure vector ops on TPU."""
    center = jnp.asarray(center)
    sigma = jnp.asarray(sigma)
    _, logits = dgauss_logits(center, sigma, window)
    m = jnp.max(logits, axis=-1)
    w = jnp.exp(logits - m[..., None])
    cdf = jnp.cumsum(w, axis=-1)
    total = cdf[..., -1]
    u = jax.random.uniform(key, jnp.broadcast_shapes(center.shape, sigma.shape),
                           dtype=logits.dtype)
    target = (u * total)[..., None]
    idx = jnp.sum((cdf < target).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, window - 1)
    z = jnp.round(center) - window // 2 + idx.astype(center.dtype)
    log_Z = m + jnp.log(total)
    return z, log_Z


# ---------------------------------------------------------------------------
# CDT sampler for fixed (sigma, center): the fast path for i.i.d. Z^n sampling
# (parity: reference CDTSampler, src/core/discrete_gaussian.py:177-316).
# ---------------------------------------------------------------------------


def build_cdt(sigma: float, center: float = 0.0, tau: float = 10.0):
    """Build a CDT on host: support and cumulative probabilities as arrays.

    Returns dict pytree {support (K,), cdf (K,)} with cdf[-1] == 1.
    """
    half = int(math.ceil(tau * float(sigma))) + 1
    base = int(round(center))
    support = np.arange(base - half, base + half + 1, dtype=np.float64)
    logits = -0.5 * ((support - center) / sigma) ** 2
    p = np.exp(logits - logits.max())
    p /= p.sum()
    cdf = np.cumsum(p)
    cdf[-1] = 1.0
    return {
        "support": jnp.asarray(support, dtype=jnp.float32),
        "cdf": jnp.asarray(cdf, dtype=jnp.float32),
    }


def sample_cdt(key, cdt, shape=()):
    """Vectorized inverse-CDF lookup: one uniform + searchsorted per draw."""
    u = jax.random.uniform(key, shape, dtype=cdt["cdf"].dtype)
    idx = jnp.searchsorted(cdt["cdf"], u, side="right")
    idx = jnp.clip(idx, 0, cdt["support"].shape[0] - 1)
    return cdt["support"][idx]


# ---------------------------------------------------------------------------
# Rounding-rejection sampler for large sigma (no table, no window):
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("rounds",))
def sample_dgauss_rejection(key, center, sigma, rounds: int = 16):
    """Rejection sampler: propose y ~ N(center, sigma) continuous, z=round(y),
    accept with prob rho(z)/rho(y) = exp(-((z-c)^2-(y-c)^2)/(2 s^2)) <= 1.

    Runs a fixed number of rounds with masked first-accept; falls back to
    round(center) if all rounds reject (probability < (1-p_acc)^rounds;
    p_acc >= ~0.92 for sigma >= 1). Matches the reference's RejectionSampler
    semantics (src/core/discrete_gaussian.py:59-133) without dynamic loops.
    """
    center = jnp.asarray(center)
    sigma = jnp.asarray(sigma)
    shape = jnp.broadcast_shapes(center.shape, sigma.shape)
    dtype = jnp.result_type(center.dtype, sigma.dtype)

    def body(carry, k):
        z_acc, done = carry
        k1, k2 = jax.random.split(k)
        y = center + sigma * jax.random.normal(k1, shape, dtype=dtype)
        z = jnp.round(y)
        log_acc = -((z - center) ** 2 - (y - center) ** 2) / (2.0 * sigma**2)
        u = jax.random.uniform(k2, shape, dtype=dtype,
                               minval=jnp.finfo(dtype).tiny)
        acc = jnp.log(u) < log_acc
        take = jnp.logical_and(acc, jnp.logical_not(done))
        z_acc = jnp.where(take, z, z_acc)
        done = jnp.logical_or(done, acc)
        return (z_acc, done), None

    keys = jax.random.split(key, rounds)
    init = (jnp.broadcast_to(jnp.round(center), shape).astype(dtype),
            jnp.zeros(shape, dtype=bool))
    (z, _), _ = jax.lax.scan(body, init, keys)
    return z


# ---------------------------------------------------------------------------
# Exact pmf (host-side, for statistical validation — parity with the
# reference's enumerated ground truth, experiments/klein_validation_suite.py).
# ---------------------------------------------------------------------------


def exact_pmf(sigma: float, center: float = 0.0, tau: float = 12.0):
    """Exact (up to tail < e^{-tau^2/2}) pmf of D_{Z,sigma,center} as numpy
    arrays (support, probs)."""
    half = int(math.ceil(tau * float(sigma))) + 2
    base = int(round(center))
    support = np.arange(base - half, base + half + 1, dtype=np.int64)
    logits = -0.5 * ((support - center) / sigma) ** 2
    p = np.exp(logits - logits.max())
    p /= p.sum()
    return support, p
