"""Spectral-gap analysis of the IMHK chain.

Parity: reference `src/diagnostics/spectral.py` — theoretical gap delta
(Wang-Ling Lemma 1: delta = rho_{sigma,c}(Lambda) / prod_i rho_{sigma_i}(Z),
:42-84), empirical transition matrix via k-means state discretization
(:111-170), eigen-gap gamma = 1 - |lambda_2| (:172-219), mixing-time bounds
(:312-351), rejection-sampler spectrum / optimal omega (:419-482).

TPU redesign: the MC estimate uses the free Klein log-weights
(delta_hat = mean w / max w — self-normalizing, no explicit partition
function); k-means is a jitted Lloyd iteration instead of sklearn.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.ops.theta import log_rho_Z
from lattice_gaussian_mcmc_tpu.utils.stats import logmeanexp


@jax.jit
def spectral_gap_mc(log_ws):
    """delta >= 1/max_x w(x); self-normalizing MC estimate from Klein
    log-weights: delta_hat = exp(logmeanexp(lw) - max(lw)) (reference
    imhk.py:252-284 computes the same bound with explicit weights)."""
    lw = jnp.ravel(log_ws)
    return jnp.exp(logmeanexp(lw) - jnp.max(lw))


def spectral_gap_theoretical(log_ws, sigmas):
    """Wang-Ling Lemma 1: delta = rho_{sigma,c}(Lambda) / prod_i
    rho_{sigma_i}(Z). The numerator is estimated by the self-normalized mean
    of the Klein weights (E_q[pi~/q] = rho(Lambda)); the denominator is the
    exact product of 1D partition functions at worst-case (integer) centers.
    """
    lw = jnp.ravel(log_ws)
    log_rho_lambda = logmeanexp(lw)  # E_q[prod Z_i(c_i)] = rho_sigma(Lambda)
    log_denom = jnp.sum(log_rho_Z(sigmas))
    return jnp.exp(log_rho_lambda - log_denom)


def mixing_time_bounds(delta, eps: float = 0.25):
    """t_mix(eps) bounds from exponential ergodicity: upper -ln(eps)/delta,
    lower ~ (1/delta - 1) * ln(1/(2 eps)) (reference spectral.py:312-351)."""
    d = float(delta)
    if d <= 0:
        return {"lower": float("inf"), "upper": float("inf")}
    upper = -math.log(eps) / d
    lower = max(0.0, (1.0 / d - 1.0) * math.log(1.0 / (2 * eps)))
    return {"lower": lower, "upper": upper}


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_discretize(key, X, k: int = 16, iters: int = 25):
    """Jitted Lloyd's k-means (replaces sklearn KMeans,
    reference spectral.py:162-170). Returns (labels, centers)."""
    n = X.shape[0]
    idx = jax.random.choice(key, n, (k,), replace=False)
    centers = X[idx]

    def body(_, centers):
        d2 = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=X.dtype)
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ X
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        keep = (counts > 0)[:, None]
        return jnp.where(keep, new_centers, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    d2 = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return jnp.argmin(d2, axis=1), centers


@partial(jax.jit, static_argnames=("k",))
def _transition_matrix(labels, k: int):
    """Row-normalized empirical transition counts from a label chain (T,)."""
    src = labels[:-1]
    dst = labels[1:]
    P = jnp.zeros((k, k)).at[src, dst].add(1.0)
    row = jnp.sum(P, axis=1, keepdims=True)
    return P / jnp.maximum(row, 1.0)


def empirical_transition_gap(key, chain, k: int = 16):
    """Empirical spectral gap: discretize states with k-means, build the
    transition matrix, gamma = 1 - |lambda_2| (reference spectral.py:111-219).
    Host-side eigenvalues (tiny k x k matrix)."""
    chain = jnp.asarray(chain)
    if chain.ndim == 1:
        chain = chain[:, None]
    labels, _ = kmeans_discretize(key, chain, k=k)
    P = np.asarray(_transition_matrix(labels, k))
    eigs = np.linalg.eigvals(P)
    mags = np.sort(np.abs(eigs))[::-1]
    lam2 = mags[1] if len(mags) > 1 else 0.0
    return float(1.0 - lam2)


def rejection_spectrum(omega: float):
    """Lemma 4 (Wang-Ling): the independent rejection sampler's transition
    operator has eigenvalues {1, 1 - 1/omega} (reference spectral.py:419-449).
    """
    return np.array([1.0, 1.0 - 1.0 / omega])


def optimal_omega(log_ws) -> float:
    """omega_0 = max_x w(x) (self-normalized; reference spectral.py:451-482).
    """
    lw = np.ravel(np.asarray(log_ws))
    return float(np.exp(lw.max() - (np.logaddexp.reduce(lw) - math.log(lw.size))))


def transition_decomposition(log_ws):
    """P = G + e q^T decomposition of the IMHK kernel (Wang-Ling eq. 18,
    reference spectral.py:221-271): with normalized weights w_i, the kernel
    splits into an off-diagonal part G and a rank-one jump component whose
    row q has q_j = pi_j * min(1, w_j / w_i)-style acceptance mass. Returns
    summary statistics of the decomposition computed over the sampled
    states: the rank-one mass fraction (average total acceptance probability
    into fresh proposals) and the diagonal (rejection) mass."""
    lw = jnp.ravel(jnp.asarray(log_ws))
    m = jnp.max(lw)
    w = jnp.exp(lw - m)  # relative weights
    # acceptance of a proposal j from state i: min(1, w_j / w_i).
    # Averaging over i ~ empirical pi and j ~ q estimates the jump mass.
    wi = w[:, None]
    wj = w[None, :]
    acc = jnp.minimum(1.0, wj / wi)
    jump_mass = float(jnp.mean(acc))
    return {
        "jump_mass": jump_mass,
        "rejection_mass": 1.0 - jump_mass,
        "max_weight_ratio": float(jnp.max(w) / jnp.mean(w)),
    }


def triangular_structure_analysis(P):
    """Structure metrics of an empirical transition matrix (reference
    spectral.py:273-310): mass above/below the diagonal and diagonal
    dominance — IMHK kernels are nearly 'triangular' when ordered by
    importance weight."""
    P = np.asarray(P)
    k = P.shape[0]
    upper = float(np.triu(P, 1).sum() / k)
    lower = float(np.tril(P, -1).sum() / k)
    diag = float(np.diag(P).sum() / k)
    return {"upper_mass": upper, "lower_mass": lower, "diagonal_mass": diag,
            "asymmetry": upper - lower}
