"""Discrete-Gaussian math utilities.

Parity: reference `src/samplers/utils.py` (C8, DiscreteGaussianUtils) —
1D samplers incl. Walker alias table (:37-137), Jacobi/Riemann theta
(:141-242 — see ops/theta.py), partition function Z_Lambda(sigma) via
theta / MC importance / bounds (:246-324), smoothing parameter (:374-401),
empirical TVD between sample sets (:403-431 — see diagnostics/convergence),
rho-inverse radius search (:443-477), coset sampler D_{Lambda+c} (:495-530),
ellipsoidal Gaussian via Cholesky (:532-556), moments & IMHK mixing-time
bound (:600-660).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice
from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import (
    DEFAULT_WINDOW,
    sample_dgauss,
)
from lattice_gaussian_mcmc_tpu.ops.theta import log_rho_Z
from lattice_gaussian_mcmc_tpu.samplers.klein import (
    klein_precompute,
    klein_sample_batch,
)
from lattice_gaussian_mcmc_tpu.utils.stats import logmeanexp


# --- Walker alias table (reference :37-137) --------------------------------


def build_alias_table(probs: np.ndarray) -> Dict[str, jnp.ndarray]:
    """O(K) alias-table construction (host); sampling is two table lookups
    + one uniform + one bernoulli — O(1) per draw, vectorizes trivially."""
    p = np.asarray(probs, dtype=np.float64)
    K = len(p)
    p = p / p.sum() * K
    alias = np.zeros(K, dtype=np.int32)
    prob = np.ones(K)
    small = [i for i in range(K) if p[i] < 1.0]
    large = [i for i in range(K) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0
    return {"prob": jnp.asarray(prob, jnp.float32),
            "alias": jnp.asarray(alias, jnp.int32)}


def sample_alias(key, table, shape=()):
    """Vectorized alias-table draw; returns indices into the original
    support."""
    K = table["prob"].shape[0]
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, shape, 0, K)
    u = jax.random.uniform(k2, shape)
    use_alias = u >= table["prob"][idx]
    return jnp.where(use_alias, table["alias"][idx], idx)


# --- partition function (reference :246-324) --------------------------------


def log_partition_mc(key, lattice: Lattice, sigma, n_samples: int = 4096,
                     window: int = DEFAULT_WINDOW):
    """Monte-Carlo importance estimate of log rho_sigma(Lambda): Klein
    proposals' mean importance weight is exactly rho_sigma(Lambda)
    (E_q[pi~/q] = Z). Self-normalizing and free given the Klein scan."""
    pre = klein_precompute(lattice, sigma, window=window)
    _, lw = klein_sample_batch(key, pre, n_samples)
    return logmeanexp(lw)


def log_partition_bounds(lattice: Lattice, sigma):
    """Analytic bracket: prod_i rho_{sigma/||b*_i||}(Z) upper-bounds
    rho_sigma(Lambda) (Klein normalizers at worst-case centers); the
    continuous-Gaussian volume term gives the lower bound
    (2 pi sigma^2)^{n/2} / det(Lambda) * (1 - eps)."""
    r = lattice.gs_norms
    upper = jnp.sum(log_rho_Z(jnp.asarray(sigma) / r))
    n = lattice.n
    lower = (n / 2) * jnp.log(2 * math.pi * jnp.asarray(sigma) ** 2) - \
        lattice.log_det
    return lower, upper


# --- rho-inverse radius search (reference :443-477) -------------------------


def rho_inverse_radius(sigma: float, target_mass: float, n: int,
                       max_radius: float = 1e6) -> float:
    """Smallest radius R with P(||x|| <= R) >= target_mass for x ~ continuous
    N(0, sigma^2 I_n) (chi distribution quantile via bisection; the reference
    uses the same continuous surrogate)."""
    from scipy.stats import chi
    return float(chi.ppf(target_mass, df=n, scale=sigma))


# --- coset + ellipsoidal samplers (reference :495-530, :532-556) ------------


def sample_coset(key, lattice: Lattice, sigma, coset_shift, num_samples: int,
                 window: Optional[int] = None):
    """Sample D_{Lambda + c, sigma}: points x in Lambda + c with probability
    ~ rho_sigma(x). Implemented as Klein centered at -c, then shifting:
    if y ~ D_{Lambda, sigma, -c} then y + c ~ D_{Lambda+c, sigma}."""
    c = jnp.asarray(coset_shift, dtype=lattice.basis.dtype)
    pre = klein_precompute(lattice, sigma, center=-c, window=window)
    coeffs, _ = klein_sample_batch(key, pre, num_samples)
    return coeffs @ lattice.basis.T + c


def sample_ellipsoidal(key, lattice: Lattice, Sigma, num_samples: int,
                       window: Optional[int] = None):
    """Ellipsoidal discrete Gaussian ~ exp(-1/2 x^T Sigma^{-1} x) on Lambda:
    transform by L = chol(Sigma), sample spherical D on the transformed
    lattice L^{-1} B, map back (reference :532-556)."""
    from lattice_gaussian_mcmc_tpu.lattices.base import lattice_from_basis
    L = jnp.linalg.cholesky(jnp.asarray(Sigma, dtype=lattice.basis.dtype))
    Bt = jnp.linalg.solve(L, lattice.basis)
    lat_t = lattice_from_basis(Bt, name=lattice.name + "-ellip")
    pre = klein_precompute(lat_t, 1.0, window=window)
    coeffs, _ = klein_sample_batch(key, pre, num_samples)
    return coeffs @ lattice.basis.T  # same integer coeffs, original basis


# --- moments & mixing bound (reference :600-660) ----------------------------


def discrete_gaussian_moments(sigma, order: int = 2,
                              window: int = 4 * DEFAULT_WINDOW):
    """Exact first moments of D_{Z,sigma} by summation."""
    k = jnp.arange(-window, window + 1, dtype=jnp.float64)
    w = jnp.exp(-0.5 * (k / sigma) ** 2)
    w = w / jnp.sum(w)
    return {m: float(jnp.sum(w * k**m)) for m in range(1, order + 1)}


def imhk_mixing_time_bound(delta: float, eps: float = 0.25) -> float:
    """t_mix(eps) <= ln(1/eps)/delta (Wang-Ling exponential ergodicity)."""
    return math.log(1.0 / eps) / max(delta, 1e-300)
