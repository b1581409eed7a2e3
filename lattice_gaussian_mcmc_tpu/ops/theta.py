"""Theta / partition-function helpers in pure JAX.

Parity targets: the reference's Jacobi theta_3 with modular transform
(`src/samplers/utils.py:141-206`), identity-lattice closed forms
(`src/lattices/identity.py:127-175`), and partition-function utilities
(`src/samplers/utils.py:246-324`). The reference computes these through Sage
special functions on the host; here they are fixed-term series that jit and
fuse on device — for sigma in the practical range both series converge to
float64 accuracy in << 32 terms.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_N_TERMS = 32


def log_rho_Z(sigma, center=0.0):
    """log rho_{sigma,c}(Z) = log sum_{k in Z} exp(-(k-c)^2 / (2 sigma^2)).

    Uses the direct series for small sigma and the Poisson-summation (modular
    transform) series rho = sigma*sqrt(2 pi) * (1 + 2 sum_j e^{-2 pi^2 s^2 j^2}
    cos(2 pi j c)) for sigma >= 1, selected elementwise.
    """
    sigma = jnp.asarray(sigma)
    center = jnp.broadcast_to(jnp.asarray(center, dtype=sigma.dtype), sigma.shape)
    frac = center - jnp.round(center)  # rho over Z is invariant to integer shifts
    k = jnp.arange(-_N_TERMS, _N_TERMS + 1, dtype=sigma.dtype)
    # direct: sum over integers near the (fractional) center
    z = (k - frac[..., None]) / sigma[..., None]
    direct = jnp.sum(jnp.exp(-0.5 * z * z), axis=-1)
    # Poisson: converges fast for sigma >~ 0.8
    j = jnp.arange(1, 6, dtype=sigma.dtype)
    fourier = 1.0 + 2.0 * jnp.sum(
        jnp.exp(-2.0 * math.pi**2 * (sigma[..., None] * j) ** 2)
        * jnp.cos(2.0 * math.pi * j * frac[..., None]),
        axis=-1,
    )
    poisson = sigma * math.sqrt(2.0 * math.pi) * fourier
    val = jnp.where(sigma < 1.0, direct, poisson)
    return jnp.log(val)


def rho_Z(sigma, center=0.0):
    return jnp.exp(log_rho_Z(sigma, center))


def jacobi_theta3(z, q):
    """theta_3(z, q) = 1 + 2 sum_{k>=1} q^{k^2} cos(2 k z), real nome
    0 < q < 1 (parity: reference utils.py:141-206; the modular transform for
    q -> 1 is provided by `log_rho_Z`'s Poisson branch since
    rho_{sigma,c}(Z) = theta_3(pi c, e^{-1/(2 sigma^2)}))."""
    z = jnp.asarray(z)
    q = jnp.asarray(q)
    k = jnp.arange(1, _N_TERMS + 1, dtype=jnp.result_type(z.dtype, q.dtype))
    terms = q[..., None] ** (k * k) * jnp.cos(2.0 * k * z[..., None])
    return 1.0 + 2.0 * jnp.sum(terms, axis=-1)


def smoothing_parameter_zn(n: int, eps: float = 0.01) -> float:
    """eta_eps(Z^n) = sqrt(ln(2n(1+1/eps)) / pi) — closed form
    (reference src/lattices/identity.py:127-142)."""
    return math.sqrt(math.log(2 * n * (1 + 1 / eps)) / math.pi)


def log_partition_zn(sigma, n: int, center=None):
    """log of the Z^n partition function Z = prod_i rho_{sigma}(Z - c_i)
    (reference identity.py:144-175 computes the same product via theta_3)."""
    if center is None:
        return n * log_rho_Z(sigma)
    return jnp.sum(log_rho_Z(jnp.broadcast_to(sigma, (n,)), center))


def smoothing_parameter_generic(gs_norms, n: int, eps: float = 0.01):
    """eta_eps upper bound for a general lattice via the dual first-minimum
    bound eta_eps(L) <= sqrt(ln(2n(1+1/eps))/pi) / lambda_1(L*), with
    lambda_1(L*) >= 1/max_i ||b*_i|| (reference src/lattices/base.py:171-192
    uses the same bound through the dual Gaussian heuristic)."""
    lam1_dual_lb = 1.0 / jnp.max(gs_norms)
    return smoothing_parameter_zn(n, eps) / lam1_dual_lb


def log_riemann_theta(basis, sigma, center=None, radius: int = 4):
    """log Theta_Lambda(sigma, c) = log sum_{x in Lambda} rho_{sigma,c}(x),
    evaluated by enumerating coefficient vectors in [-radius, radius]^n
    (parity: reference src/samplers/utils.py:208-242, which enumerates the
    same box through numpy on host). Exact for sigma small relative to the
    basis; the box must cover ~6 sigma / min||b*_i|| for full accuracy.

    The enumeration is materialized as one ((2r+1)^n, n) coefficient matrix
    and reduced with a single matmul + logsumexp on device — practical for
    n <= 8 (the same practical limit as the reference's version).
    """
    import numpy as np
    from jax.scipy.special import logsumexp

    B = jnp.asarray(basis)
    n = B.shape[0]
    if (2 * radius + 1) ** n > 20_000_000:
        raise ValueError(f"enumeration box (2*{radius}+1)^{n} too large")
    grids = np.meshgrid(*([np.arange(-radius, radius + 1)] * n),
                        indexing="ij")
    coeffs = jnp.asarray(
        np.stack([g.ravel() for g in grids], axis=-1), dtype=B.dtype)
    # Repo convention: a lattice point is B @ x (columns of B are basis
    # vectors, matching `klein_points`); for row-stacked coefficient vectors
    # that is coeffs @ B.T, NOT coeffs @ B (which would enumerate B^T's
    # lattice — wrong for non-symmetric bases).
    pts = coeffs @ B.T  # ((2r+1)^n, n) lattice points
    if center is not None:
        pts = pts - jnp.asarray(center, dtype=B.dtype)
    sq = jnp.sum(pts * pts, axis=-1)
    return logsumexp(-0.5 * sq / (jnp.asarray(sigma, B.dtype) ** 2))


def riemann_theta(basis, sigma, center=None, radius: int = 4):
    return jnp.exp(log_riemann_theta(basis, sigma, center, radius))
