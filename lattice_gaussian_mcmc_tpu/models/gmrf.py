"""Gaussian Markov random field: precision-form Gaussian on a grid.

Parity: reference `src/models/gmrf.py:10-85` (precision builder) +
`src/core/gaussian.py:8-72` (log density / gradient of
p(x) ~ exp(-1/2 x^T Q x + b^T x)) — functional here because the grid
adjacency actually exists (models/grid.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.models.grid import grid_adjacency


def gmrf_precision(shape, tau: float = 1.0, kappa: float = 0.1,
                   periodic: bool = False) -> jnp.ndarray:
    """Q = tau * (D - W) + kappa * I  (graph Laplacian + nugget; SPD)."""
    W = grid_adjacency(shape, periodic)
    D = np.diag(W.sum(axis=1))
    Q = tau * (D - W) + kappa * np.eye(W.shape[0])
    return jnp.asarray(Q)


def gmrf_log_density(x, Q, b=None):
    """log p(x) up to constant: -1/2 x^T Q x + b^T x
    (reference src/core/gaussian.py:25-50)."""
    quad = -0.5 * x @ (Q @ x)
    if b is not None:
        quad = quad + b @ x
    return quad


def gmrf_grad_log_density(x, Q, b=None):
    """grad log p = -Q x + b (reference src/core/gaussian.py:52-72)."""
    g = -(Q @ x)
    if b is not None:
        g = g + b
    return g


def gmrf_sample(key, Q, b=None, shape=()):
    """Exact sampling via Cholesky of the precision: x = mu + L^{-T} z,
    mu = Q^{-1} b."""
    n = Q.shape[0]
    L = jnp.linalg.cholesky(Q)
    z = jax.random.normal(key, shape + (n,), dtype=Q.dtype)
    # solve L^T x = z (upper triangular); batch as multiple RHS columns
    zf = z.reshape(-1, n).T
    x = jax.scipy.linalg.solve_triangular(L.T, zf, lower=False).T.reshape(
        shape + (n,))
    if b is not None:
        mu = jnp.linalg.solve(Q, b)
        x = x + mu
    return x
