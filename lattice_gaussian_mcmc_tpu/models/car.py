"""Conditional autoregressive (CAR) model precision.

Parity: reference `src/models/car.py:10-89` — Q = tau * (I - rho * W~) with
W~ the row-normalized adjacency; proper CAR requires |rho| < 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.models.grid import grid_adjacency


def car_precision(shape, rho: float = 0.5, tau: float = 1.0,
                  periodic: bool = False) -> jnp.ndarray:
    if not -1.0 < rho < 1.0:
        raise ValueError("proper CAR requires |rho| < 1")
    W = grid_adjacency(shape, periodic)
    deg = W.sum(axis=1)
    Wn = W / np.maximum(deg[:, None], 1.0)
    Q = tau * (np.eye(W.shape[0]) - rho * Wn)
    # symmetrize (row normalization breaks symmetry; use the scaled form
    # Q = tau * (D - rho W) / ... simplest symmetric proper variant):
    Q = 0.5 * (Q + Q.T)
    return jnp.asarray(Q)
