"""Z^n — the identity lattice, with closed forms and a direct vectorized
sampler (parity: reference `src/lattices/identity.py`: GS = I, CVP = rounding,
eta closed form, theta-product partition function, vectorized per-coordinate
direct sampling identity.py:233-297)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice
from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import (
    sample_dgauss,
    DEFAULT_WINDOW,
)
from lattice_gaussian_mcmc_tpu.ops.theta import (
    log_partition_zn,
    smoothing_parameter_zn,
)


def identity_lattice(n: int, dtype=jnp.float32) -> Lattice:
    eye = jnp.eye(n, dtype=dtype)
    return Lattice(basis=eye, Q=eye, R=eye, gs_norms=jnp.ones((n,), dtype=dtype),
                   name=f"Z^{n}", meta={"kind": "identity", "n": n})


def sample_zn(key, n: int, sigma, center=None, shape=(),
              window: int = DEFAULT_WINDOW):
    """Direct i.i.d. per-coordinate sampling of D_{Z^n, sigma, c}: exact (no
    MCMC needed — coordinates are independent). `shape` adds leading batch
    dims. This is the O(n) fast path the reference benchmarks as "direct"
    (identity.py:233-297)."""
    if center is None:
        center = jnp.zeros((n,))
    center = jnp.broadcast_to(center, shape + (n,))
    sig = jnp.broadcast_to(jnp.asarray(sigma, dtype=center.dtype), center.shape)
    return sample_dgauss(key, center, sig, window)


def decode_cvp_zn(target):
    """CVP in Z^n is coordinate-wise rounding (identity.py:91-125)."""
    return jnp.round(target)


__all__ = [
    "identity_lattice",
    "sample_zn",
    "decode_cvp_zn",
    "log_partition_zn",
    "smoothing_parameter_zn",
]
