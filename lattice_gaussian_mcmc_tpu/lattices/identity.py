"""Z^n — the identity lattice, with closed forms and a direct vectorized
sampler (parity: reference `src/lattices/identity.py`: GS = I, CVP = rounding,
eta closed form, theta-product partition function, vectorized per-coordinate
direct sampling identity.py:233-297)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice
from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import (
    sample_dgauss_inverse_cdf,
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
    # inverse-CDF: one uniform per draw (Gumbel-max would need `window`
    # gumbels = 2 logs each per coordinate — ~100x the RNG+transcendental
    # work at the default window)
    return sample_dgauss_inverse_cdf(key, center, sig, window)


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


def successive_minima_zn(n: int):
    """lambda_i(Z^n) = 1 for all i (reference identity.py:324-364)."""
    import numpy as np
    return np.ones(n)


def kissing_number_zn(n: int) -> int:
    """Z^n kissing number = 2n (the +-e_i neighbors)."""
    return 2 * n


def theta_series_zn(q, n: int):
    """Theta series Theta_{Z^n}(q) = theta_3(0, q)^n
    (reference identity.py:210-231)."""
    from lattice_gaussian_mcmc_tpu.ops.theta import jacobi_theta3
    import jax.numpy as jnp
    return jacobi_theta3(jnp.asarray(0.0), jnp.asarray(q)) ** n


def validate_identity_lattice(n: int = 8, sigma: float = 3.0,
                              n_samples: int = 50_000, seed: int = 0) -> dict:
    """Self-validation (reference identity.py:378-413): direct sampling
    moments + partition-function consistency."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lattice_gaussian_mcmc_tpu.ops.theta import log_rho_Z
    z = sample_zn(jax.random.key(seed), n, sigma, shape=(n_samples,))
    za = np.asarray(z)
    checks = {
        "mean_ok": bool(abs(za.mean()) < 5 * sigma / np.sqrt(n_samples * n)),
        "std_ok": bool(abs(za.std() - sigma) / sigma < 0.02),
        "partition_consistent": bool(np.isfinite(
            float(n * log_rho_Z(jnp.asarray(sigma, jnp.float64))))),
    }
    checks["all_passed"] = all(checks.values())
    return checks
