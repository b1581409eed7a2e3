"""Peikert's convolution sampler — the fully-parallel (scan-free) lattice
Gaussian sampler, named by the BASELINE north star.

Algorithm (Peikert, "An Efficient and Parallel Gaussian Sampler for
Lattices", CRYPTO 2010): to sample x with Bx ~ D_{Lambda, sigma, c},
  1. choose per-coordinate rounding width r >= eta_eps(Z);
  2. perturb: p ~ N(0, Sigma2) continuous, with
       Sigma2 = sigma^2 (B^T B)^{-1} - r^2 I   (PSD iff sigma >= r s1(B));
  3. round independently: x_i ~ D_{Z, r, (c' - p)_i},  c' = B^{-1} c.
Every step is elementwise or a single matvec — unlike Klein there is NO
sequential dependence, so on TPU the whole batch is one fused kernel. The
price: sigma must exceed r * s1(B) (Klein only needs ~max ||b*_i||).

This capability has no direct reference equivalent (the reference only
implements Klein/IMHK); it is included because the BASELINE north star lists
it and it is the natural MXU-friendly sampler for large sigma.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice
from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import (
    DEFAULT_WINDOW,
    sample_dgauss,
)
from lattice_gaussian_mcmc_tpu.ops.theta import smoothing_parameter_zn
from lattice_gaussian_mcmc_tpu.utils.prng import chain_keys


@flax.struct.dataclass
class PeikertPrecomp:
    basis: jnp.ndarray       # (n, n)
    L2: jnp.ndarray          # (n, n) Cholesky factor of Sigma2
    cprime: jnp.ndarray      # (n,) B^{-1} c
    r: jnp.ndarray           # scalar rounding width
    sigma: jnp.ndarray       # scalar target width
    window: int = flax.struct.field(pytree_node=False, default=DEFAULT_WINDOW)

    @property
    def n(self) -> int:
        return self.basis.shape[0]


def peikert_precompute(lattice: Lattice, sigma, center=None,
                       r: Optional[float] = None, eps: float = 0.01,
                       window: int = DEFAULT_WINDOW) -> PeikertPrecomp:
    """Host/device precompute: Cholesky of Sigma2 and the coefficient-space
    center. Raises (via NaN check on host use) if sigma < r * s1(B)."""
    import numpy as np

    n = lattice.n
    dtype = lattice.basis.dtype
    if r is None:
        r = smoothing_parameter_zn(n, eps)
    # one-time precompute in HOST f64 (like klein_precompute's host GSO):
    # cryptographic bases have Gram condition numbers ~ q^2, far beyond
    # f32 inversion — and the TPU backend has no f64 linalg at all
    Bh = np.asarray(lattice.basis, dtype=np.float64)
    rh = float(r)
    sh = float(np.asarray(sigma, dtype=np.float64))
    Ginv = np.linalg.inv(Bh.T @ Bh)
    # total coefficient-space covariance must be sigma^2 (B^T B)^{-1}; the
    # randomized rounding contributes ~ r^2 I, so the continuous perturbation
    # carries the remainder (PSD iff sigma >= r * s1(B)):
    Sigma2 = sh ** 2 * Ginv - rh ** 2 * np.eye(n)
    # jitter for the PSD boundary
    L2h = np.linalg.cholesky(Sigma2 + 1e-10 * np.eye(n))
    if center is None:
        cprime_h = np.zeros((n,))
    else:
        cprime_h = np.linalg.solve(Bh, np.asarray(center, dtype=np.float64))
    return PeikertPrecomp(basis=lattice.basis,
                          L2=jnp.asarray(L2h, dtype=dtype),
                          cprime=jnp.asarray(cprime_h, dtype=dtype),
                          r=jnp.asarray(rh, dtype=dtype),
                          sigma=jnp.asarray(sh, dtype=dtype),
                          window=window)


def peikert_sample(key: jax.Array, pre: PeikertPrecomp):
    """One draw: returns integer-valued float coefficients (n,)."""
    k_pert, k_round = jax.random.split(key)
    p = pre.L2 @ jax.random.normal(k_pert, (pre.n,), dtype=pre.L2.dtype)
    centers = pre.cprime - p
    sig = jnp.full((pre.n,), pre.r, dtype=pre.L2.dtype)
    return sample_dgauss(k_round, centers, sig, pre.window)


@partial(jax.jit, static_argnames=("num_samples",))
def peikert_sample_batch(key: jax.Array, pre: PeikertPrecomp, num_samples: int):
    keys = chain_keys(key, num_samples)
    return jax.vmap(peikert_sample, in_axes=(0, None))(keys, pre)


class PeikertSampler:
    """OO wrapper with validity checking."""

    def __init__(self, lattice: Lattice, sigma: float, center=None,
                 r: Optional[float] = None, eps: float = 0.01,
                 window: int = DEFAULT_WINDOW):
        self.lattice = lattice
        self.sigma = float(sigma)
        self.pre = peikert_precompute(lattice, sigma, center, r, eps, window)
        s1 = float(jnp.linalg.norm(lattice.basis, ord=2))
        r_val = float(self.pre.r)
        if self.sigma < r_val * s1:
            raise ValueError(
                f"Peikert requires sigma >= r * s1(B) = {r_val * s1:.4g}; "
                f"got sigma={self.sigma:.4g}. Use Klein/IMHK for small sigma.")

    def sample(self, key, num_samples: int = 1, return_coeffs: bool = False,
               backend: str = "auto"):
        """backend "pallas" (or "auto" on a TPU) runs the fused kernel
        (ops/kernels/peikert_pallas.py): VMEM-resident perturbation matmul
        + independent windowed roundings, never materializing the
        (B, n, window) logits tensor the XLA path needs — 6.25M i.i.d.
        samples/s at dim 1024 vs 0.04M for the XLA path. Requires
        n >= 128 (Mosaic's remote compile hangs on sub-MXU shapes) and a
        batch divisible by 256; the window follows the discrete-aware
        total-tail-budget policy (suggest_peikert_window)."""
        coeffs = None
        if backend in ("auto", "pallas"):
            from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
                pallas_supported,
            )
            from lattice_gaussian_mcmc_tpu.ops.kernels.peikert_pallas import (
                peikert_sample_batch_pallas,
                suggest_peikert_window,
            )
            tile = max((t for t in (256, 512, 1024, 2048, 4096)
                        if num_samples % t == 0), default=0)
            ok = pallas_supported() and tile > 0 and self.pre.n >= 128
            if backend == "pallas" and not ok:
                raise RuntimeError(
                    "backend='pallas' needs a TPU, n >= 128, and a batch "
                    "divisible by 256")
            if ok:
                w = suggest_peikert_window(float(self.pre.r), self.pre.n)
                coeffs = peikert_sample_batch_pallas(
                    key, self.pre, num_samples, window=w, tile=tile)
        if coeffs is None:
            coeffs = peikert_sample_batch(key, self.pre, num_samples)
        if return_coeffs:
            return coeffs
        return coeffs @ self.pre.basis.T
