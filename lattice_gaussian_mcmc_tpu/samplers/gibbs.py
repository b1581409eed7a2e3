"""Coordinate-wise Gibbs sampling and annealed Gibbs CVP decoding (MIMO
lattice-decoding workload — BASELINE config 5).

The target pi(x) ~ exp(-||B x - t||^2 / (2 sigma^2)) over integer coefficient
vectors x. The single-site conditional for x_i given the rest is a 1D discrete
Gaussian with
    mu_i = x_i - e_i / G_ii,   sigma_i = sigma / sqrt(G_ii),
where G = B^T B and e = G x - B^T t is maintained incrementally (rank-1
update per coordinate). A systematic sweep costs O(n^2) — the same as one
Klein draw — and is vmapped over chains.

Annealing: sigma_t decreases geometrically toward 0; as sigma -> 0 the chain
freezes into a local CVP optimum (Klein-proposal MCMC decoders in the
Wang-Ling line anneal the same way). The best (closest) point ever visited is
tracked per chain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice
from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import (
    DEFAULT_WINDOW,
    sample_dgauss,
)
from lattice_gaussian_mcmc_tpu.utils.prng import chain_keys


def _gibbs_sweep(key, x, e, G, g_diag, sigma, window):
    """One systematic-scan Gibbs sweep. Returns updated (x, e)."""
    n = x.shape[0]
    inv_gdiag = 1.0 / g_diag
    sigmas = sigma * jnp.sqrt(inv_gdiag)

    def body(i, carry):
        x, e = carry
        mu = x[i] - e[i] * inv_gdiag[i]
        z = sample_dgauss(jax.random.fold_in(key, i), mu, sigmas[i], window)
        delta = z - x[i]
        e = e + G[:, i] * delta
        x = x.at[i].set(z)
        return (x, e)

    return jax.lax.fori_loop(0, n, body, (x, e))


@partial(jax.jit, static_argnames=("n_sweeps", "window"))
def gibbs_chain(key, lattice: Lattice, target, sigma, n_sweeps: int,
                x0=None, window: int = DEFAULT_WINDOW):
    """Fixed-temperature Gibbs chain; returns (coeffs trace (T, n), final x)."""
    G = lattice.basis.T @ lattice.basis
    g_diag = jnp.diagonal(G)
    Bt = lattice.basis.T @ target
    if x0 is None:
        x0 = lattice.nearest_plane(target)
    e0 = G @ x0 - Bt

    def step(carry, t):
        x, e = carry
        x, e = _gibbs_sweep(jax.random.fold_in(key, t), x, e, G, g_diag,
                            jnp.asarray(sigma, dtype=x.dtype), window)
        return (x, e), x

    (x, _), trace = jax.lax.scan(step, (x0, e0), jnp.arange(n_sweeps))
    return trace, x


@partial(jax.jit, static_argnames=("n_sweeps", "n_chains", "window"))
def annealed_gibbs_decode(key, lattice: Lattice, target, sigma0,
                          n_sweeps: int = 50, n_chains: int = 64,
                          alpha: float = 0.9, window: int = DEFAULT_WINDOW):
    """Annealed Gibbs CVP decoding: geometric cooling sigma_t = sigma0 *
    alpha^t, multi-chain, returns (best_point, best_coeffs, best_dist2).

    Matches the reference's CVP/decode capability (`decode_cvp`,
    NTRULatticeSampler CVP mode) but as a stochastic decoder that beats
    plain Babai on hard instances.
    """
    G = lattice.basis.T @ lattice.basis
    g_diag = jnp.diagonal(G)
    Bt = lattice.basis.T @ target
    x_babai = lattice.nearest_plane(target)

    def one_chain(k, chain_idx):
        # diversify starts: Babai + random perturbation — except chain 0,
        # which keeps the exact Babai point so the decoder never returns a
        # worse answer than the deterministic baseline
        kp, ks = jax.random.split(k)
        pert = jax.random.randint(kp, x_babai.shape, -1, 2).astype(x_babai.dtype)
        pert = jnp.where(chain_idx == 0, jnp.zeros_like(pert), pert)
        x0 = x_babai + pert
        e0 = G @ x0 - Bt

        def dist2(x, e):
            # ||Bx - t||^2 = x^T e - t^T B x + t^T t ; track relative value:
            # d2 = x.(Gx - 2 Bt) + t.t — constant t.t dropped, restored later
            return x @ (e - Bt)

        def step(carry, t):
            x, e, best_x, best_d = carry
            sig = sigma0 * alpha ** t
            x, e = _gibbs_sweep(jax.random.fold_in(ks, t), x, e, G, g_diag,
                                sig, window)
            d = dist2(x, e)
            better = d < best_d
            best_x = jnp.where(better, x, best_x)
            best_d = jnp.where(better, d, best_d)
            return (x, e, best_x, best_d), None

        init = (x0, e0, x0, dist2(x0, e0))
        (_, _, bx, bd), _ = jax.lax.scan(step, init, jnp.arange(n_sweeps,
                                                                dtype=jnp.float32))
        return bx, bd

    keys = chain_keys(key, n_chains)
    best_xs, best_ds = jax.vmap(one_chain)(keys, jnp.arange(n_chains))
    i = jnp.argmin(best_ds)
    bx = best_xs[i]
    point = lattice.basis @ bx
    d2 = jnp.sum((point - target) ** 2)
    return point, bx, d2
