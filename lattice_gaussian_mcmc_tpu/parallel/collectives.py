"""Sharded sampling + collective diagnostics (psum/all_gather inside jit).

This is the distributed backend the reference lacks (SURVEY.md section 5
"Distributed communication backend"): chains shard over the mesh; global
acceptance rates, moments, and between/within-chain variances (R-hat) are
computed with `jax.lax.psum` inside `shard_map`, so cross-host traffic is a
handful of scalars per diagnostic — chains themselves never communicate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lattice_gaussian_mcmc_tpu.parallel.mesh import CHAIN_AXIS
from lattice_gaussian_mcmc_tpu.parallel.runtime import put_global
from lattice_gaussian_mcmc_tpu.samplers.imhk import imhk_chain
from lattice_gaussian_mcmc_tpu.samplers.klein import klein_sample
from lattice_gaussian_mcmc_tpu.utils.prng import chain_keys


def sharded_klein_batch(key, pre, n_samples: int, mesh: Mesh):
    """Klein sampling with the sample axis sharded over the mesh.
    Returns (coeffs (n_samples, n), log_ws (n_samples,)) sharded arrays."""
    assert n_samples % mesh.size == 0, "n_samples must divide the mesh"
    keys = chain_keys(key, n_samples)

    def local(keys_blk):
        return jax.vmap(klein_sample, in_axes=(0, None))(keys_blk, pre)

    f = jax.shard_map(local, mesh=mesh, in_specs=P(CHAIN_AXIS),
                      out_specs=P(CHAIN_AXIS), check_vma=False)
    keys = put_global(keys, mesh, P(CHAIN_AXIS))
    return jax.jit(f)(keys)


def sharded_imhk_chains(key, pre, n_chains: int, n_samples: int, mesh: Mesh,
                        thin: int = 1, burn_in: int = 0):
    """IMHK chains sharded over the mesh; returns (coeffs (C, T, n),
    log_ws (C, T), global_stats dict of replicated scalars).

    The per-device block runs chains locally; global acceptance is a single
    psum at the end.
    """
    assert n_chains % mesh.size == 0, "n_chains must divide the mesh"
    keys = chain_keys(key, n_chains)

    def local(keys_blk):
        coeffs, log_ws, states = jax.vmap(
            lambda k: imhk_chain(k, pre, n_samples, thin, burn_in))(keys_blk)
        acc = jnp.sum(states.accepted)
        tot = jnp.sum(states.steps)
        g_acc = jax.lax.psum(acc, CHAIN_AXIS)
        g_tot = jax.lax.psum(tot, CHAIN_AXIS)
        # global per-coordinate moments over all chains x time
        s1 = jax.lax.psum(jnp.sum(coeffs, axis=(0, 1)), CHAIN_AXIS)
        s2 = jax.lax.psum(jnp.sum(coeffs**2, axis=(0, 1)), CHAIN_AXIS)
        cnt = jax.lax.psum(
            jnp.asarray(coeffs.shape[0] * coeffs.shape[1], coeffs.dtype),
            CHAIN_AXIS)
        mean = s1 / cnt
        var = s2 / cnt - mean**2
        stats = {
            "acceptance_rate": g_acc.astype(jnp.float32) /
                               jnp.maximum(g_tot, 1).astype(jnp.float32),
            "mean": mean,
            "std": jnp.sqrt(jnp.maximum(var, 0.0)),
            "n_total": cnt,
        }
        return coeffs, log_ws, stats

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(CHAIN_AXIS),
        out_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS),
                   {"acceptance_rate": P(), "mean": P(), "std": P(),
                    "n_total": P()}),
        check_vma=False)
    keys = put_global(keys, mesh, P(CHAIN_AXIS))
    return jax.jit(f)(keys)


def global_acceptance(accepted, steps, mesh: Mesh):
    """Pooled acceptance rate across a sharded batch of chain states."""
    def local(a, s):
        ga = jax.lax.psum(jnp.sum(a), CHAIN_AXIS)
        gs = jax.lax.psum(jnp.sum(s), CHAIN_AXIS)
        return ga.astype(jnp.float32) / jnp.maximum(gs, 1).astype(jnp.float32)
    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS)), out_specs=P(),
                      check_vma=False)
    return jax.jit(f)(accepted, steps)


def global_moments(x, mesh: Mesh):
    """Global mean/std over a sharded (C, ..., d) array, reducing all but the
    last axis."""
    def local(blk):
        import math
        axes = tuple(range(blk.ndim - 1))
        s1 = jax.lax.psum(jnp.sum(blk, axis=axes), CHAIN_AXIS)
        s2 = jax.lax.psum(jnp.sum(blk**2, axis=axes), CHAIN_AXIS)
        cnt = jax.lax.psum(
            jnp.asarray(math.prod(blk.shape[:-1]), blk.dtype), CHAIN_AXIS)
        mean = s1 / cnt
        var = s2 / cnt - mean**2
        return mean, jnp.sqrt(jnp.maximum(var, 0.0))
    f = jax.shard_map(local, mesh=mesh, in_specs=P(CHAIN_AXIS),
                      out_specs=(P(), P()), check_vma=False)
    return jax.jit(f)(x)


def global_gelman_rubin(chains, mesh: Mesh):
    """R-hat over chains sharded across the mesh. chains: (C, T) sharded on
    C. Uses psum'd within/between-chain variance components so no chain data
    moves across hosts."""
    def local(blk):  # blk: (C_local, T)
        C_local, T = blk.shape
        means = jnp.mean(blk, axis=1)
        vars_ = jnp.var(blk, axis=1, ddof=1)
        C = jax.lax.psum(jnp.asarray(C_local, blk.dtype), CHAIN_AXIS)
        W = jax.lax.psum(jnp.sum(vars_), CHAIN_AXIS) / C
        gm = jax.lax.psum(jnp.sum(means), CHAIN_AXIS) / C
        B = T * jax.lax.psum(jnp.sum((means - gm) ** 2), CHAIN_AXIS) / (C - 1)
        var_hat = (T - 1) / T * W + B / T
        return jnp.sqrt(var_hat / jnp.maximum(W, 1e-300))
    f = jax.shard_map(local, mesh=mesh, in_specs=P(CHAIN_AXIS), out_specs=P(),
                      check_vma=False)
    return jax.jit(f)(chains)


def sharded_imhk_blocked(key, pre, n_chains: int, n_steps: int, mesh: Mesh,
                         block: int = 32):
    """High-throughput path sharded over the mesh: each device runs the
    MXU-blocked fused IMHK batch on its chain shard; acceptance is psum'd.

    Returns (coeffs (C, n), log_ws (C,), global_acceptance scalar).
    This is the multi-chip production configuration: zero inter-chip traffic
    during sampling, one collective for the pooled diagnostic.
    """
    from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
        imhk_steps_batch_blocked,
        klein_sample_batch_blocked,
    )
    assert n_chains % mesh.size == 0
    per_dev = n_chains // mesh.size
    dev_keys = chain_keys(key, mesh.size)

    def local(dev_key):
        dev_key = dev_key[0]  # shard_map passes a (1,)-shaped block
        k_init, k_run = jax.random.split(dev_key)
        X0, lw0 = klein_sample_batch_blocked(k_init, pre, per_dev, block)
        X, lw, acc = imhk_steps_batch_blocked(k_run, pre, X0, lw0, n_steps,
                                              block)
        g_acc = jax.lax.psum(jnp.sum(acc), CHAIN_AXIS)
        g_tot = jax.lax.psum(jnp.asarray(per_dev * n_steps, jnp.int32),
                             CHAIN_AXIS)
        return X, lw, g_acc.astype(jnp.float32) / g_tot.astype(jnp.float32)

    f = jax.shard_map(local, mesh=mesh, in_specs=P(CHAIN_AXIS),
                      out_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS), P()),
                      check_vma=False)
    dev_keys = put_global(dev_keys, mesh, P(CHAIN_AXIS))
    return jax.jit(f)(dev_keys)


def sharded_imhk_pallas(key, pre, n_chains: int, n_steps: int, mesh: Mesh,
                        tile: int = 1024, interpret: bool = False):
    """Speed-of-light multi-chip path: the fused Pallas IMHK kernel runs on
    every device's chain shard under `shard_map`; acceptance is psum'd.

    Per-chip this is the 7.3M samples/s kernel (bench.py); across a mesh
    the chains never communicate, so aggregate throughput is
    ~mesh.size * per-chip rate with one scalar collective per call.
    Returns (coeffs (C, n), log_ws (C,), global_acceptance scalar).
    `interpret=True` runs the kernel in interpreter mode (CPU meshes /
    tests)."""
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        imhk_step_pallas_fused,
        klein_sample_batch_pallas,
    )
    assert n_chains % mesh.size == 0
    per_dev = n_chains // mesh.size
    assert per_dev % tile == 0, "per-device chains must divide the tile"
    dev_keys = chain_keys(key, mesh.size)

    def local(dev_key):
        dev_key = dev_key[0]
        k_init, k_run = jax.random.split(dev_key)
        X0, lw0 = klein_sample_batch_pallas(k_init, pre, per_dev, tile=tile,
                                            interpret=interpret,
                                            host_rng=interpret)
        X, lw, acc = imhk_step_pallas_fused(
            k_run, pre, X0, lw0, jnp.zeros((per_dev,), jnp.float32),
            tile=tile, n_steps=n_steps, interpret=interpret,
            host_rng=interpret)
        g_acc = jax.lax.psum(jnp.sum(acc), CHAIN_AXIS)
        g_tot = jax.lax.psum(jnp.asarray(per_dev * n_steps, jnp.float32),
                             CHAIN_AXIS)
        return X, lw, g_acc / g_tot

    f = jax.shard_map(local, mesh=mesh, in_specs=P(CHAIN_AXIS),
                      out_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS), P()),
                      check_vma=False)
    dev_keys = put_global(dev_keys, mesh, P(CHAIN_AXIS))
    return jax.jit(f)(dev_keys)


def sharded_peikert_pallas(key, pre, n_chains: int, mesh: Mesh,
                           n_rounds: int = 1, window=None, tile: int = 1024,
                           interpret: bool = False):
    """Multi-chip Peikert: the fused convolution-sampler kernel
    (ops/kernels/peikert_pallas.py) on every device's chain shard under
    `shard_map`, with the pooled per-coordinate mean and second moment
    psum'd across the mesh (the draws are i.i.d., so cross-chip pooled
    moments are the natural global diagnostic — there is no acceptance).

    Returns (coeffs (n_rounds*C, n) global-sharded, pooled_mean (n,),
    pooled_var (n,)). `interpret=True` runs the kernel in interpreter
    mode with host randomness (CPU meshes / tests)."""
    from lattice_gaussian_mcmc_tpu.ops.kernels.peikert_pallas import (
        peikert_rounds_pallas,
    )
    assert n_chains % mesh.size == 0
    per_dev = n_chains // mesh.size
    assert per_dev % tile == 0, "per-device chains must divide the tile"
    dev_keys = chain_keys(key, mesh.size)

    def local(dev_key):
        R = peikert_rounds_pallas(dev_key[0], pre, per_dev,
                                  n_rounds=n_rounds, window=window,
                                  tile=tile, interpret=interpret,
                                  host_rng=interpret)
        X = R.reshape(n_rounds * per_dev, -1)
        cnt = jnp.asarray(X.shape[0], jnp.float32)
        s1 = jax.lax.psum(jnp.sum(X, axis=0), CHAIN_AXIS)
        s2 = jax.lax.psum(jnp.sum(X * X, axis=0), CHAIN_AXIS)
        tot = jax.lax.psum(cnt, CHAIN_AXIS)
        mean = s1 / tot
        var = s2 / tot - mean * mean
        return X, mean, var

    f = jax.shard_map(local, mesh=mesh, in_specs=P(CHAIN_AXIS),
                      out_specs=(P(CHAIN_AXIS), P(), P()),
                      check_vma=False)
    dev_keys = put_global(dev_keys, mesh, P(CHAIN_AXIS))
    return jax.jit(f)(dev_keys)
