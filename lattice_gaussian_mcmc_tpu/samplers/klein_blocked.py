"""Blocked Klein sampling — the MXU-friendly batch formulation.

The naive batched Klein scan (klein.py) performs one (B,) <- (B, n) x (n,)
matvec per row, re-reading the full coefficient state from HBM n times: at
n = 1024, B = 4096 that is ~16 GB of traffic per sample batch and the TPU
runs at <1% of peak (measured ~85k samples/s on one v5e chip).

Blocked backward substitution fixes the data movement: rows are processed in
blocks of K. Cross-block conditional-mean contributions become ONE matmul
per block pair,
    T[:, :lo] += X_blk (B, K) @ U[:lo, lo:hi]^T (K, lo),
which the MXU executes at full tilt, and the sequential scan only runs
within a K-row block touching (B, K) state. HBM traffic drops ~K-fold and
the bulk of the FLOPs move from matvecs to matmuls.

PRNG note: this path draws each row's B-wide batch from one folded key
(key -> fold_in(row)), so its stream differs from the vmapped per-chain
sampler (which folds chain then row). Both are exact samplers of the same
law; bitwise equality holds within a path, not across paths.

Precision note: XLA's DEFAULT f32 dot on TPU is a single bf16 MXU pass
(~4e-3 relative), which would distort conditional means the same way the
unsplit Pallas kernel did (see ops/kernels/klein_pallas.py). All dots here
run at Precision.HIGHEST — XLA's multi-pass f32 algorithm, fast outside
Mosaic; on CPU (tests, f64 reference path) it is a no-op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lattice_gaussian_mcmc_tpu.samplers.klein import KleinPrecomp
from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import (
    sample_dgauss_icdf_with_logz,
)

DEFAULT_BLOCK = 128


def _pad_precomp(pre: KleinPrecomp, block: int):
    """Pad U/cs/sigmas so n is a multiple of `block`. Padding rows use
    sigma = tiny and U = I so the padded coordinates sample 0 with logZ ~ 0
    and never influence real rows (U off-diagonal padding is zero)."""
    n = pre.n
    n_pad = (-n) % block
    if n_pad == 0:
        return pre, n
    dtype = pre.U.dtype
    U = jnp.zeros((n + n_pad, n + n_pad), dtype=dtype)
    U = U.at[:n, :n].set(pre.U)
    U = U.at[jnp.arange(n, n + n_pad), jnp.arange(n, n + n_pad)].set(1.0)
    cs = jnp.concatenate([pre.cs, jnp.zeros((n_pad,), dtype)])
    # sigma tiny -> z = round(0) = 0 deterministically; logZ = 0 exactly at
    # the center, so log weights are unaffected.
    sigmas = jnp.concatenate([pre.sigmas, jnp.full((n_pad,), 1e-6, dtype)])
    padded = pre.replace(U=U, cs=cs, sigmas=sigmas, basis=pre.basis)
    return padded, n


@partial(jax.jit, static_argnames=("num_samples", "block"))
def klein_sample_batch_blocked(key: jax.Array, pre: KleinPrecomp,
                               num_samples: int,
                               block: int = DEFAULT_BLOCK):
    """Batched Klein draw, blocked. Returns (coeffs (B, n), log_w (B,))."""
    ppre, n_real = _pad_precomp(pre, block)
    n = ppre.U.shape[0]
    B = num_samples
    nb = n // block
    dtype = ppre.U.dtype

    X = jnp.zeros((B, n), dtype=dtype)
    T = jnp.zeros((B, n), dtype=dtype)  # accumulated tail sums per row
    logw = jnp.zeros((B,), dtype=dtype)

    for bi in range(nb - 1, -1, -1):
        lo, hi = bi * block, (bi + 1) * block
        U_blk = ppre.U[lo:hi, lo:hi]          # (K, K)
        cs_blk = ppre.cs[lo:hi]               # (K,)
        sg_blk = ppre.sigmas[lo:hi]           # (K,)
        T_blk = jax.lax.dynamic_slice(T, (0, lo), (B, block))
        key_blk = jax.random.fold_in(key, bi)

        def row_body(carry, r, U_blk=U_blk, cs_blk=cs_blk, sg_blk=sg_blk,
                     T_blk=T_blk, key_blk=key_blk):
            Xb, lw = carry
            # row r of the block: conditional mean from within-block coords
            s_in = jnp.dot(Xb, U_blk[r],
                           precision=jax.lax.Precision.HIGHEST)  # (B,)
            c = cs_blk[r] - T_blk[:, r] - s_in
            z, logZ = sample_dgauss_icdf_with_logz(
                jax.random.fold_in(key_blk, r), c, sg_blk[r], ppre.window)
            Xb = Xb.at[:, r].set(z)
            return (Xb, lw + logZ), None

        (Xb, logw), _ = jax.lax.scan(
            row_body, (jnp.zeros((B, block), dtype=dtype), logw),
            jnp.arange(block - 1, -1, -1))
        X = jax.lax.dynamic_update_slice(X, Xb, (0, lo))
        if lo > 0:
            # one MXU matmul updates every earlier row's tail sum
            T = T.at[:, :lo].add(
                jnp.dot(Xb, ppre.U[:lo, lo:hi].T,
                        preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST))

    return X[:, :n_real], logw


@partial(jax.jit, static_argnames=("n_steps", "block"))
def imhk_steps_batch_blocked(key: jax.Array, pre: KleinPrecomp, coeffs,
                             log_ws, n_steps: int,
                             block: int = DEFAULT_BLOCK):
    """Run `n_steps` fused IMHK steps over a (B, n) batch of chains using the
    blocked Klein proposal. Returns (coeffs, log_ws, accepted_count (B,)).

    This is the throughput path bench.py uses: one blocked proposal batch +
    elementwise MH accept per step.
    """
    B = coeffs.shape[0]

    def step(carry, t):
        X, lw, acc = carry
        k_t = jax.random.fold_in(key, t)
        k_prop, k_u = jax.random.split(k_t)
        Y, lw_y = klein_sample_batch_blocked(k_prop, pre, B, block)
        u = jax.random.uniform(k_u, (B,), dtype=lw.dtype,
                               minval=jnp.finfo(lw.dtype).tiny)
        accept = jnp.log(u) < (lw_y - lw)
        X = jnp.where(accept[:, None], Y, X)
        lw = jnp.where(accept, lw_y, lw)
        return (X, lw, acc + accept.astype(jnp.int32)), None

    (X, lw, acc), _ = jax.lax.scan(
        step, (coeffs, log_ws, jnp.zeros((B,), jnp.int32)),
        jnp.arange(n_steps))
    return X, lw, acc
