"""Pallas kernel for direct i.i.d. discrete-Gaussian sampling over Z^n.

The second kernel the BASELINE north star names ("1D discrete-Gaussian base
samplers"): unlike Klein there is no sequential dependence, so the whole
batch is one embarrassingly parallel grid — each program draws a
(ROWS, TILE) block of variates with the on-core PRNG and the same
inverse-CDF window machinery as the Klein kernel. Validated on hardware: TVD
0.0027 vs the exact pmf at sigma=5, mean -0.0007, std 5.003.

Measured (r5, one v5e): **1.8-1.9 G draws/s** at the benchmark suite's
67M-draw dispatches (65536 x dim-1024 vectors; results/benchmark), 631M
draws/s at 16.8M-draw dispatches (tunnel-dispatch-bound at that size).
The XLA `sample_zn` path cannot run at these batch sizes at all — it
materializes an (N, window) logits tensor (17 GB at the suite size) —
so this kernel IS the production direct path on TPU; `sample_zn` remains
the portable/CPU fallback. (An earlier note here quoted 22M draws/s
against 45M for XLA: both predate the multi-draw-per-program grid and
scalar-pull timing, and are obsolete.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

TILE = 1024   # lane-axis width per program (multiple of 128)
ROWS = 256    # variates per lane per program


def _kernel(seed_ref, params_ref, unif_ref, out_ref, *, window, rows, tile,
            host_rng):
    """Draw (rows, tile) i.i.d. D_{Z, sigma, c} variates.

    params_ref: (1, 2) f32 SMEM — [sigma, center].
    unif_ref: (rows, tile) f32 VMEM host uniforms (host_rng only; interpret
    mode simulates the hardware PRNG as zeros, so tests feed uniforms).
    """
    prog = pl.program_id(0)
    if not host_rng:
        pltpu.prng_seed(seed_ref[0, 0] + prog * 1103515245)  # fits int32
    sigma = params_ref[0, 0]
    center = params_ref[0, 1]

    base = jnp.round(center)
    offs = (jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0)
            .astype(jnp.float32) - window // 2)
    support = base + offs                                  # (window, 1)
    zsc = (support - center) * (1.0 / sigma)
    logits = -0.5 * zsc * zsc
    m = jnp.max(logits)
    w = jnp.exp(logits - m)                                # (window, 1)
    # cumsum via lower-triangular ones matmul (no cumsum primitive on TPU).
    # Mosaic's DEFAULT dot is a single bf16 pass (~2e-3 relative CDF bias);
    # the bf16 split restores f32 accuracy (see klein_pallas precision note)
    # at zero cost here — the cdf is built once per program, not per draw.
    row_w = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1)
    tril = (col_w <= row_w).astype(jnp.float32)
    wbits = pltpu.bitcast(w, jnp.int32)
    w_hi = pltpu.bitcast(jnp.bitwise_and(wbits, jnp.int32(-65536)),
                         jnp.float32)
    cdf = (jnp.dot(tril, w_hi, preferred_element_type=jnp.float32)
           + jnp.dot(tril, w - w_hi,
                     preferred_element_type=jnp.float32))  # (window, 1)
    total = cdf[window - 1, 0]

    def row_body(r, _):
        if host_rng:
            u01 = unif_ref[pl.ds(r, 1), :]
        else:
            bits = pltpu.bitcast(pltpu.prng_random_bits((1, tile)), jnp.int32)
            mant = jnp.bitwise_and(bits, jnp.int32(0x7FFFFF))
            fbits = jnp.bitwise_or(mant, jnp.int32(0x3F800000))
            u01 = pltpu.bitcast(fbits, jnp.float32) - 1.0
        target = u01 * total                               # (1, tile)
        idx = jnp.sum((cdf < target).astype(jnp.float32), axis=0,
                      keepdims=True)                       # (1, tile)
        idx = jnp.clip(idx, 0.0, float(window - 1))
        out_ref[pl.ds(r, 1), :] = base + idx - window // 2
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


@functools.partial(jax.jit, static_argnames=("num", "window", "rows", "tile",
                                             "interpret", "host_rng"))
def sample_zn_pallas(key: jax.Array, num: int, sigma, center=0.0,
                     window: int = 64, rows: int = ROWS, tile: int = TILE,
                     interpret: bool = False, host_rng: bool = False):
    """`num` i.i.d. draws from D_{Z, sigma, center} (flat array). `num` must
    be a multiple of rows * tile (262144 at the production defaults; shrink
    both for interpret-mode testing). Reshape client-side for Z^n vectors."""
    assert num % (rows * tile) == 0, f"num must be a multiple of {rows*tile}"
    n_progs = num // (rows * tile)
    k_seed, k_unif = jax.random.split(key)
    seed = jax.random.randint(k_seed, (1, 1), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)
    params = jnp.asarray([[sigma, center]], dtype=jnp.float32)
    if host_rng:
        unif = jax.random.uniform(k_unif, (n_progs * rows, tile),
                                  dtype=jnp.float32)
        unif_spec = pl.BlockSpec((rows, tile), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        # never read: a single (rows, tile) zeros block with a constant
        # index map, so every program DMAs the SAME block instead of the
        # full output-sized buffer (which would double HBM traffic)
        unif = jnp.zeros((rows, tile), dtype=jnp.float32)
        unif_spec = pl.BlockSpec((rows, tile), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, window=window, rows=rows, tile=tile,
                               host_rng=host_rng)
    out = pl.pallas_call(
        kernel,
        grid=(n_progs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            unif_spec,
        ],
        out_specs=pl.BlockSpec((rows, tile), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_progs * rows, tile), jnp.float32),
        interpret=interpret,
    )(seed, params, unif)
    return out.reshape(-1)
