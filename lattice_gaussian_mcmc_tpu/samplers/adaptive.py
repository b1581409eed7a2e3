"""Adaptive-precision Klein sampling (reference
src/samplers/klein.py:273-302 `adaptive_precision_sample`).

The reference escalates numpy precision per sample when the basis is
ill-conditioned. The TPU-native equivalent is *path selection from a
deterministic forward-error bound*: the f32 pipelines (Pallas kernel,
blocked-f32 XLA) compute the conditional means c_i = cs_i - sum_j U_ij x_j
in f32, whose rounding perturbs the per-coordinate law. We bound that error
a priori from the precomputation, compare it against the requested law
tolerance, and dispatch:

  f32 error bound <= rtol  ->  Pallas fused kernel on TPU (fastest)
                               / blocked f32 XLA elsewhere
  otherwise                ->  f64 XLA path (CPU f64 or TPU-emulated)

Error model (validated at NTRU-512 dim-1024 against the f64 path,
scripts/validate_pallas_scale.py): with the bf16-split kernel all dots are
f32-quality, so |c_err| <= gamma * eps32 * max_i sum_j |U_ij| * x_scale
with gamma a small constant (sequential-accumulation bound), and the
per-coordinate log-density distortion is <= (|c_err| / sigma_i) * window/2
(Lipschitz bound on the windowed logits).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice
from lattice_gaussian_mcmc_tpu.samplers.klein import (
    KleinPrecomp,
    klein_precompute,
)


def f32_law_distortion_bound(pre: KleinPrecomp) -> float:
    """Deterministic bound on the per-coordinate log-density distortion of
    the f32 sampling paths on this precomputation.

    x_scale: the drawn coefficients (recentered, see the Pallas kernel) are
    bounded by the conditional spread ~6*max sigma_i plus the center
    fraction; couplings sum |U_ij| over the row.
    """
    U = np.asarray(pre.U, dtype=np.float64)
    sig = np.asarray(pre.sigmas, dtype=np.float64)
    eps32 = float(np.finfo(np.float32).eps)
    x_scale = 6.0 * float(np.max(sig)) + 1.0
    row_l1 = np.abs(U - np.eye(U.shape[0])).sum(axis=1)
    # f32 sequential accumulation over the row: |c_err| <~ eps * sum|terms|
    c_err = 2.0 * eps32 * (row_l1 * x_scale + np.abs(np.asarray(pre.cs)))
    # The Pallas path's bf16-split coupling dots are exact only while the
    # recentered integer draws stay bf16-representable (|y| <= 2^8 = 256);
    # beyond that each drawn coefficient picks up up to 2^-9 relative bf16
    # rounding inside the MXU pass, which the f32 model above does not see.
    # Inflate the bound by that term whenever the spread can exceed 256.
    if x_scale > 256.0:
        c_err = c_err + (2.0 ** -9) * x_scale * row_l1
    distortion = (c_err / np.maximum(sig, 1e-300)) * (pre.window / 2.0)
    return float(np.max(distortion))


def choose_precision(pre: KleinPrecomp, rtol: float = 1e-2) -> str:
    """'f32' when the bound is within rtol, else 'f64'."""
    return "f32" if f32_law_distortion_bound(pre) <= rtol else "f64"


def adaptive_klein_sample(key: jax.Array, lattice: Lattice, sigma: float,
                          num_samples: int, rtol: float = 1e-2,
                          center=None, block: int = 32,
                          ) -> Tuple[jax.Array, jax.Array, dict]:
    """Klein batch with automatic precision escalation.

    Returns (coeffs, log_ws, info) where info records the chosen path and
    the error bound — the observability the reference's adaptive sampler
    logged per-sample.
    """
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        klein_sample_batch_pallas,
        pallas_supported,
    )
    from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
        klein_sample_batch_blocked,
    )

    pre = klein_precompute(lattice, sigma, center=center)
    bound = f32_law_distortion_bound(pre)
    info = {"f32_distortion_bound": bound, "rtol": rtol}
    if bound <= rtol:
        tile = max((t for t in (256, 512, 1024, 2048, 4096)
                    if num_samples % t == 0), default=0)
        if pallas_supported() and tile > 0:
            info["path"] = "pallas_f32"
            X, lw = klein_sample_batch_pallas(key, pre, num_samples,
                                              tile=tile)
            return X, lw, info
        info["path"] = "xla_f32"
        return (*klein_sample_batch_blocked(key, pre, num_samples, block),
                info)
    # escalate: rebuild the whole pipeline in f64 (host GSO is already f64)
    if not jax.config.jax_enable_x64:
        import warnings
        warnings.warn(
            "f32 law-distortion bound %.3g exceeds rtol %.3g but x64 is "
            "disabled (TPU backend?) — escalation needs jax_enable_x64 on a "
            "CPU host; falling back to the blocked f32 path" % (bound, rtol),
            stacklevel=2)
        info["path"] = "xla_f32_escalation_unavailable"
        return (*klein_sample_batch_blocked(key, pre, num_samples, block),
                info)
    info["path"] = "xla_f64"
    lat64 = jax.tree.map(
        lambda a: a.astype(jnp.float64)
        if isinstance(a, jnp.ndarray) and jnp.issubdtype(a.dtype,
                                                         jnp.floating)
        else a, lattice)
    pre64 = klein_precompute(lat64, sigma, center=center,
                             window=pre.window)
    X, lw = klein_sample_batch_blocked(key, pre64, num_samples, block)
    return X, lw, info
