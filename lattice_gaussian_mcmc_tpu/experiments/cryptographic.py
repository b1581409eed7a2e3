"""Cryptographic lattice experiments: sampler comparison on the lattice
families used in lattice-based cryptography.

Parity: reference `experiments/cryptographic_experiments.py` (C25) — lattice
suite generation (:119-192), Klein vs MHK comparison with parallel chains
(:194-387), dimension scaling (:389-460), sigma sensitivity (:462-532),
spectral-gap & TVD-bound validation (:534-641), checkpointing (:714-721).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.diagnostics import effective_sample_size
from lattice_gaussian_mcmc_tpu.diagnostics.spectral import (
    mixing_time_bounds,
    spectral_gap_mc,
)
from lattice_gaussian_mcmc_tpu.experiments.configs import CryptoConfig
from lattice_gaussian_mcmc_tpu.experiments.dimension_scaling import (
    checkerboard_lattice,
)
from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
    ntru_lattice,
    qary_lattice,
)
from lattice_gaussian_mcmc_tpu.lattices.base import smoothing_parameter
from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
from lattice_gaussian_mcmc_tpu.samplers.klein import MAX_WINDOW
from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
    imhk_steps_batch_blocked,
    klein_sample_batch_blocked,
)


def build_lattice_suite(cfg: CryptoConfig, dtype) -> Dict[str, object]:
    """Identity / checkerboard / q-ary / NTRU suite (reference :119-192)."""
    suite = {}
    n0 = cfg.qary_dims[0]
    suite[f"identity_{n0}"] = identity_lattice(n0, dtype=dtype)
    suite[f"checkerboard_{n0}"] = checkerboard_lattice(n0, dtype=dtype)
    for n in cfg.qary_dims:
        lat = qary_lattice(n, n // 2, q=cfg.qary_q, seed=cfg.seed, dtype=dtype)
        if n <= 256:
            # q-ary profiles keep unit GS tails after LLL (min||b*|| = 1
            # while sigma ~ q), which overflows the 1D window; a BKZ-20
            # pass flattens the profile enough to sample at n <= 128
            from lattice_gaussian_mcmc_tpu.reduction import (
                bkz_reduce,
                lll_reduce,
                native_available,
            )
            B = lll_reduce(np.asarray(lat.basis))
            if native_available() and n <= 128:
                B = bkz_reduce(B, beta=20, max_tours=4)
                tag = "-bkz20"
            else:
                tag = "-lll"
            lat = lattice_from_basis(B, name=lat.name + tag, dtype=dtype)
        suite[f"qary_{n}"] = lat
    for n in cfg.ntru_n:
        suite[f"ntru_{n}"] = ntru_lattice(n, q=cfg.ntru_q, seed=cfg.seed,
                                          cache_dir="bench_cache", dtype=dtype)
    return suite


def evaluate_sampler_on(lat, sigma: float, cfg: CryptoConfig, key) -> Dict:
    """Klein + IMHK metrics on one lattice (reference :194-387).

    Budgets scale inversely with dimension so the full config stays feasible
    on CPU (per-row scan dispatch dominates there); on TPU the same budgets
    finish in seconds.
    """
    pre = klein_precompute(lat, sigma)
    if pre.clamped:
        # the GS profile is too unbalanced to represent D_{Lambda,sigma}
        # at sigma >= max||b*|| within any fixed window (max/min GS ratio
        # ~ q after weak reduction): recording a truncated-law row as a
        # sampler result would be wrong, and gating it as a failure would
        # blame the sampler for the instance. The reference's own crypto
        # tables switch to NTRU lattices at these dims for the same reason.
        return {
            "lattice": lat.name, "dimension": lat.n, "sigma": sigma,
            "window": pre.window, "window_clamped": True,
            "skipped": ("window overflow: max/min GS ratio needs a window "
                        f"> {MAX_WINDOW}; basis profile unsuitable for "
                        "lattice-Gaussian sampling at this sigma"),
        }
    block = min(64, lat.n)
    B = min(cfg.n_chains, max(256, (1 << 20) // lat.n))
    n_steps = int(np.clip(cfg.n_samples // B, 2, max(2, 8192 // lat.n)))
    X0, lw0 = klein_sample_batch_blocked(key, pre, B, block)
    X, lw, acc = imhk_steps_batch_blocked(jax.random.fold_in(key, 1), pre,
                                          X0, lw0, n_steps, block)
    delta = float(spectral_gap_mc(lw0))
    ess0 = float(effective_sample_size(
        jnp.asarray(np.asarray(X)[:, 0], jnp.float64)))
    # per-coordinate law check: for sigma >= eta the coefficient covariance
    # approaches sigma^2 (B^T B)^{-1} (continuous Gaussian in point space),
    # so mean_i emp_std_i / (sigma sqrt(((B^T B)^{-1})_ii)) must sit at 1.
    Bm = np.asarray(lat.basis, dtype=np.float64)
    exp_std = sigma * np.sqrt(np.maximum(
        np.diag(np.linalg.inv(Bm.T @ Bm)), 0.0))
    emp_std = np.asarray(X, dtype=np.float64).std(axis=0)
    std_ratio = float(np.mean(emp_std / np.maximum(exp_std, 1e-300)))
    acceptance = float(acc.mean()) / n_steps
    # gates (load-bearing via the CLI): sigma here is >= 1.05 max||b*||,
    # where IMHK acceptance is near 1 and the covariance model holds
    passed = bool(0.85 <= std_ratio <= 1.15 and acceptance >= 0.5
                  and not pre.clamped)
    return {
        "lattice": lat.name, "dimension": lat.n, "sigma": sigma,
        "window": pre.window, "window_clamped": pre.clamped,
        "acceptance": acceptance,
        "spectral_gap": delta,
        "mixing_time_upper": mixing_time_bounds(delta)["upper"],
        "coeff_std_over_expected": std_ratio,
        "klein_is_exact_proxy": bool(delta > 0.999),
        "passed": passed,
    }


def run_crypto_suite(cfg: Optional[CryptoConfig] = None) -> Dict:
    cfg = cfg or CryptoConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    out_dir = cfg.ensure_output()
    ckpt_path = os.path.join(out_dir, "crypto_checkpoint.json")
    done: Dict[str, Dict] = {}
    if os.path.exists(ckpt_path):  # resume (reference :714-721)
        with open(ckpt_path) as f:
            done = json.load(f)
    key = jax.random.key(cfg.seed)
    suite = build_lattice_suite(cfg, dtype)
    count = 0
    for name, lat in suite.items():
        if name in done:
            continue
        eta = float(smoothing_parameter(lat))
        sigma = max(1.2 * eta, 1.05 * float(jnp.max(lat.gs_norms)))
        done[name] = evaluate_sampler_on(lat, sigma, cfg,
                                         jax.random.fold_in(key, count))
        count += 1
        if count % cfg.checkpoint_every == 0:
            with open(ckpt_path, "w") as f:
                json.dump(done, f, indent=2, default=float)
    with open(os.path.join(out_dir, "crypto_results.json"), "w") as f:
        json.dump(done, f, indent=2, default=float)
    if os.path.exists(ckpt_path):
        os.remove(ckpt_path)
    return done


def sigma_sensitivity(cfg: Optional[CryptoConfig] = None,
                      factors=(0.8, 1.0, 1.2, 1.5, 2.0)) -> List[Dict]:
    """Acceptance/gap vs sigma on an NTRU lattice (reference :462-532)."""
    cfg = cfg or CryptoConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    n = cfg.ntru_n[0]
    lat = ntru_lattice(n, q=cfg.ntru_q, seed=cfg.seed,
                       cache_dir="bench_cache", dtype=dtype)
    base = float(jnp.max(lat.gs_norms))
    key = jax.random.key(cfg.seed)
    out = []
    for f in factors:
        sigma = f * base
        pre = klein_precompute(lat, sigma)
        X0, lw0 = klein_sample_batch_blocked(key, pre, 1024, 64)
        _, _, acc = imhk_steps_batch_blocked(jax.random.fold_in(key, 1), pre,
                                             X0, lw0, 8, 64)
        out.append({"sigma_factor": f, "sigma": sigma,
                    "acceptance": float(acc.mean()) / 8,
                    "spectral_gap": float(spectral_gap_mc(lw0))})
    # regime gate: acceptance must be monotone-ish in sigma (the physical
    # phase behaviour) and near 1 at the widest sigma
    accs = [r["acceptance"] for r in out]
    out.append({"gate": "sigma_monotone",
                "passed": bool(accs[-1] >= accs[0] - 0.05
                               and accs[-1] > 0.8)})
    return out
