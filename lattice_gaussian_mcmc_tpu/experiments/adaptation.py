"""BASELINE config 4 end-to-end: symmetric Metropolis-Klein with sigma
adaptation on an NTRU lattice.

The chain is the Wang-Ling symmetric Metropolis-Klein variant (Klein
proposal centered at the current point); the adapted parameter is the
proposal width sigma_prop, driven by Robbins-Monro on *windowed pooled
acceptance* across the whole chain batch (SURVEY.md section 7 "MH
acceptance under vmap"; reference adaptation analogue
src/samplers/klein.py:273-302, MH semantics src/samplers/imhk.py:141-177).
On TPU every window runs through the fused SMK Pallas kernel
(ops/kernels/smk_pallas.py, validated by scripts/validate_pallas_scale.py
--smk); off-TPU the vmapped XLA `smk_step` path runs the identical math.

Gates (load-bearing):
  - converged: pooled acceptance of the last window within +-0.08 of the
    target,
  - responsive: the adapted sigma_prop actually moved the acceptance
    monotonically in the right direction (acceptance at 2x the adapted
    width is lower, at 0.5x higher — the RWM acceptance curve),
  - stationary width: the last-3-window sigma_prop spread is < 20%.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.experiments.configs import ExperimentConfig


@dataclass
class AdaptationConfig(ExperimentConfig):
    ntru_n: int = 512                # ring degree (lattice dim = 2n)
    ntru_q: int = 12289
    sigma_factor: float = 1.0        # target sigma = factor * max||b*_i||
    target_acceptance: float = 0.45
    n_chains: int = 65536
    n_windows: int = 16
    window_steps: int = 8
    # diminishing adaptation: after `warmup_windows` the per-window step
    # count jumps once to `max_window_steps` (see adapt_sigma_smk —
    # exactly two fused executables, so the uncacheable ~20 s Mosaic
    # compiles stay bounded)
    grow_windows: bool = True
    warmup_windows: int = 5
    max_window_steps: int = 256
    output_dir: str = "results/adaptation"
    cache_dir: str = "bench_cache"


def _probe_acceptance(key, lattice, sigma, sigma_prop, n_chains, steps,
                      backend_pallas: bool):
    """Pooled SMK acceptance at a FIXED proposal width (fresh Klein init)."""
    from lattice_gaussian_mcmc_tpu.ops.kernels.smk_pallas import (
        smk_steps_batch_pallas,
    )
    from lattice_gaussian_mcmc_tpu.samplers.adaptation import _smk_window_xla
    from lattice_gaussian_mcmc_tpu.samplers.klein import klein_precompute
    from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
        klein_sample_batch_blocked,
    )
    pre_t = klein_precompute(lattice, sigma)
    X, _ = klein_sample_batch_blocked(key, pre_t, n_chains, 32)
    if backend_pallas:
        _, acc = smk_steps_batch_pallas(jax.random.fold_in(key, 1), pre_t,
                                        X.astype(jnp.float32), steps,
                                        sigma_prop=sigma_prop)
        return float(jnp.mean(acc)) / steps
    pre_h = pre_t.replace(sigmas=jnp.asarray(sigma_prop, pre_t.U.dtype) /
                          jnp.diagonal(lattice.R))
    _, acc = _smk_window_xla(jax.random.fold_in(key, 1), pre_h, lattice.Q,
                             lattice.R, X, steps)
    return float(acc)


def run_adaptation(cfg: Optional[AdaptationConfig] = None) -> Dict:
    from lattice_gaussian_mcmc_tpu.lattices import ntru_lattice
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        pallas_supported,
    )
    from lattice_gaussian_mcmc_tpu.samplers.adaptation import adapt_sigma_smk

    cfg = cfg or AdaptationConfig()
    cfg.dump("adaptation")
    dtype = jnp.float32
    lat = ntru_lattice(cfg.ntru_n, q=cfg.ntru_q, seed=cfg.seed,
                       cache_dir=cfg.cache_dir, dtype=dtype)
    sigma = cfg.sigma_factor * float(jnp.max(lat.gs_norms))
    key = jax.random.key(cfg.seed)
    use_pallas = pallas_supported() and cfg.n_chains % 256 == 0

    st = adapt_sigma_smk(
        key, lat, sigma, target_acceptance=cfg.target_acceptance,
        n_windows=cfg.n_windows, window_steps=cfg.window_steps,
        n_chains=cfg.n_chains,
        backend="pallas" if use_pallas else "xla",
        grow_windows=cfg.grow_windows,
        warmup_windows=cfg.warmup_windows,
        max_window_steps=cfg.max_window_steps)

    final = st.history[-1]
    sigma_star = final["sigma_prop"]
    acc_star = final["acceptance"]
    # RWM response curve: acceptance must fall when the width doubles and
    # rise when it halves (probed with fresh batches at fixed widths)
    k_probe = jax.random.fold_in(key, 0xbeef)
    acc_2x = _probe_acceptance(k_probe, lat, sigma, 2.0 * sigma_star,
                               cfg.n_chains, cfg.window_steps, use_pallas)
    acc_half = _probe_acceptance(jax.random.fold_in(k_probe, 1), lat, sigma,
                                 0.5 * sigma_star, cfg.n_chains,
                                 cfg.window_steps, use_pallas)
    tail = [h["sigma_prop"] for h in st.history[-3:]]
    spread = (max(tail) - min(tail)) / max(sigma_star, 1e-12)
    gates = {
        "converged_to_target": bool(
            abs(acc_star - cfg.target_acceptance) <= 0.08),
        "acceptance_monotone_in_width": bool(
            acc_2x < acc_star < acc_half),
        "width_stationary": bool(spread < 0.20),
    }
    payload = {
        "lattice": {"kind": "ntru", "n_ring": cfg.ntru_n,
                    "dim": 2 * cfg.ntru_n, "q": cfg.ntru_q},
        "sigma_target": sigma,
        "sigma_over_max_gs": cfg.sigma_factor,
        "target_acceptance": cfg.target_acceptance,
        "backend": "pallas" if use_pallas else "xla",
        "rwm_optimal_scaling_start": 2.38 * sigma / math.sqrt(lat.n),
        "history": st.history,
        "sigma_prop_adapted": sigma_star,
        "acceptance_final": acc_star,
        "acceptance_at_2x_width": acc_2x,
        "acceptance_at_half_width": acc_half,
        "samples_per_sec_last_window": final["samples_per_sec"],
        "samples_per_sec_aggregate": cfg.n_chains * sum(
            h["window_steps"] for h in st.history) / max(
            sum(h["window_s"] for h in st.history), 1e-9),
        "window_schedule": [h["window_steps"] for h in st.history],
        "rate_note": ("per-window rates include one host sync + dispatch "
                      "per window; growing windows (diminishing "
                      "adaptation) amortize that to kernel-dominated "
                      "aggregate rates. First window at each new step "
                      "count pays a compile unless the jit cache is warm; "
                      "the fused SMK kernel's steady-state rate is the "
                      "bench.py smk row"),
        "gates": gates,
        "all_passed": bool(all(gates.values())),
    }
    out_dir = cfg.ensure_output()
    with open(os.path.join(out_dir, "adaptation_ntru.json"), "w") as f:
        json.dump(payload, f, indent=2, default=float)
    _plot(st.history, cfg.target_acceptance, out_dir)
    return payload


def _plot(history, target, out_dir: str) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    w = [h["window"] for h in history]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9.2, 3.4))
    ax1.plot(w, [h["acceptance"] for h in history], "o-")
    ax1.axhline(target, ls="--", c="k", lw=1, label="target")
    ax1.set_xlabel("adaptation window")
    ax1.set_ylabel("pooled acceptance")
    ax1.legend()
    ax1.grid(alpha=0.3)
    ax2.semilogy(w, [h["sigma_prop"] for h in history], "s-")
    ax2.set_xlabel("adaptation window")
    ax2.set_ylabel(r"proposal width $\sigma_{prop}$")
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "adaptation_trace.png"), dpi=150)
    plt.close(fig)
