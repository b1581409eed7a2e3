"""Dimension-scaling analysis: throughput, mixing, 1/delta scaling,
theta products, condition-number sensitivity, and parallel-chain scaling.

Parity: reference `experiments/dimension_scaling.py` (C24) — mixing-time vs
n (:120-306), 1/delta scaling (:308-417), theta-product analysis (:419-518),
condition-number vs performance (:520-613), asymptotics (:615-699),
complexity profiling (:701-797), strong/weak parallel-chain scaling
(:801-886 — `multiprocessing.Pool` there; vmap batch + mesh here), and the
extra lattice families Checkerboard D_n / Root A_n (:1261-1363).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.diagnostics import effective_sample_size
from lattice_gaussian_mcmc_tpu.diagnostics.spectral import spectral_gap_mc
from lattice_gaussian_mcmc_tpu.experiments.configs import ScalingConfig
from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
)
from lattice_gaussian_mcmc_tpu.lattices.base import Lattice, smoothing_parameter
from lattice_gaussian_mcmc_tpu.ops.theta import log_rho_Z
from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
    imhk_steps_batch_blocked,
    klein_sample_batch_blocked,
)


# --- extra lattice families (reference :1261-1363) -------------------------


def checkerboard_lattice(n: int, dtype=None) -> Lattice:
    """D_n = {x in Z^n : sum x_i even}; basis columns e_i + e_{i+1} and 2 e_n
    variant (det 2)."""
    B = np.zeros((n, n))
    for i in range(n - 1):
        B[i, i] = 1.0
        B[i + 1, i] = 1.0
    B[0, n - 1] = 2.0
    return lattice_from_basis(B, name=f"D_{n}", meta={"kind": "checkerboard"},
                              dtype=dtype)


def root_lattice_an(n: int, dtype=None) -> Lattice:
    """A_n root lattice embedded in n dims via the basis of simple roots
    expressed in the hyperplane coordinates (Gram = Cartan matrix)."""
    # Cholesky of the Cartan matrix gives a valid geometric basis
    cartan = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    L = np.linalg.cholesky(cartan)
    return lattice_from_basis(L.T, name=f"A_{n}", meta={"kind": "root_an"},
                              dtype=dtype)


# --- analyses --------------------------------------------------------------


def throughput_vs_dimension(cfg: Optional[ScalingConfig] = None) -> List[Dict]:
    """Klein samples/s vs n (complexity profiling, reference :701-797)."""
    cfg = cfg or ScalingConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    key = jax.random.key(cfg.seed)
    out = []
    B = 4096
    for n in cfg.dimensions:
        lat = identity_lattice(n, dtype=dtype)
        pre = klein_precompute(lat, 2.0 * float(smoothing_parameter(lat)))
        block = min(32, n)

        def run(k):
            return klein_sample_batch_blocked(k, pre, B, block)

        jax.block_until_ready(run(key))  # compile
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            X, lw = run(jax.random.fold_in(key, r))
        jax.block_until_ready(X)
        dt = time.perf_counter() - t0
        out.append({"dimension": n, "samples_per_sec": B * reps / dt,
                    "sec_per_sample": dt / (B * reps)})
    return out


def inverse_delta_scaling(cfg: Optional[ScalingConfig] = None) -> List[Dict]:
    """Spectral gap delta vs n on progressively skewed bases
    (reference :308-417)."""
    cfg = cfg or ScalingConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    key = jax.random.key(cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    out = []
    for n in [d for d in cfg.dimensions if d <= 128]:
        Bm = np.triu(rng.uniform(-0.5, 0.5, (n, n))) + np.eye(n)
        np.fill_diagonal(Bm, 1.0)
        lat = lattice_from_basis(Bm, dtype=dtype)
        sigma = 0.45  # below eta: the regime where delta < 1
        pre = klein_precompute(lat, sigma)
        _, lw = klein_sample_batch_blocked(key, pre, 4096, min(32, n))
        delta = float(spectral_gap_mc(lw))
        out.append({"dimension": n, "delta": delta,
                    "inv_delta": 1.0 / max(delta, 1e-12)})
    return out


def theta_product_analysis(sigmas=(0.5, 1.0, 2.0, 4.0),
                           dims=(16, 64, 256, 1024)) -> List[Dict]:
    """Product of per-coordinate rho_sigma(Z) = Z^n partition function
    (reference :419-518)."""
    out = []
    for n in dims:
        for s in sigmas:
            lz = float(log_rho_Z(jnp.asarray(s, jnp.float32)))
            out.append({"dimension": n, "sigma": s,
                        "log_partition": n * lz,
                        "log_partition_per_dim": lz})
    return out


def condition_number_sensitivity(cfg: Optional[ScalingConfig] = None) -> List[Dict]:
    """Acceptance/gap vs basis condition number (reference :520-613)."""
    cfg = cfg or ScalingConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    key = jax.random.key(cfg.seed)
    n = 32
    out = []
    for skew in (0.0, 0.3, 0.6, 0.9):
        rng = np.random.default_rng(cfg.seed)
        Bm = np.triu(rng.uniform(-skew, skew, (n, n))) + np.eye(n)
        np.fill_diagonal(Bm, 1.0)
        lat = lattice_from_basis(Bm, dtype=dtype)
        cond = float(np.linalg.cond(Bm))
        pre = klein_precompute(lat, 0.45)
        X0, lw0 = klein_sample_batch_blocked(key, pre, 2048, 32)
        _, _, acc = imhk_steps_batch_blocked(jax.random.fold_in(key, 1), pre,
                                             X0, lw0, 8, 32)
        out.append({"skew": skew, "condition_number": cond,
                    "acceptance": float(acc.mean()) / 8,
                    "delta": float(spectral_gap_mc(lw0))})
    return out


def parallel_chain_scaling(cfg: Optional[ScalingConfig] = None) -> List[Dict]:
    """Strong scaling over the vmap chain-batch axis (reference :801-886
    measured process counts; here batch sizes — the TPU parallelism axis)."""
    cfg = cfg or ScalingConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    key = jax.random.key(cfg.seed)
    n = 128
    lat = identity_lattice(n, dtype=dtype)
    pre = klein_precompute(lat, 3.0)
    out = []
    base_rate = None
    for B in cfg.n_chains_grid:
        jax.block_until_ready(klein_sample_batch_blocked(key, pre, B, 32))
        t0 = time.perf_counter()
        X, _ = klein_sample_batch_blocked(jax.random.fold_in(key, 1), pre, B, 32)
        jax.block_until_ready(X)
        dt = time.perf_counter() - t0
        rate = B / dt
        if base_rate is None:
            base_rate = rate / B
        out.append({"n_chains": B, "samples_per_sec": rate,
                    "efficiency": rate / (base_rate * B)})
    return out


def asymptotic_analysis(cfg: Optional[ScalingConfig] = None) -> List[Dict]:
    """Asymptotic-dimension analysis (reference :615-797): throughput,
    complexity fit, window size, VMEM-feasibility of the Pallas kernel, and
    host/device memory profile at n in `cfg.asymptotic_dims` (512-2048).

    Uses Z^n so lattice construction stays O(n) and the measurement isolates
    the sampler's own O(n^2)-per-sample scaling; the Pallas kernel's VMEM
    model is U (n^2 f32) + ~6 (n, tile) state/scratch buffers per program.
    """
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        pallas_supported,
    )
    from lattice_gaussian_mcmc_tpu.utils.profiling import memory_snapshot

    cfg = cfg or ScalingConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    key = jax.random.key(cfg.seed)
    on_tpu = pallas_supported()
    out = []
    for n in cfg.asymptotic_dims:
        lat = identity_lattice(n, dtype=dtype)
        sigma = 2.0 * float(smoothing_parameter(lat))
        pre = klein_precompute(lat, sigma)
        # VMEM feasibility at this n: pick the widest power-of-two tile
        # fitting the 100 MB vmem budget, >= 256 lanes. The bf16-split
        # kernel keeps BOTH halves Uh + Ulo resident (8*n*n bytes) plus the
        # (n, 2*128) uw within-block operand — not one (n, n) f32 U.
        budget = 100 * 1024 * 1024
        u_bytes = 8 * n * n + 4 * n * 2 * 128
        tile = 4096
        while tile > 256 and u_bytes + 4 * 6 * n * tile > budget:
            tile //= 2
        feasible = u_bytes + 4 * 6 * n * tile <= budget
        B = 4096
        t0 = time.perf_counter()
        if on_tpu and feasible and n % 128 == 0:
            from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
                klein_sample_batch_pallas,
            )
            # large batch to amortize the ~35 ms remote-dispatch overhead
            B = max(16 * tile, 65_536)
            run = lambda k: klein_sample_batch_pallas(k, pre, B, tile=tile)
            impl = "pallas"
        else:
            run = lambda k: klein_sample_batch_blocked(k, pre, B,
                                                       min(64, n))
            impl = "blocked"
        jax.block_until_ready(run(key))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        X, lw = run(jax.random.fold_in(key, 1))
        jax.block_until_ready(X)
        dt = time.perf_counter() - t0
        row = {"dimension": n, "sigma": sigma, "window": pre.window,
               "impl": impl, "tile": tile if impl == "pallas" else None,
               "vmem_bytes_per_program": u_bytes + 4 * 6 * n * tile,
               "vmem_feasible": bool(feasible),
               "samples_per_sec": B / dt,
               "sec_per_sample": dt / B,
               "compile_s": compile_s}
        row.update(memory_snapshot())
        out.append(row)
    # empirical complexity exponent: sec/sample ~ n^alpha. Cost model,
    # validated by the kernel ablation profile (results/kernel_profile/):
    # the O(n^2) coupling matmuls are nearly FREE on the MXU (removing the
    # whole CDF matmul changes the step by 0.8-4%), while the per-sample
    # cost is dominated by O(n * window) VPU work plus per-dispatch
    # overheads that amortize with n — so between dim 512 and 2048 the
    # measured exponent is SUB-linear (0.55 on v5e), far below the naive
    # n^2 expectation. The gate is a regression tripwire, not an
    # asymptotic claim: alpha must stay in [0.2, 2.6] at production dims
    # (a relayout/recompile pathology shows up as alpha > 2.6; a broken
    # timer as alpha <= 0).
    if len(out) >= 2:
        ls = np.log([r["sec_per_sample"] for r in out])
        ln = np.log([r["dimension"] for r in out])
        alpha = float(np.polyfit(ln, ls, 1)[0])
        lo_band, hi_band = ((0.2, 2.6) if max(r["dimension"] for r in out)
                            >= 512 else (0.0, 3.2))
        for r in out:
            r["complexity_exponent_fit"] = alpha
        out[-1]["complexity_gate"] = [lo_band, hi_band]
        out[-1]["passed"] = bool(lo_band <= alpha <= hi_band)
    return out


def run_scaling(cfg: Optional[ScalingConfig] = None) -> Dict:
    cfg = cfg or ScalingConfig()
    out_dir = cfg.ensure_output()
    results = {
        "throughput": throughput_vs_dimension(cfg),
        "inverse_delta": inverse_delta_scaling(cfg),
        "theta_products": theta_product_analysis(),
        "condition_sensitivity": condition_number_sensitivity(cfg),
        "parallel_chains": parallel_chain_scaling(cfg),
        "asymptotics": asymptotic_analysis(cfg),
    }
    # load-bearing verdict: the complexity-exponent gate plus throughput
    # sanity (every measured rate finite and positive)
    rates_ok = all(np.isfinite(r["samples_per_sec"]) and
                   r["samples_per_sec"] > 0
                   for r in results["throughput"] + results["asymptotics"])
    asym_gates = [r["passed"] for r in results["asymptotics"]
                  if "passed" in r]
    results["all_passed"] = bool(rates_ok and all(asym_gates))
    with open(os.path.join(out_dir, "dimension_scaling.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results
