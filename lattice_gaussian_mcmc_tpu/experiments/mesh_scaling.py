"""Mesh scaling-efficiency measurement (SURVEY.md section 5 distributed
backend: "scaling-efficiency measurement at 1 chip / 1 host / N hosts";
target >= 80% efficiency — chains are embarrassingly parallel, only
diagnostics communicate).

On a single-chip environment this runs against a virtual CPU device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N); on a real pod slice
the same code measures ICI/DCN scaling.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.experiments.configs import ExperimentConfig
from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
from lattice_gaussian_mcmc_tpu.parallel import make_mesh, sharded_imhk_chains
from lattice_gaussian_mcmc_tpu.samplers import klein_precompute


def measure_scaling(n: int = 32, chains_per_device: int = 64,
                    n_samples: int = 20, device_counts=None,
                    seed: int = 0) -> List[Dict]:
    """Weak scaling: fixed chains/device, growing device count. Efficiency =
    (throughput at D devices) / (D * throughput at 1 device)."""
    if device_counts is None:
        nd = len(jax.devices())
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= nd]
    rng = np.random.default_rng(seed)
    B = np.triu(rng.uniform(-0.5, 0.5, (n, n))) + np.eye(n)
    np.fill_diagonal(B, 1.0)
    lat = lattice_from_basis(B, dtype=jnp.float32)
    pre = klein_precompute(lat, 1.2)
    key = jax.random.key(seed)

    rows = []
    base_rate = None
    for nd in device_counts:
        mesh = make_mesh(nd)
        n_chains = chains_per_device * nd
        # compile
        out = sharded_imhk_chains(key, pre, n_chains, n_samples, mesh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = sharded_imhk_chains(jax.random.fold_in(key, 1), pre, n_chains,
                                  n_samples, mesh)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rate = n_chains * n_samples / dt
        if base_rate is None:
            base_rate = rate
        rows.append({
            "n_devices": nd,
            "n_chains": n_chains,
            "samples_per_sec": rate,
            "efficiency": rate / (base_rate * nd),
            "acceptance": float(out[2]["acceptance_rate"]),
        })
    return rows


def run_mesh_scaling(cfg: Optional[ExperimentConfig] = None) -> List[Dict]:
    cfg = cfg or ExperimentConfig(output_dir="results/mesh_scaling")
    rows = measure_scaling(seed=cfg.seed)
    out_dir = cfg.ensure_output()
    with open(os.path.join(out_dir, "mesh_scaling.json"), "w") as f:
        json.dump(rows, f, indent=2, default=float)
    return rows
