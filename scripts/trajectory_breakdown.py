"""Decompose the trajectory-mode throughput gap (VERDICT r3 weak #3).

At dim 2048 the r3 falcon bench measured trajectory mode at 200k samples/s
vs 2.08M state-only — 10x — with no attribution. This script separates, at
dim 1024 and 2048:

  1. state-only fused rate (no ring) — the kernel ceiling,
  2. trajectory KERNEL rate: dispatch timed to completion via a scalar
     pull of the final-state output (one XLA executable -> forces the ring
     DMAs too) WITHOUT copying the ring to host,
  3. ring readback time: np.asarray(traj_lw) after completion (the
     tunneled host link moves ~10 MB/s),

for the lw-only ring and (smaller B) the coeff ring. Writes
results/kernel_profile/trajectory_breakdown.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402


def measure(n_ring: int, B: int, T: int, tile: int, reps: int = 3):
    import jax
    import jax.numpy as jnp
    from lattice_gaussian_mcmc_tpu.lattices import ntru_lattice
    from lattice_gaussian_mcmc_tpu.lattices.qary import falcon_parameters
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        imhk_steps_batch_pallas,
        imhk_trajectory_pallas,
        klein_sample_batch_pallas,
    )
    from lattice_gaussian_mcmc_tpu.samplers import klein_precompute

    lat = ntru_lattice(n_ring, q=12289, seed=0, cache_dir="bench_cache",
                       dtype=jnp.float32)
    sigma = 0.45 * float(jnp.max(lat.gs_norms))
    pre = klein_precompute(lat, sigma)
    key = jax.random.key(0)
    X, lw = klein_sample_batch_pallas(key, pre, B, tile=tile)
    acc0 = jnp.zeros((B,), jnp.float32)

    out = {"n_ring": n_ring, "dim": 2 * n_ring, "B": B, "T": T,
           "tile": tile, "sigma_over_max_gs": 0.45}

    # 1. state-only fused ceiling (T steps in one dispatch)
    X, lw, _ = imhk_steps_batch_pallas(jax.random.fold_in(key, 1), pre, X,
                                       lw, T, tile=tile,
                                       steps_per_dispatch=T)  # compile
    float(jnp.sum(lw))
    rates = []
    for r in range(reps):
        t0 = time.perf_counter()
        X, lw, _ = imhk_steps_batch_pallas(jax.random.fold_in(key, 2 + r),
                                           pre, X, lw, T, tile=tile,
                                           steps_per_dispatch=T)
        float(jnp.sum(lw))
        rates.append(B * T / (time.perf_counter() - t0))
    out["state_only_msps"] = round(max(rates) / 1e6, 3)

    # 2+3. lw-only trajectory: kernel completion vs ring readback
    Xt, lwt, _, _, tlw = imhk_trajectory_pallas(
        jax.random.fold_in(key, 50), pre, X, lw, acc0, n_keep=T, thin=1,
        tile=tile, traj_coeffs=False)  # compile
    float(jnp.sum(lwt))
    k_rates, rb_times = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        Xt, lwt, _, _, tlw = imhk_trajectory_pallas(
            jax.random.fold_in(key, 51 + r), pre, X, lw, acc0, n_keep=T,
            thin=1, tile=tile, traj_coeffs=False)
        float(jnp.sum(lwt))  # forces the WHOLE executable incl. ring DMAs
        t1 = time.perf_counter()
        _ = np.asarray(tlw)  # host readback of the (T, B) ring
        rb_times.append(time.perf_counter() - t1)
        k_rates.append(B * T / (t1 - t0))
    out["traj_lw_kernel_msps"] = round(max(k_rates) / 1e6, 3)
    out["traj_lw_ring_mb"] = round(tlw.size * 4 / 1e6, 1)
    out["traj_lw_readback_s"] = round(min(rb_times), 2)
    out["traj_lw_end_to_end_msps"] = round(
        B * T / (B * T / max(k_rates) + min(rb_times)) / 1e6, 3)

    # coeff-ring variant at a budgeted batch (ring = T*n*Bc*4 bytes)
    Bc = max(tile, min(B, (256 << 20) // (T * 2 * n_ring * 4) // tile * tile))
    if Bc >= tile:
        Xc, lwc = X[:Bc], lw[:Bc]
        acc_c = jnp.zeros((Bc,), jnp.float32)
        Xt, lwt, _, traj, tlw = imhk_trajectory_pallas(
            jax.random.fold_in(key, 80), pre, Xc, lwc, acc_c, n_keep=T,
            thin=1, tile=tile, traj_coeffs=True)
        float(jnp.sum(lwt))
        t0 = time.perf_counter()
        Xt, lwt, _, traj, tlw = imhk_trajectory_pallas(
            jax.random.fold_in(key, 81), pre, Xc, lwc, acc_c, n_keep=T,
            thin=1, tile=tile, traj_coeffs=True)
        float(jnp.sum(lwt))
        t1 = time.perf_counter()
        out["traj_coeff_B"] = Bc
        out["traj_coeff_kernel_msps"] = round(Bc * T / (t1 - t0) / 1e6, 3)
        out["traj_coeff_ring_mb"] = round(traj.size * 4 / 1e6, 1)
    return out


def main():
    import jax
    if jax.devices()[0].platform != "tpu":
        print("needs TPU", file=sys.stderr)
        return 2
    rows = [
        measure(512, B=131072, T=48, tile=4096),
        measure(1024, B=131072, T=48, tile=1024),
    ]
    payload = {
        "rows": rows,
        "note": ("kernel rates timed by scalar-pulling the final-state "
                 "output (forces ring DMAs; one executable); readback is "
                 "np.asarray of the HBM ring over the tunneled host link"),
    }
    out_dir = os.path.join(REPO, "results", "kernel_profile")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "trajectory_breakdown.json"), "w") as f:
        json.dump(payload, f, indent=2, default=float)
    print(json.dumps(payload, indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
