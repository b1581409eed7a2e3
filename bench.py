"""Flagship benchmark: IMHK sampling throughput on an n=512 NTRU lattice
(dimension 1024) — the BASELINE.json headline metric.

Reference baseline: 1.0 ms/IMHK-sample at NTRU-512 (dim 1024) on one CPU core
(paper/tables/example_table_1_cryptographic_benchmarks.tex) => 1000 samples/s.
vs_baseline = our samples/s / 1000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lattice_gaussian_mcmc_tpu.lattices import ntru_lattice
    from lattice_gaussian_mcmc_tpu.lattices.qary import falcon_parameters
    from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
    from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
        imhk_steps_batch_blocked,
        klein_sample_batch_blocked,
    )
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        imhk_steps_batch_pallas,
        klein_sample_batch_pallas,
        pallas_supported,
    )

    n_ring = int(os.environ.get("BENCH_N", "512"))
    n_chains = int(os.environ.get("BENCH_CHAINS", "524288"))
    n_steps = int(os.environ.get("BENCH_STEPS", "16"))
    block = int(os.environ.get("BENCH_BLOCK", "32"))
    tile = int(os.environ.get("BENCH_TILE", "4096"))
    impl = os.environ.get("BENCH_IMPL",
                          "pallas" if pallas_supported() else "blocked")

    lat = ntru_lattice(n_ring, q=12289, seed=0, cache_dir="bench_cache",
                       dtype=jnp.float32)
    if n_ring >= 256:
        sigma = falcon_parameters(1024 if n_ring >= 1024 else 512)["sigma"]
    else:
        sigma = 1.3 * float(jnp.max(lat.gs_norms))
    pre = klein_precompute(lat, sigma)

    key = jax.random.key(0)
    if impl == "pallas":
        coeffs, log_ws = klein_sample_batch_pallas(key, pre, n_chains,
                                                   tile=tile)

        def run(k, c, lw):
            return imhk_steps_batch_pallas(k, pre, c, lw, n_steps, tile=tile)
    else:
        coeffs, log_ws = klein_sample_batch_blocked(key, pre, n_chains, block)

        def run(k, c, lw):
            return imhk_steps_batch_blocked(k, pre, c, lw, n_steps, block)

    # warmup / compile
    t0 = time.perf_counter()
    out = run(jax.random.fold_in(key, 1), coeffs, log_ws)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    coeffs, log_ws, _ = out

    # timed runs
    t0 = time.perf_counter()
    n_rep = 3
    acc_total = 0.0
    for r in range(n_rep):
        coeffs, log_ws, acc = run(jax.random.fold_in(key, 2 + r), coeffs,
                                  log_ws)
        acc_total += float(jnp.sum(acc))
    jax.block_until_ready(coeffs)
    dt = time.perf_counter() - t0

    total_samples = n_chains * n_steps * n_rep
    sps = total_samples / dt
    acc = acc_total / total_samples

    # ESS-rate estimate for an independence MH chain: lag-1 autocorrelation
    # ~ rejection rate r, so ESS/sample ~ (1-r)/(1+r) = a/(2-a).
    ess_rate = sps * acc / (2.0 - acc)
    result = {
        "metric": f"imhk_samples_per_sec_ntru{n_ring}",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / 1000.0, 2),
        "acceptance_rate": round(acc, 4),
        "ess_per_sec_est": round(ess_rate, 1),
        "n_chains": n_chains,
        "dim": 2 * n_ring,
        "sigma": sigma,
        "impl": impl,
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]).replace(" ", "_"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
