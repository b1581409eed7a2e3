"""Per-phase wall-clock attribution + MFU for the fused IMHK Pallas kernel.

Method: ablation differencing. The kernel (`ops/kernels/klein_pallas.py`)
takes a static `ablate` frozenset that removes one phase's work at trace
time; the phase's share of wall-clock is (t_full - t_ablated) / t_full.
Ablated kernels are statistically wrong — they exist only so the compiled
schedule stays realistic while one instruction stream is removed (a real
per-op profile is not available through the remote-tunnel device).

Outputs results/kernel_profile/profile.json and prints a table. The MFU
model counts MXU MAC-equivalents with lane/contraction padding to 128
(v5e MXU executes a (M, K) @ (K, N) pass as M * ceil(K/128) * ceil(N/128)
128x128-tile row-streams), against the v5e bf16 peak of 197 TFLOP/s.

Run on the real chip:  python scripts/profile_kernel.py
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

V5E_PEAK_BF16_FLOPS = 197e12  # 2 * 98.5e12 MACs/s

PHASES = {
    "cross_block_ulo": "no_ulo_cross",    # split residual of the tail dot
    "within_block_split": "no_split_s8",  # K=256->128 within-block coupling
    "cdf_split": "no_split_cdf",          # 2-pass CDF cumsum -> 1-pass
    "cdf_matmul_all": "no_cdf_matmul",    # whole CDF cumsum matmul
    "exp": "no_exp",                      # 1D weight exponentials
    "prng": "no_prng",                    # on-core PRNG draws
    "sample_1d_all": "no_sample",         # entire 1D draw (round(c) only)
}


def cdiv(a, b):
    return -(-a // b)


def mxu_mac_equiv(n, window, tile, split=True):
    """MXU MAC-equivalents per proposed sample (one chain, one proposal),
    counting K padded to 128 and N (=tile) padded to 128."""
    BLOCK, GROUP = 128, 8
    nb = n // BLOCK
    passes = 2 if split else 1
    # cross-block tail: per block (BLOCK, n-hi) @ (n-hi, tile)
    cross = sum(BLOCK * cdiv(n - (bi + 1) * BLOCK, 128) * 128
                for bi in range(nb)) * passes
    # within-block coupling: per group (GROUP, 2*BLOCK or BLOCK) @ (., tile)
    sblk = nb * (BLOCK // GROUP) * GROUP * (2 * BLOCK if split else BLOCK)
    # CDF cumsum: per row (window, 2*window or window) @ (., tile)
    kcdf = cdiv(2 * window if split else window, 128) * 128
    cdf = n * window * kcdf
    return (cross + sblk + cdf) / 1.0  # per tile lane-column; N padding ~0


def bench_variant(pre, B, tile, n_steps, ablate, key, reps=3):
    import jax
    import jax.numpy as jnp
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        imhk_steps_batch_pallas,
        klein_sample_batch_pallas,
    )

    coeffs, log_ws = klein_sample_batch_pallas(key, pre, B, tile=tile)
    out = imhk_steps_batch_pallas(jax.random.fold_in(key, 1), pre, coeffs,
                                  log_ws, n_steps, tile=tile, ablate=ablate)
    float(jnp.sum(out[1]))  # scalar pull (block_until_ready can under-wait)
    coeffs, log_ws, _ = out
    t0 = time.perf_counter()
    for r in range(reps):
        coeffs, log_ws, acc = imhk_steps_batch_pallas(
            jax.random.fold_in(key, 2 + r), pre, coeffs, log_ws, n_steps,
            tile=tile, ablate=ablate)
        float(jnp.sum(log_ws))
    dt = time.perf_counter() - t0
    return B * n_steps * reps / dt


SMK_PHASES = {
    # whole reverse pass (reverse log-normalizers + target quadratics)
    "reverse_pass_all": "no_reverse",
    # just the target-quadratic accumulation inside the reverse pass
    "reverse_quad": "no_quad",
    # the (U y~new) byproduct bookkeeping in the forward sweep
    "ctn_byproduct": "no_ctn",
    "cdf_matmul_all": "no_cdf_matmul",
    "exp": "no_exp",
    "prng": "no_prng",
    "sample_1d_all": "no_sample",
}


def bench_variant_smk(pre, B, n_steps, ablate, key, reps=3, tile=0):
    import jax
    import jax.numpy as jnp
    from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
        klein_sample_batch_pallas,
    )
    from lattice_gaussian_mcmc_tpu.ops.kernels.smk_pallas import (
        smk_steps_batch_pallas,
    )

    X, _ = klein_sample_batch_pallas(key, pre, B, tile=2048)
    out = smk_steps_batch_pallas(jax.random.fold_in(key, 1), pre, X,
                                 n_steps, tile=tile, ablate=ablate)
    float(jnp.sum(out[1]))
    X = out[0]
    t0 = time.perf_counter()
    for r in range(reps):
        X, acc = smk_steps_batch_pallas(jax.random.fold_in(key, 2 + r), pre,
                                        X, n_steps, tile=tile, ablate=ablate)
        float(jnp.sum(acc))
    dt = time.perf_counter() - t0
    return B * n_steps * reps / dt


def profile_smk():
    """Ablation profile of the fused SMK kernel at the bench SMK-row
    config (hard-regime NTRU-512; VERDICT r4 next-step #4: explain the
    ~20% gap between the measured rate and the ~1.5-IMHK-sweep cost
    model in smk_pallas.py's docstring)."""
    import jax
    import jax.numpy as jnp

    from lattice_gaussian_mcmc_tpu.lattices import ntru_lattice
    from lattice_gaussian_mcmc_tpu.samplers import klein_precompute

    n_ring = int(os.environ.get("PROF_N", "512"))
    B = int(os.environ.get("PROF_SMK_CHAINS", "131072"))
    n_steps = int(os.environ.get("PROF_SMK_STEPS", "16"))

    lat = ntru_lattice(n_ring, q=12289, seed=0, cache_dir="bench_cache",
                       dtype=jnp.float32)
    sigma_hard = 0.45 * float(jnp.max(lat.gs_norms))
    budget = float(os.environ.get("PROF_TAIL_BUDGET", "0.01"))
    pre = klein_precompute(lat, sigma_hard, tau=4.4,
                           tail_budget=budget if budget > 0 else None)
    n = 2 * n_ring
    print(f"SMK profile: n={n} B={B} n_steps={n_steps}", flush=True)

    key = jax.random.key(0)
    out_dir = pathlib.Path("results/kernel_profile")
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "smk_profile.json"
    results = {}
    if out_path.exists():
        try:
            results = json.loads(out_path.read_text())
        except json.JSONDecodeError:
            results = {}
    if results.get("B") != B or results.get("n_steps") != n_steps:
        results = {}
    results.update({"n": n, "B": B, "n_steps": n_steps,
                    "sigma_over_max_gs": 0.45,
                    "device": str(jax.devices()[0]).replace(" ", "_")})
    results.setdefault("phases", {})

    def flush():
        out_path.write_text(json.dumps(results, indent=2))

    if "full_steps_per_sec" not in results:
        sps = bench_variant_smk(pre, B, n_steps, frozenset(), key)
        results["full_steps_per_sec"] = round(sps, 1)
        flush()
    sps_full = results["full_steps_per_sec"]
    print(f"full: {sps_full/1e6:.3f} M steps/s", flush=True)

    for name, flag in SMK_PHASES.items():
        if name in results["phases"]:
            continue
        sps = bench_variant_smk(pre, B, n_steps, frozenset([flag]), key)
        share = max(0.0, 1.0 - sps_full / sps)
        results["phases"][name] = {
            "steps_per_sec": round(sps, 1),
            "time_share_removed": round(share, 4)}
        print(f"{name:22s}: {sps/1e6:8.3f} M/s  -> phase share "
              f"{100*share:5.1f}%", flush=True)
        flush()
    print(f"wrote {out_path}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lattice_gaussian_mcmc_tpu.lattices import ntru_lattice
    from lattice_gaussian_mcmc_tpu.lattices.qary import falcon_parameters
    from lattice_gaussian_mcmc_tpu.samplers import klein_precompute

    n_ring = int(os.environ.get("PROF_N", "512"))
    B = int(os.environ.get("PROF_CHAINS", "131072"))
    tile = int(os.environ.get("PROF_TILE", "4096"))
    n_steps = int(os.environ.get("PROF_STEPS", "16"))

    lat = ntru_lattice(n_ring, q=12289, seed=0, cache_dir="bench_cache",
                       dtype=jnp.float32)
    sigma = falcon_parameters(512)["sigma"]
    # same window policy as the bench (PROF_TAIL_BUDGET=0 -> tau rule)
    budget = float(os.environ.get("PROF_TAIL_BUDGET", "0.01"))
    pre = klein_precompute(lat, sigma, tau=4.4,
                           tail_budget=budget if budget > 0 else None)
    n, window = 2 * n_ring, pre.window
    print(f"n={n} window={window} B={B} tile={tile} n_steps={n_steps}")

    key = jax.random.key(0)
    out_dir = pathlib.Path("results/kernel_profile")
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "profile.json"
    # resumable: each variant is flushed to disk as soon as it is measured,
    # so a timed-out run continues where it left off
    results = {}
    if out_path.exists():
        try:
            results = json.loads(out_path.read_text())
        except json.JSONDecodeError:
            results = {}
    if (results.get("B") != B or results.get("n_steps") != n_steps
            or results.get("window") != window
            or results.get("tile") != tile):
        results = {}
    results.update({"n": n, "window": window, "B": B, "tile": tile,
                    "n_steps": n_steps,
                    "device": str(jax.devices()[0]).replace(" ", "_")})
    results.setdefault("phases", {})

    def flush():
        out_path.write_text(json.dumps(results, indent=2))

    if "full_samples_per_sec" not in results:
        sps_full = bench_variant(pre, B, tile, n_steps, frozenset(), key)
        results["full_samples_per_sec"] = round(sps_full, 1)
        flush()
    sps_full = results["full_samples_per_sec"]
    print(f"full: {sps_full/1e6:.3f} M samples/s", flush=True)

    phases = results["phases"]
    for name, flag in PHASES.items():
        if name in phases:
            continue
        sps = bench_variant(pre, B, tile, n_steps, frozenset([flag]), key)
        share = max(0.0, 1.0 - sps_full / sps)
        phases[name] = {"samples_per_sec": round(sps, 1),
                        "time_share_removed": round(share, 4)}
        print(f"{name:22s}: {sps/1e6:8.3f} M/s  -> phase share "
              f"{100*share:5.1f}%", flush=True)
        flush()

    # MFU: useful (unsplit, K unpadded) vs issued (split, K padded) MACs
    macs_issued = mxu_mac_equiv(n, window, tile, split=True)
    macs_useful_unpadded = (
        sum(128 * (n - (bi + 1) * 128) for bi in range(n // 128))
        + (n // 128) * 16 * 8 * 128 + n * window * window)
    flops_issued = 2 * macs_issued * sps_full
    flops_useful = 2 * macs_useful_unpadded * sps_full
    results["mfu"] = {
        "macs_issued_per_sample": int(macs_issued),
        "macs_useful_per_sample": int(macs_useful_unpadded),
        "tflops_issued": round(flops_issued / 1e12, 2),
        "tflops_useful": round(flops_useful / 1e12, 2),
        "mfu_issued_vs_peak": round(flops_issued / V5E_PEAK_BF16_FLOPS, 4),
        "mfu_useful_vs_peak": round(flops_useful / V5E_PEAK_BF16_FLOPS, 4),
        "peak_bf16_tflops": V5E_PEAK_BF16_FLOPS / 1e12,
    }
    print(json.dumps(results["mfu"], indent=2), flush=True)
    flush()
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    if os.environ.get("PROF_SMK", "0") == "1":
        profile_smk()
    else:
        main()
