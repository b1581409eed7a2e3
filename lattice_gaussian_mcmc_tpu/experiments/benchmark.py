"""Performance benchmark suite across algorithms x lattices x dimensions.

Parity: reference `experiments/scripts/benchmark_performance.py` (C29):
sampling benchmarks with warmup + timing percentiles (:151-309), reduction
benchmarks (:195-364), result tables (:449-623). Times are wall-clock over
jitted batched runs on whatever backend is active (TPU under axon, CPU in
tests).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.experiments.configs import BenchmarkConfig
from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
    qary_lattice,
)
from lattice_gaussian_mcmc_tpu.lattices.identity import sample_zn
from lattice_gaussian_mcmc_tpu.samplers import (
    PeikertSampler,
    klein_precompute,
)
from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
    imhk_steps_batch_blocked,
    klein_sample_batch_blocked,
)
from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (
    imhk_steps_batch_pallas,
    klein_sample_batch_pallas,
    pallas_supported,
)


def _force(out) -> float:
    """Force completion with a SCALAR PULL: on the tunneled TPU,
    block_until_ready has been observed to return before the computation
    finishes (bench.py documents the same; measured 140x rate inflation
    on the microbench). A tiny slice-sum of the first output leaf cannot
    materialize until its producing executable completes."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:8]))


def _time_fn(fn, warmup: int, runs: int) -> Dict[str, float]:
    for _ in range(warmup):
        _force(fn())
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(fn())
        times.append(time.perf_counter() - t0)
    arr = np.array(times)
    return {"mean_s": float(arr.mean()), "p50_s": float(np.percentile(arr, 50)),
            "min_s": float(arr.min()), "max_s": float(arr.max())}


def bench_algorithm(algorithm: str, n: int, cfg: BenchmarkConfig,
                    key=None) -> Optional[Dict]:
    """One (algorithm, dimension) cell. Returns None if the combination is
    not applicable (e.g. Peikert needs sigma >= r s1)."""
    if key is None:
        key = jax.random.key(cfg.seed)
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    B = cfg.n_chains
    n_samples = cfg.n_samples

    # Peikert validity note (kept in the row output): Peikert requires
    # sigma >= r * s1(B) (spectral norm), which at crypto parameters is far
    # above the Klein/IMHK operating point sigma ~ 1.3 max||b*|| — e.g. on
    # NTRU-512 s1(B)/max||b*|| ~ 3-4x and r = eta(Z) ~ 4.6, so Peikert
    # cannot run at the FALCON sigma at all (that is WHY Klein is the
    # crypto workhorse). Large-dim Peikert rows therefore benchmark at the
    # algorithm's own minimal valid sigma (1.05 r s1), marked in the row.
    peikert_sigma_floor = None

    if algorithm == "direct":
        lat = identity_lattice(n, dtype=dtype)
        sigma = 5.0
        if pallas_supported() and (B * n) % 262144 == 0:
            from lattice_gaussian_mcmc_tpu.ops.kernels.zn_pallas import (
                sample_zn_pallas)
            from lattice_gaussian_mcmc_tpu.ops.kernels.peikert_pallas import (
                suggest_peikert_window)
            # budget window policy on the constant profile (the kernel's
            # old fixed window 64 left ~25% draw throughput on the table)
            zn_window = suggest_peikert_window(sigma, n)

            def run(k=key):
                return sample_zn_pallas(k, B * n, sigma,
                                        window=zn_window).reshape(B, n)
        else:
            def run(k=key):
                return sample_zn(k, n=n, sigma=sigma, shape=(B,))
    elif algorithm in ("klein", "imhk", "peikert") and n >= 256:
        # q-ary bases at these dims keep unit Gram-Schmidt tails even after
        # LLL (min||b*|| = 1 while sigma ~ 1.5 q), which needs an enormous 1D
        # window; the reference's own large-dim Klein/IMHK benchmarks use
        # NTRU lattices (balanced profile) — do the same
        from lattice_gaussian_mcmc_tpu.lattices import ntru_lattice
        lat = ntru_lattice(n // 2, q=12289, seed=cfg.seed,
                           cache_dir="bench_cache", dtype=dtype)
        sigma = 1.3 * float(jnp.max(lat.gs_norms))
        if algorithm == "peikert":
            # Peikert's own minimal valid sigma (see the note above)
            from lattice_gaussian_mcmc_tpu.ops.theta import (
                smoothing_parameter_zn,
            )
            s1 = float(jnp.linalg.norm(lat.basis, ord=2))
            peikert_sigma_floor = (1.05 * smoothing_parameter_zn(n, 0.01)
                                   * s1)
            sigma = max(sigma, peikert_sigma_floor)
    else:
        lat = qary_lattice(n, n // 2, q=3329, seed=cfg.seed, dtype=dtype)
        from lattice_gaussian_mcmc_tpu.reduction import lll_reduce
        if n <= 512:  # incremental-GSO native LLL: ~9 s at 256, ~94 s at 512
            lat = lattice_from_basis(lll_reduce(np.asarray(lat.basis)),
                                     name=lat.name + "-lll", dtype=dtype)
        sigma = 1.5 * float(jnp.max(lat.gs_norms))
    peikert_batch = None
    per_batch_override = None
    if algorithm != "direct":
        # bench window policy: total-tail-budget (see suggest_window_budget
        # and bench.py) — same validated law as the flagship bench rows
        pre = klein_precompute(lat, sigma, tail_budget=1e-2)
        # speed-of-light Pallas path on TPU; blocked XLA elsewhere. A batch
        # no tile divides falls back to the blocked XLA path rather than
        # crashing on max() of an empty sequence.
        tile = max((t for t in (256, 512, 1024, 2048, 4096) if B % t == 0),
                   default=0)
        use_pallas = pallas_supported() and tile > 0
        if algorithm == "klein":
            if use_pallas:
                # k-draws-per-dispatch ring kernel: 8 independent Klein
                # batches per dispatch (same dispatch amortization the
                # IMHK rows get; VERDICT r4 next-step #3)
                from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas \
                    import klein_sample_ring_pallas
                klein_rounds = 8

                def run(k=key):
                    return klein_sample_ring_pallas(k, pre, B,
                                                    n_rounds=klein_rounds,
                                                    tile=tile)
                per_batch_override = B * klein_rounds
            else:
                def run(k=key):
                    return klein_sample_batch_blocked(k, pre, B, cfg.block)
        elif algorithm == "imhk":
            # 16 MCMC steps per timed dispatch: at 65k chains a 4-step
            # dispatch was ~45% tunnel-dispatch overhead, understating the
            # kernel (the flagship bench runs 64; same amortization idea)
            imhk_steps = 16
            if use_pallas:
                X0, lw0 = klein_sample_batch_pallas(key, pre, B, tile=tile)

                def run(k=key, X0=X0, lw0=lw0):
                    return imhk_steps_batch_pallas(k, pre, X0, lw0,
                                                   imhk_steps, tile=tile)
            else:
                X0, lw0 = klein_sample_batch_blocked(key, pre, B, cfg.block)

                def run(k=key, X0=X0, lw0=lw0):
                    return imhk_steps_batch_blocked(k, pre, X0, lw0,
                                                    imhk_steps, cfg.block)
            per_batch_override = B * imhk_steps
        elif algorithm == "peikert":
            try:
                s = PeikertSampler(lat, 2.0 * sigma *
                                   float(jnp.linalg.norm(lat.basis, ord=2)) /
                                   float(jnp.max(lat.gs_norms)))
            except ValueError:
                return None
            if use_pallas and n >= 128:
                # fused kernel: VMEM-resident L2 + on-core Box-Muller +
                # windowed inverse-CDF rounding, n_rounds independent
                # batches per dispatch — never materializes (B, n, window)
                # and needs no batch cap (VERDICT r4 next-step #2).
                # n >= 128 only: Mosaic's remote compile hangs
                # indefinitely on this kernel at sub-MXU operand sizes
                # (observed at n=16; scripts/peikert_microbench.py)
                from lattice_gaussian_mcmc_tpu.ops.kernels.peikert_pallas \
                    import peikert_rounds_pallas, suggest_peikert_window
                pk_window = suggest_peikert_window(float(s.pre.r), n)
                pk_rounds = 8

                def run(k=key, s=s):
                    return peikert_rounds_pallas(k, s.pre, B,
                                                 n_rounds=pk_rounds,
                                                 window=pk_window, tile=tile)
                per_batch_override = B * pk_rounds
            else:
                # the XLA fallback materializes (B, n, window) f32 logits;
                # cap the batch so that tensor stays under ~1 GB of HBM
                peikert_batch = min(B, max(256,
                                           2**28 // (n * s.pre.window)))

                def run(k=key, s=s, Bp=peikert_batch):
                    return s.sample(k, Bp, return_coeffs=True)
        else:
            raise ValueError(f"unknown algorithm {algorithm}")

    stats = _time_fn(run, cfg.warmup_runs, cfg.timed_runs)
    per_batch = B  # imhk/klein/peikert override below
    if peikert_batch is not None:
        per_batch = peikert_batch
    if per_batch_override is not None:
        per_batch = per_batch_override
    from lattice_gaussian_mcmc_tpu.utils.profiling import memory_snapshot
    return {"algorithm": algorithm, "dimension": n,
            "samples_per_sec": per_batch / stats["p50_s"], **stats,
            **memory_snapshot()}


def bench_reduction(n: int, cfg: BenchmarkConfig) -> Dict:
    """LLL/BKZ wall-clock on a random q-ary basis (reference :195-364)."""
    from lattice_gaussian_mcmc_tpu.reduction import (
        bkz_reduce,
        lll_reduce,
        native_available,
    )
    lat = qary_lattice(n, n // 2, q=3329, seed=cfg.seed)
    B = np.asarray(lat.basis)
    out = {"dimension": n, "native": native_available()}
    t0 = time.perf_counter()
    R = lll_reduce(B)
    out["lll_s"] = time.perf_counter() - t0
    if native_available() and n <= 256:
        t0 = time.perf_counter()
        bkz_reduce(R, beta=20, max_tours=2)
        out["bkz20_s"] = time.perf_counter() - t0
    return out


def run_benchmarks(cfg: Optional[BenchmarkConfig] = None) -> Dict:
    cfg = cfg or BenchmarkConfig()
    out_dir = cfg.ensure_output()
    results: List[Dict] = []
    key = jax.random.key(cfg.seed)
    for n in cfg.dimensions:
        for alg in cfg.algorithms:
            r = bench_algorithm(alg, n, cfg, jax.random.fold_in(key, hash(alg) % 2**31))
            if r is not None:
                results.append(r)
    red = [bench_reduction(n, cfg) for n in cfg.dimensions if n <= 256]
    payload = {"sampling": results, "reduction": red,
               "device": str(jax.devices()[0])}
    # load-bearing sanity gate: every benchmarked cell must have produced a
    # finite positive rate (a silently broken sampler shows up as NaN/0
    # rates long before a statistical test runs)
    payload["all_passed"] = bool(
        results and all(np.isfinite(r["samples_per_sec"]) and
                        r["samples_per_sec"] > 0 for r in results))
    out_path = os.path.join(out_dir, "benchmark_results.json")
    # merge-preserve keys other drivers fold into this file — restricted to
    # an explicit allowlist, and stamped with provenance (the previous
    # file's mtime) so a row measured by older kernel code is
    # self-describingly foreign rather than masquerading as output of this
    # run (ADVICE r4). The suite's all_passed gate never covers these keys.
    merge_allowlist = ("falcon1024",)
    try:
        with open(out_path) as f:
            prev = json.load(f)
        prev_mtime = time.strftime(
            "%Y-%m-%dT%H:%M:%S", time.gmtime(os.path.getmtime(out_path)))
        carried = {}
        for k in merge_allowlist:
            if k in prev and k not in payload:
                payload[k] = prev[k]
                carried[k] = {"merged_from_file_mtime_utc": prev_mtime,
                              "covered_by_all_passed": False}
        if carried:
            payload["foreign_key_provenance"] = carried
    except (OSError, json.JSONDecodeError):
        pass
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2, default=float)
    return payload
