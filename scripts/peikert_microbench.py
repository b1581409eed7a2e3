"""Peikert fused-kernel microbench on the real chip.

Stepwise with flushed progress markers (tunnel pitfall: a killed client
wedges the chip for ~1h, so this script must never need killing — every
stage is small and prints before/after). Timing forces completion via a
scalar pull (block_until_ready under-waits on the tunneled device).

Env: PK_STAGES=smoke,dim1024,rounds  PK_B  PK_TILE  PK_ROUNDS
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    import signal

    # self-timeout: raising in-process exits cleanly (closing the tunnel
    # sockets) instead of an external kill mid-op, which can wedge the chip
    def _alarm(signum, frame):
        raise SystemExit("PK_TIMEOUT hit — exiting cleanly")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("PK_TIMEOUT", "600")))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lattice_gaussian_mcmc_tpu.lattices import (
        lattice_from_basis,
        ntru_lattice,
    )
    from lattice_gaussian_mcmc_tpu.ops.theta import smoothing_parameter_zn
    from lattice_gaussian_mcmc_tpu.samplers.peikert import peikert_precompute
    from lattice_gaussian_mcmc_tpu.ops.kernels.peikert_pallas import (
        peikert_rounds_pallas,
        peikert_sample_batch_pallas,
        suggest_peikert_window,
    )

    stages = os.environ.get("PK_STAGES", "smoke,dim1024,rounds").split(",")
    out = {"device": str(jax.devices()[0]).replace(" ", "_")}
    _prev_path = pathlib.Path(
        "results/kernel_profile/peikert_microbench.json")
    if _prev_path.exists():
        try:
            out = {**json.loads(_prev_path.read_text()), **out}
        except json.JSONDecodeError:
            pass
    out_path = pathlib.Path("results/kernel_profile/peikert_microbench.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)

    def flush():
        out_path.write_text(json.dumps(out, indent=2))

    if "smoke" in stages:
        print("[smoke] small lattice, single round...", flush=True)
        rng = np.random.default_rng(0)
        n = 16
        B0 = np.triu(rng.uniform(-0.5, 0.5, (n, n))) + np.eye(n)
        lat = lattice_from_basis(B0, dtype=jnp.float32)
        s1 = float(np.linalg.norm(np.asarray(B0), 2))
        pre = peikert_precompute(lat, sigma=3.0 * s1)
        w = suggest_peikert_window(float(pre.r), n)
        t0 = time.perf_counter()
        X = peikert_sample_batch_pallas(jax.random.key(1), pre, 65536,
                                        window=w, tile=1024)
        sm = float(jnp.sum(X))
        print(f"[smoke] done in {time.perf_counter()-t0:.1f}s sum={sm:.0f}",
              flush=True)
        Xn = np.asarray(X)
        G = np.asarray(lat.basis.T @ lat.basis)
        tc = float(pre.sigma) ** 2 * np.linalg.inv(G)
        ratio = np.var(Xn, axis=0, ddof=1) / np.diag(tc)
        out["smoke"] = {"var_ratio_min": float(ratio.min()),
                        "var_ratio_max": float(ratio.max()),
                        "window": w}
        print(f"[smoke] var ratio {ratio.min():.3f}..{ratio.max():.3f}",
              flush=True)
        flush()

    if "dim1024" in stages or "rounds" in stages:
        n_ring = int(os.environ.get("PK_N", "512"))
        print(f"[dim1024] loading NTRU-{n_ring}...", flush=True)
        lat = ntru_lattice(n_ring, q=12289, seed=0, cache_dir="bench_cache",
                           dtype=jnp.float32)
        n = 2 * n_ring
        s1 = float(np.linalg.norm(np.asarray(lat.basis, np.float64), 2))
        r = smoothing_parameter_zn(n, 0.01)
        sigma = 1.05 * float(r) * s1
        pre = peikert_precompute(lat, sigma)
        w = suggest_peikert_window(float(pre.r), n)
        print(f"[dim1024] r={float(pre.r):.3f} window={w} "
              f"L2 finite={bool(np.isfinite(np.asarray(pre.L2)).all())}",
              flush=True)
        out[f"dim{n}_config"] = {"r": float(pre.r), "window": w,
                                 "sigma": sigma}
        flush()

    if "dim1024" in stages:
        B = int(os.environ.get("PK_B", "131072"))
        tile = int(os.environ.get("PK_TILE", "2048"))
        print(f"[dim1024] single-round compile B={B} tile={tile}...",
              flush=True)
        t0 = time.perf_counter()
        X = peikert_sample_batch_pallas(jax.random.key(2), pre, B,
                                        window=w, tile=tile)
        float(jnp.sum(X[:, :8]))
        compile_s = time.perf_counter() - t0
        print(f"[dim1024] compiled+ran in {compile_s:.1f}s", flush=True)
        rates = []
        for rep in range(3):
            t0 = time.perf_counter()
            X = peikert_sample_batch_pallas(
                jax.random.key(3 + rep), pre, B, window=w, tile=tile)
            float(jnp.sum(X[:, :8]))
            rates.append(B / (time.perf_counter() - t0))
        out[f"dim{n}_single"] = {
            "B": B, "tile": tile, "compile_s": round(compile_s, 1),
            "rates_msps": [round(x / 1e6, 3) for x in rates]}
        print(f"[dim1024] single-round rates "
              f"{[round(x/1e6,2) for x in rates]} M/s", flush=True)
        flush()

    if "rounds" in stages:
        B = int(os.environ.get("PK_B", "131072"))
        tile = int(os.environ.get("PK_TILE", "2048"))
        k = int(os.environ.get("PK_ROUNDS", "8"))
        print(f"[rounds] k={k} compile...", flush=True)
        t0 = time.perf_counter()
        R = peikert_rounds_pallas(jax.random.key(7), pre, B, n_rounds=k,
                                  window=w, tile=tile)
        float(jnp.sum(R[:, :4, :8]))
        compile_s = time.perf_counter() - t0
        print(f"[rounds] compiled+ran in {compile_s:.1f}s", flush=True)
        rates = []
        for rep in range(3):
            t0 = time.perf_counter()
            R = peikert_rounds_pallas(jax.random.key(8 + rep), pre, B,
                                      n_rounds=k, window=w, tile=tile)
            float(jnp.sum(R[:, :4, :8]))
            rates.append(B * k / (time.perf_counter() - t0))
        out[f"rounds_dim{n}"] = {
            "B": B, "tile": tile, "n_rounds": k,
            "compile_s": round(compile_s, 1),
            "rates_msps": [round(x / 1e6, 3) for x in rates]}
        print(f"[rounds] rates {[round(x/1e6,2) for x in rates]} M/s",
              flush=True)
        # hardware moment sanity on one round (slice: readback is ~40 MB/s)
        Xn = np.asarray(R[0, :8192, :], np.float64)
        Bm = np.asarray(lat.basis, np.float64)
        tc = sigma ** 2 * np.linalg.inv(Bm.T @ Bm)
        ratio = np.var(Xn, axis=0, ddof=1) / np.diag(tc)
        out[f"rounds_dim{n}"]["var_ratio_minmax"] = [float(ratio.min()),
                                             float(ratio.max())]
        print(f"[rounds] var ratio {ratio.min():.3f}..{ratio.max():.3f}",
              flush=True)
        flush()
    print("done", flush=True)


if __name__ == "__main__":
    main()
