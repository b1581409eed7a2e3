"""Micro-benchmark the fused IMHK kernel on a SYNTHETIC KleinPrecomp.

Building the real NTRU-512 lattice costs ~5 min/process (bigint keygen +
host-f64 GSO); kernel perf only depends on (n, window, tile), so tuning
iterations use a synthetic upper-triangular U with NTRU-like conditional
sigmas instead. Production numbers still come from bench.py on the real
lattice.

Env: MB_N (1024), MB_WINDOW (24), MB_CHAINS (131072), MB_TILE (4096),
MB_STEPS (16), MB_REPS (3), MB_MODULE (klein_pallas | <alt module name>).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_precomp(n: int, window: int, seed: int = 0):
    import jax.numpy as jnp
    import numpy as np
    from lattice_gaussian_mcmc_tpu.samplers.klein import KleinPrecomp

    rng = np.random.default_rng(seed)
    U = np.triu(rng.normal(0.0, 0.15, (n, n)), 1) + np.eye(n)
    sig = rng.uniform(1.0, (window - 2) / 12.0, n)
    return KleinPrecomp(
        basis=jnp.eye(n, dtype=jnp.float32),
        U=jnp.asarray(U, jnp.float32),
        cs=jnp.asarray(rng.uniform(-20, 20, n), jnp.float32),
        sigmas=jnp.asarray(sig, jnp.float32),
        sigma=jnp.asarray(1.0, jnp.float32),
        window=window)


def main():
    import importlib
    import jax
    import jax.numpy as jnp

    modname = os.environ.get("MB_MODULE", "klein_pallas")
    mod = importlib.import_module(
        f"lattice_gaussian_mcmc_tpu.ops.kernels.{modname}")

    n = int(os.environ.get("MB_N", "1024"))
    window = int(os.environ.get("MB_WINDOW", "24"))
    B = int(os.environ.get("MB_CHAINS", "131072"))
    tile = int(os.environ.get("MB_TILE", "4096"))
    n_steps = int(os.environ.get("MB_STEPS", "16"))
    reps = int(os.environ.get("MB_REPS", "3"))

    pre = synthetic_precomp(n, window)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    X, lw = mod.klein_sample_batch_pallas(key, pre, B, tile=tile)
    jax.block_until_ready(X)
    print(f"klein compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = mod.imhk_steps_batch_pallas(jax.random.fold_in(key, 1), pre, X, lw,
                                      n_steps, tile=tile)
    jax.block_until_ready(out)
    print(f"fused compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    X, lw, _ = out
    float(jnp.sum(lw))  # scalar pull: block_until_ready returns early on
    # the tunneled device (see bench.py) and silently inflates rates
    rates = []
    for r in range(reps):
        t0 = time.perf_counter()
        X, lw, acc = mod.imhk_steps_batch_pallas(
            jax.random.fold_in(key, 2 + r), pre, X, lw, n_steps, tile=tile)
        float(jnp.sum(lw))
        rates.append(B * n_steps / (time.perf_counter() - t0))
    from lattice_gaussian_mcmc_tpu.ops.kernels import klein_pallas as _kp
    modes = (f"cdf={getattr(_kp, '_CDF_MODE', '?')} "
             f"logits={getattr(_kp, '_LOGITS_MODE', '?')}")
    print(f"RESULT module={modname} {modes} "
          f"n={n} window={window} tile={tile}: best {max(rates)/1e6:.3f} "
          f"reps {[round(x/1e6, 2) for x in rates]} M samples/s "
          f"acc={float(jnp.mean(acc))/n_steps:.4f}", flush=True)


if __name__ == "__main__":
    main()
