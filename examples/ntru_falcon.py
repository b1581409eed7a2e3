"""NTRU / FALCON-style sampling: keygen, secret-basis Klein, CVP decode.

Run: python examples/ntru_falcon.py [--cpu] [--n 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=64, help="ring degree")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import lattice_gaussian_mcmc_tpu as lg
    from lattice_gaussian_mcmc_tpu.lattices.ntru import (
        ntru_keygen,
        verify_ntru_basis,
    )
    from lattice_gaussian_mcmc_tpu.samplers.unified import UnifiedLatticeSampler

    # 1. exact host keygen: f, g, F, G with f G - g F = q
    key = ntru_keygen(args.n, q=12289, seed=7)
    print("keygen checks:", verify_ntru_basis(key))

    # 2. lattice + sampler on the short secret basis
    lat = lg.ntru_lattice(args.n, q=12289, seed=7, key=key)
    sigma = 1.2 * float(jnp.max(lat.gs_norms))
    s = UnifiedLatticeSampler(lat, sigma)
    pts = s.sample(jax.random.key(0), 4096)
    print(f"dim {lat.n}: sampled {pts.shape}, "
          f"mean norm = {float(jnp.mean(jnp.linalg.norm(pts, axis=1))):.1f} "
          f"(expect ~{sigma * np.sqrt(lat.n):.1f})")

    # 3. CVP decoding (MIMO-style): Babai vs annealed Gibbs
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.normal(scale=50.0, size=lat.n), jnp.float32)
    babai_pt, _ = s.decode(jax.random.key(2), target, stochastic=False)
    gibbs_pt, _ = s.decode(jax.random.key(2), target, stochastic=True,
                           n_sweeps=30, n_chains=32)
    d_b = float(jnp.linalg.norm(babai_pt - target))
    d_g = float(jnp.linalg.norm(gibbs_pt - target))
    print(f"CVP distance: Babai {d_b:.2f} vs annealed Gibbs {d_g:.2f}")


if __name__ == "__main__":
    main()
