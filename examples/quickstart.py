"""Quickstart: sample a discrete Gaussian over a q-ary lattice.

Run: python examples/quickstart.py  (uses the TPU if available; add --cpu)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import lattice_gaussian_mcmc_tpu as lg
from lattice_gaussian_mcmc_tpu.reduction import lll_reduce
from lattice_gaussian_mcmc_tpu.diagnostics import effective_sample_size
from lattice_gaussian_mcmc_tpu.diagnostics.spectral import spectral_gap_mc
from lattice_gaussian_mcmc_tpu.samplers import klein_sample_batch


def main():
    # 1. build a random q-ary (LWE-style) lattice and LLL-reduce it
    lat = lg.qary_lattice(n=64, k=32, q=3329, seed=0)
    lat = lg.lattice_from_basis(lll_reduce(np.asarray(lat.basis)),
                                name="qary64-lll")
    sigma = 1.5 * float(jnp.max(lat.gs_norms))
    print(f"lattice {lat.name}: max||b*|| = {float(jnp.max(lat.gs_norms)):.1f},"
          f" sigma = {sigma:.1f}")

    # 2. IMHK sampling (Klein proposals, Metropolis-corrected)
    sampler = lg.IMHKSampler(lat, sigma)
    points = sampler.sample(jax.random.key(0), 10_000)
    print(f"sampled {points.shape}, acceptance = {sampler.acceptance_rate:.3f}")

    # 3. diagnostics
    _, log_ws = klein_sample_batch(jax.random.key(1), sampler.pre, 2048)
    print(f"spectral gap >= {float(spectral_gap_mc(log_ws)):.4f}")
    ess = float(effective_sample_size(jnp.asarray(points[:, 0])))
    print(f"ESS(coordinate 0) = {ess:.0f} / {points.shape[0]}")

    # 4. moments sanity
    print(f"mean |x| = {float(jnp.mean(jnp.abs(points))):.2f}, "
          f"std = {float(jnp.std(points)):.2f} (target ~{sigma:.1f})")


if __name__ == "__main__":
    main()
