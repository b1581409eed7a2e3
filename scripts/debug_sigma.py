"""Sigma-semantics sanity check (parity: reference `debug_sigma.py`).

Verifies, on Z^n and on an LLL-reduced random basis, that:
  - empirical per-coordinate std of Klein draws matches the discrete-
    Gaussian std at the requested sigma (sigma_discrete <= sigma, converging
    as sigma grows),
  - the Klein validity threshold sigma >= max||b*_i|| / sqrt(2 ln n) is
    reported correctly,
  - E||x|| tracks sigma*sqrt(n) (the reference's <2% gate at smooth sigma).

Usage: python scripts/debug_sigma.py [n] [sigma]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu" or "--cpu" in sys.argv:
    # under axon the sitecustomize re-registers the tunneled TPU backend at
    # startup; only the config update actually forces CPU
    sys.argv = [a for a in sys.argv if a != "--cpu"]
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
)
from lattice_gaussian_mcmc_tpu.lattices.base import smoothing_parameter
from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
from lattice_gaussian_mcmc_tpu.samplers.klein_blocked import (
    klein_sample_batch_blocked,
)


def discrete_gaussian_variance(sigma: float, tau: float = 12.0) -> float:
    """Var of D_{Z,sigma} by direct enumeration (== sigma^2 above smoothing,
    strictly below it for small sigma)."""
    r = int(math.ceil(tau * sigma)) + 1
    k = np.arange(-r, r + 1, dtype=np.float64)
    p = np.exp(-k * k / (2.0 * sigma * sigma))
    p /= p.sum()
    return float((p * k * k).sum())


def check(lat, sigma, key, n_samples=8192, label=""):
    n = lat.n
    eta = float(smoothing_parameter(lat))
    max_gs = float(jnp.max(lat.gs_norms))
    klein_floor = max_gs / math.sqrt(2.0 * math.log(max(n, 2)))
    pre = klein_precompute(lat, sigma)
    X, _ = klein_sample_batch_blocked(key, pre, n_samples, min(32, n))
    pts = X @ lat.basis.T
    d = np.linalg.norm(np.asarray(pts), axis=1)
    var_target = discrete_gaussian_variance(sigma)
    print(f"--- {label} (n={n}) ---")
    print(f"sigma={sigma:g}  eta={eta:.4g}  max||b*||={max_gs:.4g}  "
          f"klein_floor={klein_floor:.4g}  window={pre.window}")
    print(f"sigma/eta={sigma / eta:.3f}  "
          f"{'SMOOTH' if sigma > eta else 'BELOW smoothing'}; "
          f"sigma {'OK' if sigma >= klein_floor else 'BELOW'} Klein floor")
    exp_norm = math.sqrt(var_target * n)
    print(f"E||x||: empirical {d.mean():.4f} vs sigma_d*sqrt(n) "
          f"{exp_norm:.4f}  (rel err {abs(d.mean() - exp_norm) / exp_norm:.3%})")
    emp_std = float(np.asarray(pts).std(axis=0).mean())
    print(f"per-coordinate std: empirical {emp_std:.4f} vs discrete-sigma "
          f"{math.sqrt(var_target):.4f} (continuous sigma {sigma:g})")
    return abs(d.mean() - exp_norm) / exp_norm


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    key = jax.random.key(0)
    lat = identity_lattice(n)
    sigma = float(sys.argv[2]) if len(sys.argv) > 2 else \
        2.0 * float(smoothing_parameter(lat))
    err1 = check(lat, sigma, key, label="Z^n")

    rng = np.random.default_rng(0)
    B = np.triu(rng.uniform(-0.5, 0.5, (n, n))) + np.eye(n)
    np.fill_diagonal(B, 1.0)
    lat2 = lattice_from_basis(B, name="random-triangular")
    sigma2 = 2.0 * float(smoothing_parameter(lat2))
    err2 = check(lat2, sigma2, jax.random.fold_in(key, 1),
                 label="random triangular")

    ok = err1 < 0.02 and err2 < 0.05
    print(f"\nsanity: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
