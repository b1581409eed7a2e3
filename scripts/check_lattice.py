"""Lattice construction sanity check (parity: reference
`check_validation_lattice.py`).

Builds the named lattice, prints its geometry (det, GS profile, smoothing
parameter, Gaussian heuristic, Klein window feasibility at a given sigma)
and verifies structural invariants:
  - |det B| == prod ||b*_i||  (GSO consistency),
  - NTRU: det == q^n and B*[f g; F G]-relation via verify,
  - q-ary: q*Z^n subset of the lattice (qI columns decode to themselves),
  - Klein precompute window <= MAX_WINDOW without clamping.

Usage: python scripts/check_lattice.py {zn,qary,ntru} [n] [sigma]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu" or "--cpu" in sys.argv:
    # under axon only the config update actually forces CPU (sitecustomize
    # re-exports the tunneled TPU platform)
    sys.argv = [a for a in sys.argv if a != "--cpu"]
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    ntru_lattice,
    qary_lattice,
)
from lattice_gaussian_mcmc_tpu.lattices.base import (
    gaussian_heuristic,
    smoothing_parameter,
)
from lattice_gaussian_mcmc_tpu.samplers import klein_precompute
from lattice_gaussian_mcmc_tpu.samplers.klein import MAX_WINDOW


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "qary"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ok = True

    if kind == "zn":
        lat = identity_lattice(n)
    elif kind == "qary":
        lat = qary_lattice(n, n // 2, q=3329, seed=0)
    elif kind == "ntru":
        lat = ntru_lattice(n, q=12289, seed=0, cache_dir="bench_cache")
    else:
        raise SystemExit(f"unknown lattice kind {kind!r}")

    B = np.asarray(lat.basis, dtype=np.float64)
    gs = np.asarray(lat.gs_norms, dtype=np.float64)
    sign, logdet = np.linalg.slogdet(B)
    log_gs = np.log(gs).sum()
    eta = float(smoothing_parameter(lat))
    gh = float(gaussian_heuristic(lat))
    print(f"{lat.name}: n={lat.n}  log|det|={logdet:.4f}  "
          f"sum log||b*||={log_gs:.4f}")
    print(f"GS profile: max={gs.max():.4g} min={gs.min():.4g} "
          f"ratio={gs.max() / gs.min():.4g}")
    print(f"eta_0.01={eta:.4g}  gaussian_heuristic={gh:.4g}")

    if abs(logdet - log_gs) > 1e-6 * max(abs(logdet), 1.0):
        print("FAIL: det != prod ||b*_i||")
        ok = False

    if kind == "ntru":
        q = int(lat.meta.get("q", 12289))
        expect = lat.n // 2 * math.log(q)
        if abs(logdet - expect) > 1e-6 * expect:
            print(f"FAIL: NTRU det != q^n (log {logdet:.4f} vs {expect:.4f})")
            ok = False
        else:
            print(f"NTRU det == q^n OK (q={q})")
    if kind == "qary":
        q = int(lat.meta.get("q", 3329))
        # q*e_i must be lattice points: coeffs = B^-1 (q e_i) integral
        coeffs = np.linalg.solve(B, q * np.eye(lat.n))
        if not np.allclose(coeffs, np.round(coeffs), atol=1e-6):
            print("FAIL: q*Z^n not contained in the q-ary lattice")
            ok = False
        else:
            print(f"q*Z^n subset OK (q={q})")

    sigma = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3 * gs.max()
    klein_floor = gs.max() / math.sqrt(2.0 * math.log(max(lat.n, 2)))
    pre = klein_precompute(lat, sigma)
    clamped = pre.window >= MAX_WINDOW
    print(f"sigma={sigma:.4g} (floor {klein_floor:.4g}): window={pre.window}"
          f"{' CLAMPED — law will be biased' if clamped else ''}")
    if clamped:
        ok = False

    print(f"\ncheck: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
