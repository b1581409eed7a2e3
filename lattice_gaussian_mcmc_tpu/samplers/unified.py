"""Unified lattice-sampler dispatch facade.

Parity: reference `src/lattices/gaussian_lattice_sampler.py` (C16) —
`IdentityLatticeSampler` (:26-78), `QaryLatticeSampler` (:81-193),
`NTRULatticeSampler` CVP/short-vector modes (:196-288),
`UnifiedLatticeSampler` type dispatch (:291-334). One facade that picks the
right algorithm per lattice kind:

  identity   -> direct i.i.d. per-coordinate sampling (exact, O(n))
  qary/rlwe  -> Klein (optionally IMHK-corrected) on the (reduced) basis
  ntru       -> Klein on the secret basis; CVP decode mode via
                Babai/annealed Gibbs
  generic    -> Klein/IMHK
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lattice_gaussian_mcmc_tpu.lattices.base import Lattice, smoothing_parameter
from lattice_gaussian_mcmc_tpu.lattices.identity import sample_zn
from lattice_gaussian_mcmc_tpu.samplers.imhk import (
    IMHKSampler,
    MetropolisKleinSampler,
)
from lattice_gaussian_mcmc_tpu.samplers.klein import KleinSampler
from lattice_gaussian_mcmc_tpu.samplers.gibbs import annealed_gibbs_decode


class UnifiedLatticeSampler:
    """Type-dispatching sampler facade (reference :291-334)."""

    def __init__(self, lattice: Lattice, sigma: Optional[float] = None,
                 exact: bool = False, window: Optional[int] = None,
                 algorithm: Optional[str] = None,
                 proposal_sigma: Optional[float] = None):
        """`exact=True` uses IMHK (MH-corrected); otherwise plain Klein.
        `algorithm` overrides the dispatch explicitly: one of
        "direct"/"klein"/"imhk"/"smk"/"peikert" (smk = symmetric
        Metropolis-Klein, BASELINE config 4, `proposal_sigma` sets its
        local-move width; peikert = the fully-parallel convolution
        sampler, valid only for sigma >= r*s1(B) — raises below that).
        sigma defaults to 1.5 x the smoothing-parameter bound."""
        self.lattice = lattice
        self.kind = lattice.meta.get("kind", "generic")
        if sigma is None:
            sigma = 1.5 * float(smoothing_parameter(lattice))
        self.sigma = float(sigma)
        self.exact = exact
        if algorithm is None:
            algorithm = ("direct" if self.kind == "identity"
                         else ("imhk" if exact else "klein"))
        if algorithm not in ("direct", "klein", "imhk", "smk", "peikert"):
            raise ValueError(f"unknown algorithm {algorithm!r}")
        if algorithm == "direct" and self.kind != "identity":
            raise ValueError("direct sampling is exact only on Z^n")
        self._algorithm = algorithm
        if algorithm == "direct":
            self._impl = None  # direct path
        elif algorithm == "imhk":
            self._impl = IMHKSampler(lattice, self.sigma, window=window)
        elif algorithm == "smk":
            self._impl = MetropolisKleinSampler(
                lattice, self.sigma, proposal_sigma=proposal_sigma,
                window=window)
        elif algorithm == "peikert":
            from lattice_gaussian_mcmc_tpu.samplers.peikert import (
                PeikertSampler,
            )
            self._impl = PeikertSampler(lattice, self.sigma)
        else:
            self._impl = KleinSampler(lattice, self.sigma, window=window)

    @property
    def algorithm(self) -> str:
        return self._algorithm

    def sample(self, key, num_samples: int, **kw):
        """(num_samples, n) lattice points."""
        if self.kind == "identity":
            return sample_zn(key, self.lattice.n, self.sigma,
                             shape=(num_samples,))
        return self._impl.sample(key, num_samples, **kw)

    def decode(self, key, target, stochastic: bool = True,
               n_chains: int = 64, n_sweeps: int = 50):
        """CVP decoding: Babai baseline, optionally refined by annealed
        Gibbs (the reference's NTRU CVP-based mode, :196-288)."""
        target = jnp.asarray(target, dtype=self.lattice.basis.dtype)
        if not stochastic:
            return self.lattice.decode_cvp(target)
        point, coeffs, _ = annealed_gibbs_decode(
            key, self.lattice, target, sigma0=self.sigma,
            n_sweeps=n_sweeps, n_chains=n_chains)
        return point, coeffs

    def short_vector(self, key, n_samples: int = 4096):
        """Shortest nonzero sampled vector (the reference NTRU sampler's
        short-vector mode)."""
        pts = self.sample(key, n_samples)
        norms = jnp.linalg.norm(pts, axis=1)
        norms = jnp.where(norms < 1e-9, jnp.inf, norms)
        return pts[jnp.argmin(norms)]
