"""TPU-native lattice Gaussian sampling framework.

A brand-new JAX / XLA / Pallas implementation of discrete Gaussian sampling
over lattices (Klein's algorithm, independent Metropolis-Hastings-Klein and
symmetric Metropolis-Klein MCMC, Peikert's convolution sampler, annealed
Gibbs/CVP decoding), with lattice constructions (Z^n, q-ary/LWE, NTRU/FALCON),
host-side LLL/BKZ reduction, and convergence diagnostics (ESS, TVD, R-hat,
spectral gap) — designed TPU-first: thousands of chains vmapped per chip,
sharded over device meshes with collective diagnostics.

Capability parity target: the reference research codebase
`NickQrumpton/lattice-gaussian-mcmc` (Wang & Ling, IEEE Trans. IT 2018);
see SURVEY.md for the layer map this package mirrors.
"""

__version__ = "0.1.0"

from lattice_gaussian_mcmc_tpu.lattices import (  # noqa: F401
    Lattice,
    identity_lattice,
    lattice_from_basis,
    qary_lattice,
    ntru_lattice,
)
from lattice_gaussian_mcmc_tpu.samplers import (  # noqa: F401
    KleinSampler,
    IMHKSampler,
    MetropolisKleinSampler,
    PeikertSampler,
    klein_precompute,
    klein_sample,
    imhk_chain,
)
