from lattice_gaussian_mcmc_tpu.lattices.base import (  # noqa: F401
    Lattice,
    lattice_from_basis,
    gaussian_heuristic,
    smoothing_parameter,
    covering_radius_bound,
    first_minimum_estimate,
)
from lattice_gaussian_mcmc_tpu.lattices.identity import identity_lattice  # noqa: F401
from lattice_gaussian_mcmc_tpu.lattices.qary import (  # noqa: F401
    qary_lattice,
    qary_from_matrix,
    lwe_lattice,
    rlwe_lattice,
    module_lattice,
    estimate_bkz_security,
    estimate_security_from_lattice,
    hnf,
    lattice_volume_qary,
    falcon_parameters,
    dilithium_parameters,
)
from lattice_gaussian_mcmc_tpu.lattices.ntru import ntru_lattice  # noqa: F401
