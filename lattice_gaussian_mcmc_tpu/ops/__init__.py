from lattice_gaussian_mcmc_tpu.ops.discrete_gaussian import (  # noqa: F401
    dgauss_logits,
    sample_dgauss,
    sample_dgauss_with_logz,
    log_partition_window,
    exact_pmf,
    build_cdt,
    sample_cdt,
    sample_dgauss_rejection,
)
from lattice_gaussian_mcmc_tpu.ops.theta import (  # noqa: F401
    rho_Z,
    log_rho_Z,
    jacobi_theta3,
    smoothing_parameter_zn,
    log_riemann_theta,
    riemann_theta,
)
from lattice_gaussian_mcmc_tpu.ops.linalg import (  # noqa: F401
    gso_qr,
    gram_schmidt_norms,
    babai_nearest_plane,
)
