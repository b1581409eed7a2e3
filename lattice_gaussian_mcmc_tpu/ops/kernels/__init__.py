from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (  # noqa: F401
    klein_sample_batch_pallas,
    pallas_supported,
)
from lattice_gaussian_mcmc_tpu.ops.kernels.zn_pallas import (  # noqa: F401
    sample_zn_pallas,
)
