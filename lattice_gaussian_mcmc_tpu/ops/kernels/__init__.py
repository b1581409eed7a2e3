from lattice_gaussian_mcmc_tpu.ops.kernels.klein_pallas import (  # noqa: F401
    babai_decode_batch_pallas,
    imhk_step_pallas_fused,
    imhk_steps_batch_pallas,
    imhk_trajectory_pallas,
    klein_sample_batch_pallas,
    pallas_supported,
)
from lattice_gaussian_mcmc_tpu.ops.kernels.zn_pallas import (  # noqa: F401
    sample_zn_pallas,
)
