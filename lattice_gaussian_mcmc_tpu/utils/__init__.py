from lattice_gaussian_mcmc_tpu.utils.prng import chain_keys, fold_step  # noqa: F401
from lattice_gaussian_mcmc_tpu.utils.stats import (  # noqa: F401
    logsumexp,
    log_softmax,
    softmax,
)
