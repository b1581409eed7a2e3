from lattice_gaussian_mcmc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_chain_keys,
    CHAIN_AXIS,
)
from lattice_gaussian_mcmc_tpu.parallel.collectives import (  # noqa: F401
    sharded_imhk_chains,
    sharded_imhk_blocked,
    sharded_imhk_pallas,
    global_acceptance,
    global_moments,
    global_gelman_rubin,
    sharded_klein_batch,
)
