from lattice_gaussian_mcmc_tpu.samplers.klein import (  # noqa: F401
    KleinPrecomp,
    KleinSampler,
    klein_precompute,
    klein_sample,
    klein_sample_batch,
    klein_log_density,
)
from lattice_gaussian_mcmc_tpu.samplers.imhk import (  # noqa: F401
    IMHKSampler,
    MetropolisKleinSampler,
    SMKSampler,
    ChainState,
    imhk_init,
    imhk_step,
    imhk_chain,
    smk_chain,
)
from lattice_gaussian_mcmc_tpu.samplers.peikert import (  # noqa: F401
    PeikertSampler,
    peikert_precompute,
    peikert_sample,
)
from lattice_gaussian_mcmc_tpu.samplers.gibbs import (  # noqa: F401
    gibbs_chain,
    annealed_gibbs_decode,
)
from lattice_gaussian_mcmc_tpu.samplers.adaptive import (  # noqa: F401
    adaptive_klein_sample,
    choose_precision,
    f32_law_distortion_bound,
)
