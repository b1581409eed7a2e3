from lattice_gaussian_mcmc_tpu.diagnostics.mcmc import (  # noqa: F401
    autocorrelation,
    integrated_autocorr_time,
    effective_sample_size,
    ess_batch_means,
    acceptance_rate,
    jump_distances,
    mcse,
    diagnose_chain,
)
from lattice_gaussian_mcmc_tpu.diagnostics.convergence import (  # noqa: F401
    tvd_discrete,
    tvd_histogram,
    tvd_vs_exact,
    gelman_rubin,
    wasserstein_1d,
    sliced_wasserstein,
    mixing_time_from_tvd,
    batch_means_variance,
    kl_divergence_discrete,
    ks_2sample,
)
from lattice_gaussian_mcmc_tpu.diagnostics.spectral import (  # noqa: F401
    spectral_gap_mc,
    spectral_gap_theoretical,
    empirical_transition_gap,
    mixing_time_bounds,
    kmeans_discretize,
)
