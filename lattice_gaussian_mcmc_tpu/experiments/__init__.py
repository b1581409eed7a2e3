from lattice_gaussian_mcmc_tpu.experiments.configs import (  # noqa: F401
    ExperimentConfig,
    ConvergenceConfig,
    ScalingConfig,
    CryptoConfig,
    SensitivityConfig,
    BenchmarkConfig,
)
