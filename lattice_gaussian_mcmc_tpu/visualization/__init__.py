from lattice_gaussian_mcmc_tpu.visualization.plots import PlottingTools  # noqa: F401
