"""Experiment-driver smoke tests at tiny budgets: every experiment module
produces its artifact with the expected row structure (VERDICT r1 weak #7:
no package module with 0 test references)."""

import json
import logging
import os

import jax
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.experiments.configs import (
    ConvergenceConfig,
    CryptoConfig,
    SensitivityConfig,
)


@pytest.mark.slow
def test_crypto_suite_rows_and_resume(tmp_path):
    from lattice_gaussian_mcmc_tpu.experiments.cryptographic import (
        run_crypto_suite,
    )
    cfg = CryptoConfig(output_dir=str(tmp_path), ntru_n=(16,), qary_dims=(16,),
                       n_samples=500, n_chains=128)
    out = run_crypto_suite(cfg)
    rows = list(out.values())
    assert rows, "no lattices evaluated"
    for r in rows:
        assert 0.0 <= r["acceptance"] <= 1.0
        assert r["spectral_gap"] > 0
        assert "window_clamped" in r  # clamping is recorded, not silent
    # resume path: a second run must reuse the checkpoint (same content)
    out2 = run_crypto_suite(cfg)
    assert set(out2) == set(out)
    assert os.path.exists(tmp_path / "crypto_results.json")


@pytest.mark.slow
def test_sigma_sweep_grid_and_transition(tmp_path):
    from lattice_gaussian_mcmc_tpu.experiments.parameter_sensitivity import (
        sigma_sweep,
    )
    cfg = SensitivityConfig(output_dir=str(tmp_path), dimension=8,
                            sweep_dimensions=(4, 8), sigma_grid_size=5)
    out = sigma_sweep(cfg)
    assert {r["dimension"] for r in out["rows"]} == {4, 8}
    assert len(out["rows"]) == 10
    assert set(out["eta_by_dim"]) == {4, 8}
    # gap must increase with sigma within each dimension (monotone trend)
    for n in (4, 8):
        gaps = [r["spectral_gap"] for r in out["rows"]
                if r["dimension"] == n]
        assert gaps[-1] >= gaps[0]
    assert out["phase_transition_at"] is None or \
        0.25 <= out["phase_transition_at"] <= 8.0


@pytest.mark.slow
def test_convergence_study_artifact(tmp_path):
    from lattice_gaussian_mcmc_tpu.experiments.convergence_study import (
        run_study,
    )
    cfg = ConvergenceConfig(output_dir=str(tmp_path), dimensions=(2,),
                            sigma_factors=(2.0,), n_samples=2_000,
                            n_chains=2, burn_in=50,
                            tvd_checkpoints=(10, 100))
    out = run_study(cfg)
    path = tmp_path / "convergence_study.json"
    assert path.exists()
    data = json.loads(path.read_text())
    assert data["algorithm_comparison"], "no comparison rows"
    row = data["algorithm_comparison"][0]
    # at 2k samples the enumerated-truth TVD estimate sits on its noise
    # floor ~sqrt(support/N); gate against that, and Klein vs IMHK must
    # agree (smooth sigma: IMHK acceptance ~ 1, same law)
    assert row["klein_tvd"] < 0.3
    assert abs(row["klein_tvd"] - row["imhk_tvd"]) < 0.1
    assert row["acceptance"] > 0.9
    assert data["tvd_decay"], "no decay curve"


@pytest.mark.slow
def test_mesh_scaling_measure_small():
    """measure_scaling on the test session's 8 virtual CPU devices."""
    from lattice_gaussian_mcmc_tpu.experiments.mesh_scaling import (
        measure_scaling,
    )
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    rows = measure_scaling(n=8, chains_per_device=16, n_samples=4,
                           device_counts=[1, 2])
    assert [r["n_devices"] for r in rows] == [1, 2]
    assert rows[0]["efficiency"] == 1.0
    assert rows[1]["samples_per_sec"] > 0


def test_logging_run_file_and_phase(tmp_path, caplog):
    from lattice_gaussian_mcmc_tpu.utils.logging import (
        add_run_file_handler,
        get_logger,
        log_phase,
    )
    path = add_run_file_handler(str(tmp_path), prefix="t")
    log = get_logger("unit")
    with log_phase("phase-x", log):
        log.info("inside")
    # the file handler captured both the phase markers and the message
    text = open(path).read()
    assert "phase-x: start" in text and "phase-x: done" in text
    assert "inside" in text
    # failure path logs the exception and re-raises
    with pytest.raises(ValueError):
        with log_phase("phase-y", log):
            raise ValueError("boom")
    assert "phase-y: FAILED" in open(path).read()
    # detach the file handler so later tests don't write into tmp_path
    root = logging.getLogger("lattice_mcmc")
    for h in list(root.handlers):
        if isinstance(h, logging.FileHandler):
            root.removeHandler(h)


def test_klein_scaling_pipeline(tmp_path):
    """C30 standalone pipeline: gen -> LLL -> sigma -> sample -> marginal
    gate (reference klein_scaling_analysis.py)."""
    from lattice_gaussian_mcmc_tpu.experiments.klein_scaling import (
        run_klein_scaling,
    )
    rows = run_klein_scaling(dims=(8, 16), n_samples=20_000, seed=1,
                             output_dir=str(tmp_path), make_plots=False)
    assert [r["dimension"] for r in rows] == [8, 16]
    for r in rows:
        assert r["passed"], f"marginal TVD gate failed: {r}"
        assert r["gs_ratio"] >= 1.0
    assert (tmp_path / "klein_scaling.csv").exists()
    data = json.loads((tmp_path / "klein_scaling.json").read_text())
    assert data["all_passed"]


@pytest.mark.slow
def test_decoding_driver_green(tmp_path):
    """BASELINE config 5 driver: gates pass at quick budgets and the
    stochastic decoders beat Babai somewhere in the midrange."""
    from lattice_gaussian_mcmc_tpu.experiments.decoding import (
        DecodingConfig,
        run_decoding,
    )
    cfg = DecodingConfig(output_dir=str(tmp_path), dimensions=(16, 32),
                         n_targets=24, rho_grid=(0.05, 0.3, 0.5),
                         gibbs_sweeps=24, gibbs_chains=12, mhk_steps=64)
    out = run_decoding(cfg)
    assert out["all_passed"] is True, out["gates"]
    assert os.path.exists(tmp_path / "decoding_results.json")
    assert os.path.exists(tmp_path / "decoding_success.png")
    # success degrades with noise for every method
    for m in ("babai", "gibbs", "mhk"):
        by_rho = {}
        for r in out["rows"]:
            by_rho.setdefault(r["rho"], []).append(r[f"success_{m}"])
        rhos = sorted(by_rho)
        assert np.mean(by_rho[rhos[0]]) >= np.mean(by_rho[rhos[-1]])


@pytest.mark.slow
def test_adaptation_driver_green(tmp_path):
    """BASELINE config 4 driver (XLA path off-TPU): sigma_prop adaptation
    converges to the target acceptance on a small NTRU lattice."""
    from lattice_gaussian_mcmc_tpu.experiments.adaptation import (
        AdaptationConfig,
        run_adaptation,
    )
    cfg = AdaptationConfig(output_dir=str(tmp_path), ntru_n=16,
                           n_chains=512, n_windows=8, window_steps=4)
    out = run_adaptation(cfg)
    assert out["all_passed"] is True, out["gates"]
    assert abs(out["acceptance_final"] - out["target_acceptance"]) <= 0.08
    # the acceptance curve is monotone in proposal width around sigma*
    assert out["acceptance_at_2x_width"] < out["acceptance_final"]
    assert out["acceptance_at_half_width"] > out["acceptance_final"]
    assert os.path.exists(tmp_path / "adaptation_ntru.json")
