"""Forced-failure (red-path) coverage for EVERY experiment driver's gates.

VERDICT r3 weak #6: only the validation driver had an end-to-end test
proving a *statistical* gate failure reaches `all_passed: false` and a
nonzero `lattice-mcmc` exit. Here each driver runs its real --quick path
through `cli.main` with a corrupted sampler/measurement seam:

  - law corruption (conditional widths scaled 1.7x) for the drivers whose
    gates are statistical comparisons against theory/enumeration
    (validation, convergence, crypto, sensitivity),
  - a broken stochastic decoder for decoding (must never lose to Babai),
  - a dead accept rule for adaptation (acceptance pinned at 0),
  - a pathological clock for the timing-gated drivers (benchmark: negative
    rates; scaling: superlinear complexity exponent),
  - a zero-acceptance sharded kernel for mesh.

Each test asserts rc == 1 AND the driver's own artifact records
`all_passed: false` (the gate logic itself tripped — not an exception).
Reference CI discipline analogue: .github/workflows/tests.yml:124-164.
"""

import json

import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.experiments import cli


def _corrupt_law(monkeypatch, module):
    """Scale every conditional width by 1.7: the sampled law is wrong but
    nothing crashes — only statistical gates can catch it."""
    real = module.klein_precompute

    def bad(lattice, sigma, center=None, window=None):
        pre = real(lattice, sigma, center, window)
        return pre.replace(sigmas=pre.sigmas * 1.7)

    monkeypatch.setattr(module, "klein_precompute", bad)


class _AcceleratingClock:
    """perf_counter whose increments grow geometrically: later (larger-dim)
    measurements look catastrophically slower -> complexity gate trips."""

    def __init__(self, factor):
        self.t = 0.0
        self.step = 1e-4
        self.factor = factor

    def perf_counter(self):
        self.t += self.step
        self.step *= self.factor
        return self.t


class _BackwardsClock:
    def __init__(self):
        self.t = 1e6

    def perf_counter(self):
        self.t -= 1.0
        return self.t


def _run_and_assert_red(tmp_path, name, artifact_rel):
    rc = cli.main(["--experiments", name, "--quick", "--cpu",
                   "--output-dir", str(tmp_path)])
    assert rc == 1, f"{name}: corrupted run must exit nonzero"
    summary = {s["experiment"]: s
               for s in json.loads((tmp_path / "run_summary.json").read_text())}
    assert summary[name]["gates_passed"] is False, summary[name]
    payload = json.loads((tmp_path / artifact_rel).read_text())
    assert cli._gates_passed(payload) is False
    return payload


@pytest.mark.slow
def test_red_validation(tmp_path, monkeypatch):
    from lattice_gaussian_mcmc_tpu.experiments import klein_validation
    _corrupt_law(monkeypatch, klein_validation)
    _run_and_assert_red(tmp_path, "validation",
                        "validation/validation_results.json")


@pytest.mark.slow
def test_red_convergence(tmp_path, monkeypatch):
    from lattice_gaussian_mcmc_tpu.experiments import convergence_study
    _corrupt_law(monkeypatch, convergence_study)
    _run_and_assert_red(tmp_path, "convergence",
                        "convergence/convergence_study.json")


@pytest.mark.slow
def test_red_crypto(tmp_path, monkeypatch):
    from lattice_gaussian_mcmc_tpu.experiments import cryptographic
    _corrupt_law(monkeypatch, cryptographic)
    _run_and_assert_red(tmp_path, "crypto", "crypto/crypto_results.json")


@pytest.mark.slow
def test_red_sensitivity(tmp_path, monkeypatch):
    from lattice_gaussian_mcmc_tpu.experiments import parameter_sensitivity
    _corrupt_law(monkeypatch, parameter_sensitivity)
    _run_and_assert_red(tmp_path, "sensitivity",
                        "sensitivity/parameter_sensitivity.json")


@pytest.mark.slow
def test_red_scaling(tmp_path, monkeypatch):
    from lattice_gaussian_mcmc_tpu.experiments import dimension_scaling
    monkeypatch.setattr(dimension_scaling, "time", _AcceleratingClock(50.0))
    payload = _run_and_assert_red(tmp_path, "scaling",
                                  "scaling/dimension_scaling.json")
    gated = [r for r in payload["asymptotics"] if "passed" in r]
    assert gated and not gated[-1]["passed"]  # the complexity gate tripped


@pytest.mark.slow
def test_red_benchmark(tmp_path, monkeypatch):
    from lattice_gaussian_mcmc_tpu.experiments import benchmark
    monkeypatch.setattr(benchmark, "time", _BackwardsClock())
    payload = _run_and_assert_red(tmp_path, "benchmark",
                                  "benchmark/benchmark_results.json")
    assert any(r["samples_per_sec"] <= 0 for r in payload["sampling"])


@pytest.mark.slow
def test_red_mesh(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from lattice_gaussian_mcmc_tpu.experiments import mesh_scaling
    from lattice_gaussian_mcmc_tpu.parallel import collectives

    def dead_pallas(key, pre, n_chains, n_steps, mesh, tile=1024,
                    interpret=False):
        return (jnp.zeros((n_chains, pre.n), jnp.float32),
                jnp.zeros((n_chains,), jnp.float32), jnp.float32(0.0))

    monkeypatch.setattr(collectives, "sharded_imhk_pallas", dead_pallas)
    # keep the (slow, subprocess-spawning) process-scaling leg green and
    # fast; the red path under test is the pallas-acceptance gate
    monkeypatch.setattr(
        mesh_scaling, "measure_process_scaling",
        lambda *a, **k: [{"process_count": 2, "distributed": True,
                          "samples_per_sec": 1.0}])
    _run_and_assert_red(tmp_path, "mesh", "mesh/mesh_scaling.json")


@pytest.mark.slow
def test_red_decoding(tmp_path, monkeypatch):
    from lattice_gaussian_mcmc_tpu.experiments import decoding

    real = decoding.annealed_gibbs_decode

    def bad_gibbs(key, lattice, target, sigma0, n_sweeps=50, n_chains=64,
                  alpha=0.9, window=64):
        pt, coeffs, d2 = real(key, lattice, target, sigma0,
                              n_sweeps=n_sweeps, n_chains=n_chains)
        return pt, coeffs + 1.0, d2  # off-by-one decode: always wrong

    monkeypatch.setattr(decoding, "annealed_gibbs_decode", bad_gibbs)
    payload = _run_and_assert_red(tmp_path, "decoding",
                                  "decoding/decoding_results.json")
    assert payload["gates"]["stochastic_never_loses_to_babai"] is False


@pytest.mark.slow
def test_red_adaptation(tmp_path, monkeypatch):
    from lattice_gaussian_mcmc_tpu.samplers import adaptation as ad

    real = ad.adapt_sigma_smk

    def dead_accept(*args, **kw):
        st = real(*args, **kw)
        for h in st.history:
            h["acceptance"] = 0.0  # accept rule never fires
        return st

    monkeypatch.setattr(ad, "adapt_sigma_smk", dead_accept)
    payload = _run_and_assert_red(tmp_path, "adaptation",
                                  "adaptation/adaptation_ntru.json")
    assert payload["gates"]["converged_to_target"] is False
