"""CLI runner: gate propagation + quick smoke run.

VERDICT r1 weak #3: the CLI treated only exceptions as failure, so
statistical-gate failures produced ok=true summaries. These tests pin the
fixed behavior: `all_passed: false` anywhere in an experiment's results
fails the run (nonzero exit, gates_passed=false in run_summary.json).
"""

import json

import pytest

from lattice_gaussian_mcmc_tpu.experiments import cli


def test_gates_passed_extraction():
    assert cli._gates_passed({"all_passed": True}) is True
    assert cli._gates_passed({"all_passed": False}) is False
    assert cli._gates_passed({"x": 1, "y": "z"}) is None
    assert cli._gates_passed({"suite": {"all_passed": True},
                              "extra": {"all_passed": False}}) is False
    assert cli._gates_passed({"rows": [1, 2, 3]}) is None


def test_gates_passed_recurses_into_lists():
    # per-row `passed` flags inside list payloads count (ADVICE r2:
    # list-carried gate verdicts were invisible to the run verdict)
    assert cli._gates_passed({"rows": [{"passed": True},
                                       {"passed": False}]}) is False
    assert cli._gates_passed({"rows": [{"passed": True},
                                       {"passed": True}]}) is True
    assert cli._gates_passed([{"x": {"passed": False}}]) is False
    # a non-boolean `passed` payload key is not a gate verdict
    assert cli._gates_passed({"passed": [1, 2]}) is None


def test_cli_gate_failure_exits_nonzero(tmp_path, monkeypatch):
    def fake_run(name, output_dir, quick, cpu):
        return {"experiment": name, "seconds": 0.0,
                "results": {"all_passed": False}}

    monkeypatch.setattr(cli, "run_experiment", fake_run)
    rc = cli.main(["--experiments", "validation",
                   "--output-dir", str(tmp_path)])
    assert rc == 1
    summary = json.loads((tmp_path / "run_summary.json").read_text())
    assert summary[0]["ok"] is False
    assert summary[0]["gates_passed"] is False


def test_cli_exception_exits_nonzero(tmp_path, monkeypatch):
    def fake_run(name, output_dir, quick, cpu):
        raise RuntimeError("boom")

    monkeypatch.setattr(cli, "run_experiment", fake_run)
    rc = cli.main(["--experiments", "validation",
                   "--output-dir", str(tmp_path)])
    assert rc == 1
    summary = json.loads((tmp_path / "run_summary.json").read_text())
    assert summary[0]["ok"] is False
    assert summary[0]["error"] == "boom"


@pytest.mark.slow
def test_cli_validation_quick_smoke(tmp_path):
    """End-to-end --quick run of the validation suite through the CLI."""
    rc = cli.main(["--experiments", "validation", "--quick", "--cpu",
                   "--output-dir", str(tmp_path)])
    summary = json.loads((tmp_path / "run_summary.json").read_text())
    assert summary[0]["experiment"] == "validation"
    results = json.loads(
        (tmp_path / "validation" / "validation_results.json").read_text())
    # sample-size-aware gates must hold even at quick budgets
    assert results["exp1"]["tvd"] < results["exp1"]["tvd_gate"]
    assert results["all_passed"] is True, results
    assert rc == 0
