"""Reduction: native C++ LLL/BKZ, Python fallback, quality analytics
(reference tests/unit/test_reduction.py)."""

import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.lattices.qary import qary_basis
from lattice_gaussian_mcmc_tpu.reduction import (
    basis_quality_profile,
    bkz_reduce,
    compare_bases,
    hermite_factor,
    lll_reduce,
    lll_with_removals,
    local_gs_swap_improve,
    native_available,
    orthogonality_defect,
    recommend_strategy,
    reduction_cost_model,
    sampling_reduce,
)
from lattice_gaussian_mcmc_tpu.reduction.lll import (
    is_lll_reduced,
    lll_reduce_python,
)


def _rand_basis(rng, n=12, lo=-30, hi=31):
    while True:
        B = rng.integers(lo, hi, size=(n, n)).astype(np.int64)
        if abs(np.linalg.det(B.astype(float))) > 1:
            return B


def test_native_available():
    assert native_available()  # g++ is in the image


def test_native_lll_reduces_and_preserves_det(rng):
    B = _rand_basis(rng)
    R = lll_reduce(B)
    assert is_lll_reduced(R)
    np.testing.assert_allclose(
        abs(np.linalg.det(R.astype(float))),
        abs(np.linalg.det(B.astype(float))), rtol=1e-6)


def test_python_lll_agrees_with_native_quality(rng):
    B = _rand_basis(rng, n=8)
    Rn = lll_reduce(B)
    Rp = lll_reduce(B, force_python=True)
    assert is_lll_reduced(Rp)
    gs_n = basis_quality_profile(Rn)["max_gs_norm"]
    gs_p = basis_quality_profile(Rp)["max_gs_norm"]
    assert abs(gs_n - gs_p) / gs_n < 0.5  # same ballpark


def test_bkz_improves_or_matches_lll(rng):
    A = rng.integers(0, 97, size=(12, 12))
    B = qary_basis(A, 97)
    R1 = lll_reduce(B)
    R2 = bkz_reduce(R1, beta=10, max_tours=3)
    b1_lll = np.linalg.norm(R1[:, 0].astype(float))
    b1_bkz = np.linalg.norm(R2[:, 0].astype(float))
    assert b1_bkz <= b1_lll + 1e-9
    np.testing.assert_allclose(
        np.linalg.slogdet(R2.astype(float))[1],
        np.linalg.slogdet(B.astype(float))[1], rtol=1e-9)


def test_bkz_general_insertion_preserves_lattice(rng):
    """General BKZ insertion (r3): enumeration solutions whose last nonzero
    coefficient is not +-1 are inserted via unimodular Euclidean row ops
    (reference fplll semantics, src/lattices/reduction.py:238-318) instead
    of being silently skipped. The output must be the SAME lattice (integer
    unimodular transform) with a shortest vector <= LLL's."""
    if not native_available():
        pytest.skip("needs the native library")
    for trial in range(4):
        B = _rand_basis(rng, n=20).astype(np.float64)
        R = bkz_reduce(B, beta=10, max_tours=3)
        U = np.linalg.solve(B, R)  # columns convention: R = B @ U
        assert np.allclose(U, np.round(U), atol=1e-6), "non-integer transform"
        assert abs(abs(np.linalg.det(np.round(U))) - 1.0) < 1e-6
        sv_lll = np.min(np.linalg.norm(lll_reduce(B), axis=0))
        sv_bkz = np.min(np.linalg.norm(R, axis=0))
        assert sv_bkz <= sv_lll + 1e-9


def test_quality_metrics(rng):
    B = _rand_basis(rng, n=6)
    prof = basis_quality_profile(B)
    assert prof["orthogonality_defect"] >= 1.0 - 1e-9
    assert prof["gs_ratio"] >= 1.0
    R = lll_reduce(B)
    cmp = compare_bases(B, R)
    assert cmp["defect_improvement"] >= 0.99


def test_sampling_reduce(rng):
    B = _rand_basis(rng, n=8)
    out = sampling_reduce(B, target_sigma=50.0)
    assert out["max_gs"] <= basis_quality_profile(B)["max_gs_norm"] + 1e-9
    assert "strategy" in out


def test_lll_with_removals(rng):
    B = _rand_basis(rng, n=8)
    kept = lll_with_removals(B, keep=5)
    assert kept.shape == (8, 5)


def test_local_gs_swap_never_worse(rng):
    B = _rand_basis(rng, n=8).astype(float)
    out = local_gs_swap_improve(B)
    assert (basis_quality_profile(out)["max_gs_norm"] <=
            basis_quality_profile(B)["max_gs_norm"] + 1e-9)


def test_cost_model_and_strategy():
    cm = reduction_cost_model(64, beta=20)
    assert cm["lll_ops"] > 0 and cm["bkz_enum_ops_log2"] > 0
    assert recommend_strategy("identity", 64)["strategy"] == "none"
    assert "BKZ" in recommend_strategy("qary", 256)["strategy"]


def test_reduction_rejects_non_integer():
    with pytest.raises(ValueError):
        lll_reduce(np.array([[1.5, 0.0], [0.0, 1.0]]))


def test_native_lll_quality_qary_128():
    """Output must be delta-LLL-reduced: size-reduced (|mu| <= 0.52) and
    Lovasz-satisfying, checked against a fresh f64 GSO. Regression for the
    FP-drift escape the incremental-GSO rewrite fixed at n >= 256."""
    from lattice_gaussian_mcmc_tpu.lattices import qary_lattice
    from lattice_gaussian_mcmc_tpu.reduction import lll_reduce

    lat = qary_lattice(128, 64, q=3329, seed=42)
    R = lll_reduce(np.asarray(lat.basis), delta=0.99)
    _, RR = np.linalg.qr(np.asarray(R, dtype=np.float64))
    rd = np.abs(np.diag(RR))
    MU = RR.T / np.diag(RR)[None, :]
    assert np.abs(np.tril(MU, -1)).max() <= 0.52
    mu_od = np.abs(np.diag(np.tril(MU, -1)[1:, :-1]))
    lov = (0.99 * rd[:-1] ** 2) <= (rd[1:] ** 2 + mu_od ** 2 * rd[:-1] ** 2) \
        * (1 + 1e-9)
    assert lov.all()
