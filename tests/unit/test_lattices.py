"""Lattice constructions (reference tests/unit/test_lattices.py: ABC
contract, Z^n closed forms, CVP=rounding, q-ary construction, GS stability).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
    qary_lattice,
    rlwe_lattice,
    module_lattice,
    estimate_bkz_security,
    falcon_parameters,
    dilithium_parameters,
)
from lattice_gaussian_mcmc_tpu.lattices.base import (
    gaussian_heuristic,
    smoothing_parameter,
    covering_radius_bound,
)
from lattice_gaussian_mcmc_tpu.lattices.identity import decode_cvp_zn, sample_zn
from lattice_gaussian_mcmc_tpu.lattices.qary import qary_basis, dual_qary_basis
from lattice_gaussian_mcmc_tpu.ops.linalg import (
    babai_nearest_plane,
    gso_qr,
    dual_basis,
)


def test_identity_closed_forms():
    lat = identity_lattice(16, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(lat.gs_norms), np.ones(16))
    assert float(lat.log_det) == 0.0
    # eta closed form vs generic bound (generic >= closed form up to const)
    eta = float(smoothing_parameter(lat, 0.01))
    assert 0.5 < eta < 3.0


def test_identity_cvp_is_rounding(key):
    t = jnp.asarray([0.4, -1.6, 2.5001])
    np.testing.assert_allclose(np.asarray(decode_cvp_zn(t)),
                               [0.0, -2.0, 3.0])


def test_gso_sign_fix(rng):
    B = rng.normal(size=(6, 6))
    Q, R = gso_qr(jnp.asarray(B))
    assert np.all(np.diag(np.asarray(R)) > 0)
    np.testing.assert_allclose(np.asarray(Q @ R), B, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(6), atol=1e-10)


def test_babai_nearest_plane_identity():
    lat = identity_lattice(5, dtype=jnp.float64)
    t = jnp.asarray([0.2, 1.9, -0.6, 3.2, -2.8])
    x = babai_nearest_plane(lat.Q, lat.R, t)
    np.testing.assert_allclose(np.asarray(x), np.round(np.asarray(t)))


def test_babai_bound(rng):
    # ||Bx - t|| <= (1/2) sqrt(sum ||b*_i||^2) always
    B = rng.integers(-10, 11, size=(6, 6)).astype(np.float64)
    while abs(np.linalg.det(B)) < 1:
        B = rng.integers(-10, 11, size=(6, 6)).astype(np.float64)
    lat = lattice_from_basis(B, dtype=jnp.float64)
    for _ in range(10):
        t = jnp.asarray(rng.normal(scale=20, size=6))
        pt, x = lat.decode_cvp(t)
        err = np.linalg.norm(np.asarray(pt) - np.asarray(t))
        bound = float(covering_radius_bound(lat))
        assert err <= bound + 1e-9


def test_qary_det_and_membership(rng):
    n, k, q = 8, 4, 97
    lat = qary_lattice(n, k, q, seed=3, dtype=jnp.float64)
    # det = q^k
    np.testing.assert_allclose(float(lat.log_det), k * np.log(q), rtol=1e-9)
    # every basis column x satisfies x_head ≡ -A^T x_tail (mod q): verify by
    # construction all columns are integral and reduce correctly
    B = np.asarray(lat.basis)
    assert np.allclose(B, np.round(B))


def test_qary_dual_relation():
    rng = np.random.default_rng(0)
    A = rng.integers(0, 17, size=(3, 4))
    q = 17
    Bp = qary_basis(A, q).astype(np.float64)
    Bd = dual_qary_basis(A, q).astype(np.float64)
    # primal * q-scaled-dual relation: B_d^T B_p ≡ 0 mod q
    M = Bd.T @ Bp
    np.testing.assert_allclose(M % q, 0, atol=1e-9)
    # det product = q^n
    n = 7
    s1 = np.linalg.slogdet(Bp)[1] + np.linalg.slogdet(Bd)[1]
    np.testing.assert_allclose(s1, n * np.log(q), rtol=1e-9)


def test_rlwe_lattice_shape():
    h = np.array([1, 2, 3, 4])
    lat = rlwe_lattice(h, q=97, dtype=jnp.float64)
    assert lat.basis.shape == (8, 8)
    np.testing.assert_allclose(float(lat.log_det), 4 * np.log(97), rtol=1e-9)


def test_module_lattice_shape():
    hs = np.array([[1, 2], [3, 4]])
    lat = module_lattice(hs, q=17, dtype=jnp.float64)
    assert lat.basis.shape == (8, 8)


def test_security_estimates():
    # FALCON-512 key-recovery: dim 1024, key coefficient width ~4.05
    sec = estimate_bkz_security(n=1024, q=12289, sigma=4.05)
    assert 200 < sec["beta"] < 700
    assert sec["classical_bits"] > sec["quantum_bits"] - 50
    f = falcon_parameters(512)
    assert f["q"] == 12289
    d = dilithium_parameters(2)
    assert d["q"] == 8380417
    with pytest.raises(ValueError):
        falcon_parameters(256)


def test_security_estimate_instance_aware():
    # Regression (round-1 verdict): log_det must come from the instance, not
    # a hardcoded q^{n/2}. An unbalanced k=3n/4 q-ary lattice has a larger
    # determinant -> shorter-vector attack is harder -> higher beta.
    from lattice_gaussian_mcmc_tpu.lattices import (
        estimate_security_from_lattice)
    n, q, sigma = 256, 3329, 8.0
    bal = estimate_bkz_security(n=n, q=q, sigma=sigma, k=n // 2)
    # larger determinant -> target vector stands out more -> uSVP succeeds
    # at a smaller block size (the hardcoded-q^{n/2} bug hid this entirely)
    hi = estimate_bkz_security(n=n, q=q, sigma=sigma, k=3 * n // 4)
    assert hi["beta"] < bal["beta"]
    assert abs(hi["log2_det"] - (3 * n // 4) * np.log2(q)) < 1e-9
    # lattice-driven path reads meta (k, q) / GS profile
    lat = qary_lattice(n, n // 2, q=q, seed=0, dtype=jnp.float64)
    from_lat = estimate_security_from_lattice(lat, sigma)
    assert from_lat["beta"] == bal["beta"]
    # no meta: falls back to the actual Gram-Schmidt log-determinant
    lat2 = lattice_from_basis(np.asarray(lat.basis), dtype=jnp.float64)
    from_gs = estimate_security_from_lattice(lat2, sigma)
    assert abs(from_gs["log2_det"] - bal["log2_det"]) < 1e-6


def test_security_estimate_falcon512_crosscheck():
    # Cross-check against published FALCON-512 figures: the reference's
    # parameter table lists 108 bits (qary.py:450-491, a simplified model);
    # the FALCON spec's own core-SVP key-recovery estimate is ~133 classical
    # bits. Our ADPS16 uSVP condition with the 0.292 beta + 16.4 Becker cost
    # must land in that published range (key-recovery uSVP on the dim-1024
    # NTRU lattice, det q^512, key width 1.17 sqrt(q/2n)).
    import math
    q = 12289
    sigma_key = 1.17 * math.sqrt(q / 2048)
    sec = estimate_bkz_security(n=1024, q=q, sigma=sigma_key, k=512)
    assert 100 < sec["classical_bits"] < 160
    assert sec["quantum_bits"] < sec["classical_bits"]


def test_gaussian_heuristic_scaling():
    lat = identity_lattice(64, dtype=jnp.float64)
    gh = float(gaussian_heuristic(lat))
    assert abs(gh - np.sqrt(64 / (2 * np.pi * np.e))) < 1e-9


def test_dual_basis():
    rng = np.random.default_rng(1)
    B = rng.normal(size=(4, 4))
    D = dual_basis(jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(D.T @ B), np.eye(4), atol=1e-9)


def test_sample_zn_moments(key):
    z = sample_zn(key, n=16, sigma=4.0, shape=(5000,))
    assert z.shape == (5000, 16)
    assert abs(float(jnp.mean(z))) < 0.05
    assert abs(float(jnp.std(z)) - 4.0) < 0.1


def test_zn_closed_forms_extra(key):
    from lattice_gaussian_mcmc_tpu.lattices.identity import (
        kissing_number_zn,
        successive_minima_zn,
        theta_series_zn,
        validate_identity_lattice,
    )
    assert kissing_number_zn(8) == 16
    np.testing.assert_array_equal(successive_minima_zn(4), np.ones(4))
    # theta_3(0, q)^n = (1 + 2q + 2q^4 + ...)^n
    t = float(theta_series_zn(0.1, 1))
    assert abs(t - (1 + 2 * 0.1 + 2 * 0.1**4 + 2 * 0.1**9)) < 1e-9
    checks = validate_identity_lattice(n=4, sigma=2.0, n_samples=20_000)
    assert checks["all_passed"], checks
