"""NTRU keygen / NTRUSolve / NTT (reference tests/test_ntru.py:20-287 —
poly arithmetic, NTRUSolve, FALCON params, det = q^n)."""

import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.lattices.ntru import (
    _adjoint,
    _field_norm,
    _galois,
    _polymul_negacyclic,
    ducas_prest_bound,
    ntru_keygen,
    ntru_lattice,
    ntru_public_basis,
    ntru_secret_basis,
    ntru_solve,
    verify_ntru_basis,
)
from lattice_gaussian_mcmc_tpu.ops.ntt import NegacyclicNTT


def slow_polymul(a, b, n):
    c = np.zeros(2 * n, dtype=object)
    for i in range(n):
        for j in range(n):
            c[i + j] += int(a[i]) * int(b[j])
    return [int(c[i] - c[i + n]) for i in range(n)]


def test_kronecker_polymul_matches_schoolbook(rng):
    n = 16
    for _ in range(5):
        a = rng.integers(-1000, 1000, n).tolist()
        b = rng.integers(-1000, 1000, n).tolist()
        assert _polymul_negacyclic(a, b, n) == slow_polymul(a, b, n)


def test_kronecker_polymul_bigint():
    n = 4
    a = [12345678901234567890, -98765432109876543210, 1, 0]
    b = [-1, 2, -3, 4]
    assert _polymul_negacyclic(a, b, n) == slow_polymul(a, b, n)


def test_field_norm_identity(rng):
    # N(f)(x^2) = f(x) * f(-x) mod (x^n + 1)
    n = 8
    f = rng.integers(-5, 6, n).tolist()
    nf = _field_norm(f)
    prod = _polymul_negacyclic(f, _galois(f), n)
    assert all(c == 0 for c in prod[1::2])
    assert prod[0::2] == nf


def test_adjoint_involution(rng):
    f = rng.integers(-9, 10, 8).tolist()
    assert _adjoint(_adjoint(f)) == f


def test_ntt_mul_and_inverse(rng):
    ntt = NegacyclicNTT(16, 12289)
    a = rng.integers(-6, 7, 16)
    b = rng.integers(-6, 7, 16)
    assert np.array_equal(ntt.mul(a, b),
                          np.array(slow_polymul(a, b, 16)) % 12289)
    if ntt.is_invertible(a):
        ia = ntt.inv(a)
        e = np.zeros(16, dtype=np.int64)
        e[0] = 1
        assert np.array_equal(ntt.mul(a, ia), e)


def test_ntru_solve_small():
    # n=2: f = 4 + x (field norm 17), g = 1 - 2x (field norm 5); coprime
    q = 17
    F, G = ntru_solve([4, 1], [1, -2], q)
    chk = np.array(_polymul_negacyclic([4, 1], G, 2), dtype=object) - \
        np.array(_polymul_negacyclic([1, -2], F, 2), dtype=object)
    assert int(chk[0]) == q and int(chk[1]) == 0


def test_ntru_solve_rejects_noncoprime():
    # field norms 10 and 5 share gcd 5, which does not divide q=17
    with pytest.raises(ValueError):
        ntru_solve([3, 1], [1, -2], 17)


@pytest.mark.parametrize("n", [16, 64])
def test_keygen_verifies(n):
    key = ntru_keygen(n, q=12289, seed=2)
    checks = verify_ntru_basis(key)
    assert all(checks.values()), checks


def test_secret_basis_gs_quality():
    key = ntru_keygen(64, q=12289, seed=3)
    B = ntru_secret_basis(key).astype(np.float64)
    R = np.linalg.qr(B)[1]
    gs = np.abs(np.diag(R))
    # Ducas-Prest-style quality: good keys keep max GS norm within ~2x of
    # 1.17 sqrt(q)
    assert gs.max() < 2.0 * ducas_prest_bound(64, 12289)
    assert gs.min() > 10.0


def test_public_basis_det():
    key = ntru_keygen(16, q=12289, seed=4)
    B = ntru_public_basis(key["h"], 12289).astype(np.float64)
    sign, logdet = np.linalg.slogdet(B)
    np.testing.assert_allclose(logdet, 16 * np.log(12289), rtol=1e-9)


def test_ntru_lattice_pytree(tmp_path):
    import jax.numpy as jnp
    lat = ntru_lattice(16, q=12289, seed=5, cache_dir=str(tmp_path),
                       dtype=jnp.float64)
    assert lat.basis.shape == (32, 32)
    np.testing.assert_allclose(float(lat.log_det), 16 * np.log(12289),
                               rtol=1e-8)
    # cache round-trip
    lat2 = ntru_lattice(16, q=12289, seed=5, cache_dir=str(tmp_path),
                        dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(lat.basis), np.asarray(lat2.basis))


def test_ternary_keys():
    key = ntru_keygen(16, q=12289, seed=6, ternary=True)
    assert set(np.unique(key["f"])) <= {-1, 0, 1}
    assert all(verify_ntru_basis(key).values())
