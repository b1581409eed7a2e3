"""Unified sampler facade (C16 parity) + new spectral decomposition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lattice_gaussian_mcmc_tpu.diagnostics.spectral import (
    transition_decomposition,
    triangular_structure_analysis,
)
from lattice_gaussian_mcmc_tpu.lattices import (
    identity_lattice,
    lattice_from_basis,
)
from lattice_gaussian_mcmc_tpu.samplers.unified import UnifiedLatticeSampler


def test_unified_identity_dispatch(key):
    lat = identity_lattice(8, dtype=jnp.float64)
    s = UnifiedLatticeSampler(lat, sigma=3.0)
    assert s.algorithm == "direct"
    pts = s.sample(key, 2000)
    assert pts.shape == (2000, 8)
    assert abs(float(jnp.std(pts)) - 3.0) < 0.1


def test_unified_generic_dispatch(key):
    basis = np.array([[2.0, 1.0], [0.0, 3.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    s = UnifiedLatticeSampler(lat, sigma=5.0)
    assert s.algorithm == "klein"
    pts = s.sample(key, 500)
    assert pts.shape == (500, 2)
    s_exact = UnifiedLatticeSampler(lat, sigma=5.0, exact=True)
    assert s_exact.algorithm == "imhk"
    pts = s_exact.sample(key, 100)
    assert pts.shape == (100, 2)


def test_unified_decode(key, rng):
    B = rng.integers(-4, 5, size=(4, 4)).astype(np.float64)
    while abs(np.linalg.det(B)) < 1:
        B = rng.integers(-4, 5, size=(4, 4)).astype(np.float64)
    lat = lattice_from_basis(B, dtype=jnp.float64)
    s = UnifiedLatticeSampler(lat, sigma=2.0)
    x_star = rng.integers(-2, 3, size=4).astype(np.float64)
    t = jnp.asarray(B @ x_star + rng.normal(scale=0.05, size=4))
    pt, coeffs = s.decode(key, t, stochastic=True, n_sweeps=30, n_chains=16)
    np.testing.assert_allclose(np.asarray(coeffs), x_star)
    pt2, coeffs2 = s.decode(key, t, stochastic=False)
    assert pt2.shape == (4,)


def test_unified_short_vector(key):
    basis = np.array([[3.0, 1.0], [1.0, 3.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    s = UnifiedLatticeSampler(lat, sigma=4.0)
    v = np.asarray(s.short_vector(key, 2000))
    assert np.linalg.norm(v) > 0
    assert np.linalg.norm(v) < 8.0  # should find something short


def test_transition_decomposition():
    lw = jnp.asarray([0.0, 0.1, -0.1, 0.05])
    d = transition_decomposition(lw)
    assert 0.8 < d["jump_mass"] <= 1.0
    assert abs(d["jump_mass"] + d["rejection_mass"] - 1.0) < 1e-9


def test_triangular_structure():
    P = np.array([[0.5, 0.5, 0.0], [0.0, 0.5, 0.5], [0.0, 0.0, 1.0]])
    t = triangular_structure_analysis(P)
    assert t["upper_mass"] > t["lower_mass"]
    assert t["asymmetry"] > 0


def test_unified_smk_dispatch(key):
    """algorithm="smk" routes to the symmetric Metropolis-Klein sampler
    (BASELINE config 4) and samples at the target law."""
    basis = np.array([[2.0, 1.0], [0.0, 3.0]])
    lat = lattice_from_basis(basis, dtype=jnp.float64)
    s = UnifiedLatticeSampler(lat, sigma=5.0, algorithm="smk",
                              proposal_sigma=3.0)
    assert s.algorithm == "smk"
    pts = s.sample(key, 400, burn_in=30)
    assert pts.shape == (400, 2)
    assert 0.0 < s._impl.acceptance_rate <= 1.0


def test_smk_sample_iid_xla(key):
    """SMKSampler.sample_iid (XLA fallback off-TPU) reaches the target
    moments from Klein init."""
    from lattice_gaussian_mcmc_tpu.samplers import SMKSampler

    lat = identity_lattice(4, dtype=jnp.float64)
    s = SMKSampler(lat, sigma=3.0, proposal_sigma=2.0)
    pts = s.sample_iid(key, 512, n_steps=20)
    assert pts.shape == (512, 4)
    assert abs(float(jnp.std(pts)) - 3.0) < 0.25
    assert 0.0 < s.acceptance_rate <= 1.0


def test_unified_rejects_unknown_algorithm():
    lat = identity_lattice(4, dtype=jnp.float64)
    import pytest
    with pytest.raises(ValueError):
        UnifiedLatticeSampler(lat, sigma=3.0, algorithm="nope")


def test_unified_peikert_dispatch(key):
    """algorithm='peikert' routes to the convolution sampler (valid sigma)
    and raises its validity error below r*s1."""
    import numpy as np

    from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
    from lattice_gaussian_mcmc_tpu.samplers.unified import (
        UnifiedLatticeSampler,
    )
    rng = np.random.default_rng(3)
    B0 = np.triu(rng.uniform(-0.5, 0.5, (8, 8))) + np.eye(8)
    lat = lattice_from_basis(B0, dtype=jnp.float64)
    s1 = float(np.linalg.norm(B0, 2))
    s = UnifiedLatticeSampler(lat, sigma=4.0 * s1, algorithm="peikert")
    assert s.algorithm == "peikert"
    pts = s.sample(key, 512)
    assert pts.shape == (512, 8)
    with pytest.raises(ValueError):
        UnifiedLatticeSampler(lat, sigma=0.1, algorithm="peikert")
