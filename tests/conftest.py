"""Test configuration: force CPU with 8 virtual devices (fake mesh for
sharding tests, SURVEY.md section 4 "multi-node testing") and enable float64
so statistical validation runs at full precision (the reference's exact-pmf
methodology, conftest.py:17-18 deterministic seeding)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU: the axon sitecustomize registers the tunneled-TPU backend at
# interpreter startup and exports JAX_PLATFORMS=axon, so the env var is
# ignored — the config update is the only override that sticks. Tests must
# not contend with benchmarks for the single real chip.
# GRAFT_TPU_TESTS=1 opts IN to the real TPU for the hardware-marked tests
# (run those alone: the chip deadlocks under two concurrent processes).
if os.environ.get("GRAFT_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SEED = 42


@pytest.fixture
def key():
    return jax.random.key(SEED)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(SEED)


@pytest.fixture
def rng():
    return np.random.default_rng(SEED)


# Canned bases (parity with reference tests/conftest.py:64-93)
@pytest.fixture
def identity_2d():
    return np.eye(2)


@pytest.fixture
def random_basis_4d(rng):
    # well-conditioned random integer basis
    while True:
        B = rng.integers(-5, 6, size=(4, 4)).astype(np.float64)
        if abs(np.linalg.det(B)) > 1:
            return B


@pytest.fixture
def pathological_basis():
    # nearly-dependent columns: det = 1e-6, last GS norm ~ 7e-7
    return np.array([[1.0, 1.0], [1.0, 1.0 + 1e-6]])


# Statistical thresholds (reference quality gates, SANITY_CHECK_SUMMARY.md)
TVD_THRESHOLD = 0.02
KL_THRESHOLD = 0.05
MOMENT_TOLERANCE_SE = 4.0  # sigmas of standard error
