"""Checkpoint round-trip, dual-averaging adaptation, and profiling stats
(VERDICT r1 weak #8/#9 test-tail items)."""

import builtins

import jax
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.samplers.imhk import ChainState
from lattice_gaussian_mcmc_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)


def _state(n=4, c=7):
    return ChainState(
        coeffs=jnp.arange(float(c * n)).reshape(c, n),
        log_w=jnp.linspace(-2.0, 1.0, c),
        accepted=jnp.full((c,), 3, jnp.int32),
        steps=jnp.full((c,), 10, jnp.int32))


def test_checkpoint_roundtrip(tmp_path):
    state = _state()
    path = str(tmp_path / "ckpt")
    written = save_checkpoint(path, state, step=42)
    assert written
    restored, step = restore_checkpoint(path, state)
    assert step == 42
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_latest_of_many(tmp_path):
    path = str(tmp_path / "ckpt")
    for s in (1, 5, 3):
        save_checkpoint(path, _state(c=s + 1), step=s)
    restored, step = restore_checkpoint(path, _state(c=6))
    assert step == 5
    assert restored.coeffs.shape[0] == 6
    restored, step = restore_checkpoint(path, _state(c=2), step=1)
    assert step == 1


def test_checkpoint_npz_fallback(tmp_path, monkeypatch):
    """Force the orbax import to fail; the npz path must round-trip."""
    real_import = builtins.__import__

    def no_orbax(name, *a, **kw):
        if name.startswith("orbax"):
            raise ImportError("forced")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_orbax)
    state = _state()
    path = str(tmp_path / "ckpt")
    written = save_checkpoint(path, state, step=7)
    assert written.endswith(".npz")
    restored, step = restore_checkpoint(path, state)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored.coeffs),
                                  np.asarray(state.coeffs))


def test_restore_missing_returns_none(tmp_path):
    restored, step = restore_checkpoint(str(tmp_path / "nope"), _state())
    assert restored is None and step == -1


def test_dual_averaging_converges_to_target():
    """Drive dual averaging against a synthetic monotone acceptance model
    a(sigma) = sigma / (1 + sigma); it must settle near the sigma where
    a = target."""
    import math
    from lattice_gaussian_mcmc_tpu.samplers.adaptation import (
        dual_averaging_update,
    )
    target = 0.75   # solved by sigma = 3
    mu = math.log(1.0)
    log_sigma = mu
    h_sum = 0.0
    log_bar, wsum = 0.0, 0.0
    for t in range(1, 200):
        sigma = math.exp(log_sigma)
        observed = sigma / (1.0 + sigma)
        log_sigma, h_sum, eta = dual_averaging_update(
            mu, log_sigma, h_sum, t, target, observed)
        log_bar = (1 - eta) * log_bar + eta * log_sigma
    assert abs(math.exp(log_bar) - 3.0) < 0.5


def test_sampling_stats():
    from lattice_gaussian_mcmc_tpu.utils.profiling import SamplingStats
    s = SamplingStats(samples_generated=1000, time_elapsed=2.0,
                      acceptance_rate=0.9, ess=500.0)
    assert s.samples_per_second == 500.0
    assert s.ess_per_second == 250.0
    d = s.as_dict()
    assert d["samples_per_second"] == 500.0
    zero = SamplingStats()
    assert zero.samples_per_second == 0.0


def test_profile_trace_noop():
    from lattice_gaussian_mcmc_tpu.utils.profiling import profile_trace
    with profile_trace(None):
        x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0
