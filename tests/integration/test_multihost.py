"""Multi-host runtime: 2-process CPU cluster vs single-process, bitwise.

Replaces (for real) the reference's multiprocess chain scaling
(/root/reference/experiments/dimension_scaling.py:801-886): two OS processes
are wired into ONE JAX distributed system via `init_runtime`, run
`sharded_imhk_chains` unchanged over the process-spanning mesh, and the
gathered chain outputs must be bitwise identical to a single-process run —
the fold_in chain-key discipline makes results independent of the
process/device layout.
"""

import hashlib
import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_digest():
    """The same workload as _multihost_worker, on the local 8-device mesh."""
    from lattice_gaussian_mcmc_tpu.lattices import lattice_from_basis
    from lattice_gaussian_mcmc_tpu.parallel import make_mesh
    from lattice_gaussian_mcmc_tpu.parallel.collectives import (
        sharded_imhk_chains,
    )
    from lattice_gaussian_mcmc_tpu.samplers import klein_precompute

    rng = np.random.default_rng(0)
    n = 6
    basis = np.triu(rng.integers(-2, 3, (n, n))).astype(np.float64)
    np.fill_diagonal(basis, 3.0)
    lat = lattice_from_basis(basis)
    pre = klein_precompute(lat, 4.0)
    mesh = make_mesh(8)
    coeffs, _, stats = sharded_imhk_chains(
        jax.random.key(0), pre, n_chains=16, n_samples=5, mesh=mesh,
        thin=1, burn_in=2)
    full = np.asarray(coeffs)
    return (hashlib.sha256(np.ascontiguousarray(full).tobytes()).hexdigest(),
            float(stats["acceptance_rate"]))


@pytest.mark.integration
@pytest.mark.slow
def test_two_process_mesh_bitwise_matches_single(tmp_path):
    port = _free_port()
    coordinator = f"localhost:{port}"
    out = tmp_path / "mh.json"
    procs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "lattice_gaussian_mcmc_tpu.parallel._multihost_worker",
             coordinator, "2", str(pid), "4", str(out)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"
    result = json.loads(out.read_text())
    assert result["distributed"] is True
    assert result["process_count"] == 2
    assert result["n_global_devices"] == 8

    digest, acc = _single_process_digest()
    assert result["digest"] == digest, (
        "2-process mesh output differs from single-process run")
    assert abs(result["acceptance"] - acc) < 1e-12


def test_init_runtime_single_process_noop():
    from lattice_gaussian_mcmc_tpu.parallel.runtime import (
        RuntimeInfo,
        init_runtime,
        is_primary,
    )
    info = init_runtime()
    assert isinstance(info, RuntimeInfo)
    assert info.distributed is False
    assert info.process_index == 0
    assert is_primary()


def test_put_global_single_process_matches_device_put():
    from jax.sharding import PartitionSpec as P
    from lattice_gaussian_mcmc_tpu.parallel import make_mesh
    from lattice_gaussian_mcmc_tpu.parallel.runtime import put_global
    from lattice_gaussian_mcmc_tpu.utils.prng import chain_keys

    mesh = make_mesh(8)
    x = jnp.arange(32.0).reshape(32, 1)
    y = put_global(x, mesh, P("chains"))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    keys = chain_keys(jax.random.key(0), 16)
    ks = put_global(keys, mesh, P("chains"))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(ks)),
        np.asarray(jax.random.key_data(keys)))
