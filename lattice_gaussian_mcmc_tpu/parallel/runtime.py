"""Multi-host runtime: `jax.distributed` initialization, process-spanning
meshes, and host-0 metric writes.

This is the entry point the reference entirely lacks (its multiprocess chain
scaling, /root/reference/experiments/dimension_scaling.py:801-886, forks
OS processes that share nothing). TPU-native replacement: every host in a
pod slice runs the SAME program; `init_runtime` wires the processes into one
JAX distributed system, `global_mesh` builds a chain-sharded mesh over ALL
processes' devices, and the collectives in `parallel/collectives.py` run
over ICI/DCN unchanged — chains never communicate, diagnostics psum a few
scalars.

Launch patterns:
  * TPU pod slice (GKE/GCE): `init_runtime()` with no arguments — JAX
    auto-discovers the coordinator from the TPU environment.
  * Explicit (CPU/GPU clusters, CI): pass coordinator_address /
    num_processes / process_id, or set LATTICE_MCMC_COORDINATOR,
    LATTICE_MCMC_NUM_PROCESSES, LATTICE_MCMC_PROCESS_ID.

Per-chain PRNG keys are fold_in(chain_id)-indexed (utils/prng.py), so
results are bitwise identical for any process/device layout of the same
chain count — verified by tests/integration/test_multihost.py, which runs
sharded_imhk_chains over a real 2-process CPU mesh and diffs against the
single-process result.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lattice_gaussian_mcmc_tpu.parallel.mesh import CHAIN_AXIS

_ENV_COORD = "LATTICE_MCMC_COORDINATOR"
_ENV_NPROC = "LATTICE_MCMC_NUM_PROCESSES"
_ENV_PID = "LATTICE_MCMC_PROCESS_ID"


@dataclasses.dataclass(frozen=True)
class RuntimeInfo:
    """What `init_runtime` established."""

    distributed: bool
    process_index: int
    process_count: int
    n_local_devices: int
    n_global_devices: int
    coordinator: Optional[str] = None


def init_runtime(coordinator_address: Optional[str] = None,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None,
                 local_device_ids=None) -> RuntimeInfo:
    """Initialize the multi-host JAX runtime (idempotent).

    With no arguments and no LATTICE_MCMC_* env vars this is a single-process
    no-op UNLESS JAX can auto-discover a cluster (TPU pod metadata, SLURM),
    in which case `jax.distributed.initialize()` runs with auto-discovery.
    Must be called before any other JAX API touches the backend.
    """
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])

    want_distributed = coordinator_address is not None
    if want_distributed:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
    else:
        # TPU pod / SLURM auto-discovery: initialize() is a no-op on a
        # single-process environment in recent JAX only when cluster
        # detection fails, so attempt it and fall back silently.
        try:
            if jax.process_count() == 1 and _cluster_detectable():
                jax.distributed.initialize()
        except Exception:
            pass

    return RuntimeInfo(
        distributed=jax.process_count() > 1,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        n_local_devices=jax.local_device_count(),
        n_global_devices=jax.device_count(),
        coordinator=coordinator_address,
    )


def _cluster_detectable() -> bool:
    """True if a known cluster environment is present (TPU pod metadata,
    SLURM step) — used to gate auto `jax.distributed.initialize()`."""
    env = os.environ
    return bool(env.get("TPU_WORKER_HOSTNAMES") or env.get("SLURM_JOB_ID")
                or env.get("COORDINATOR_ADDRESS"))


def is_primary() -> bool:
    """True on process 0 — the only process that writes metrics/artifacts."""
    return jax.process_index() == 0


def global_mesh(axis_name: str = CHAIN_AXIS) -> Mesh:
    """1D mesh over ALL processes' devices (jax.devices() is the global list
    after init_runtime). Chains are embarrassingly parallel, so one axis
    spans ICI and DCN alike."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def put_global(x, mesh: Mesh, spec: P):
    """Place a host array onto a (possibly process-spanning) mesh.

    Single-process: plain device_put. Multi-process: every process holds the
    same full `x` (chain keys and lattice data are derived from seeds, not
    communicated) and contributes its addressable shards — the standard
    multihost pattern for replicated-input SPMD.
    """
    sharding = NamedSharding(mesh, spec)
    local = {d for d in mesh.devices.flat
             if d.process_index == jax.process_index()}
    if len(local) == mesh.size:
        return jax.device_put(x, sharding)
    # typed PRNG keys can't round-trip through numpy: ship the raw key data
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                     jax.dtypes.prng_key):
        impl = jax.random.key_impl(x)
        data = put_global(jax.random.key_data(x), mesh,
                          P(*(spec + (None,))))
        return jax.random.wrap_key_data(data, impl=impl)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def all_processes_array(x):
    """Gather a sharded array to a full host copy on every process (small
    results only — diagnostics, not chains)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        x, tiled=True))


def write_metrics(path: str, obj) -> None:
    """JSON metric write, host-0 only (every process computes the same
    replicated diagnostics; only one writes)."""
    if not is_primary():
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=float)
