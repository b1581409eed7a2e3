"""Device-mesh utilities: chain sharding over TPU slices.

The reference's only parallelism is `multiprocessing.Pool` over independent
chains (dimension_scaling.py:801-886). The TPU-native replacement
(SURVEY.md section 2.3): the chain-batch axis is sharded over a
`jax.sharding.Mesh` with `shard_map`; per-chain PRNG keys are derived by
`fold_in(chain_id)` so results are bitwise independent of mesh shape; only
diagnostics communicate (psum/all_gather over ICI/DCN).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = CHAIN_AXIS) -> Mesh:
    """1D mesh over (the first n of) all available devices. Chains are
    embarrassingly parallel, so one axis suffices; multi-host slices simply
    extend the same axis over DCN."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def chain_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for a leading-chain-axis array."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_chain_keys(key: jax.Array, n_chains: int, mesh: Mesh) -> jax.Array:
    """(n_chains,) keys, chain-indexed (mesh-shape independent), placed with
    the chain axis sharded over the mesh."""
    from lattice_gaussian_mcmc_tpu.parallel.runtime import put_global
    from lattice_gaussian_mcmc_tpu.utils.prng import chain_keys
    keys = chain_keys(key, n_chains)
    return put_global(keys, mesh, P(CHAIN_AXIS))
