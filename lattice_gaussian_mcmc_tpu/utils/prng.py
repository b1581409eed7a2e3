"""Counter-based PRNG discipline.

Every chain derives its key by folding the chain id into a base key, and every
step folds the step index — so results are bitwise independent of how chains
are batched or sharded across a mesh (mesh-shape-independent reproducibility,
the TPU-native analogue of the reference's global-seed discipline,
cf. reference tests/conftest.py:17-18).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chain_keys(key: jax.Array, n_chains: int) -> jax.Array:
    """Derive one key per chain by folding in the chain index.

    Unlike `jax.random.split`, folding by index is stable under changes in
    the total number of chains: chain i always gets the same key.
    """
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))


def fold_step(key: jax.Array, step: jax.Array) -> jax.Array:
    """Key for a given step of a chain."""
    return jax.random.fold_in(key, step)
