"""Numerically-stable log-space helpers (parity: reference
`src/samplers/utils.py:328-355` stable logsumexp/softmax; here they are thin
wrappers over `jax.scipy` so they fuse under jit)."""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp as _lse


def logsumexp(a, axis=None, b=None, keepdims=False):
    return _lse(a, axis=axis, b=b, keepdims=keepdims)


def log_softmax(a, axis=-1):
    return a - _lse(a, axis=axis, keepdims=True)


def softmax(a, axis=-1):
    return jnp.exp(log_softmax(a, axis=axis))


def logmeanexp(a, axis=None):
    n = a.size if axis is None else a.shape[axis]
    return _lse(a, axis=axis) - jnp.log(n)
