"""Device-side lattice linear algebra: GSO via QR, Babai nearest-plane.

The reference computes Gram-Schmidt classically in Python
(`src/lattices/base.py:280-314`) and QR through LAPACK
(`src/samplers/klein.py:56-79`). Here GSO is the XLA QR with a sign fix so
R has a positive diagonal (identical convention to klein.py:69-72), and
Babai's nearest-plane (base.py:105-135) is the same backward-substitution
scan the Klein sampler uses, with rounding in place of a random draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gso_qr(basis):
    """QR of the basis (columns = basis vectors b_i) with R_ii > 0.

    Returns (Q, R). Gram-Schmidt vectors are b*_i = R_ii * Q[:, i] and the GS
    norms are diag(R).
    """
    Q, R = jnp.linalg.qr(basis)
    sign = jnp.sign(jnp.diagonal(R))
    sign = jnp.where(sign == 0, 1.0, sign)
    return Q * sign[None, :], R * sign[:, None]


def gram_schmidt_norms(basis):
    """||b*_i|| for all i (positive)."""
    _, R = gso_qr(basis)
    return jnp.abs(jnp.diagonal(R))


def gram_schmidt_vectors(basis):
    """The GS orthogonalization b*_i as columns of a matrix."""
    Q, R = gso_qr(basis)
    return Q * jnp.diagonal(R)[None, :]


def dual_basis(basis):
    """Dual basis D with D^T B = I (columns of inv(B)^T)."""
    return jnp.linalg.inv(basis).T


def babai_nearest_plane(Q, R, target):
    """Babai's nearest-plane: integer coefficients x with Bx ~ closest plane
    decoding of `target`. Backward substitution over i = n-1..0 with rounding:
        x_i = round((<q_i, t> - sum_{j>i} R_ij x_j) / R_ii).
    Pure scan — vmap over a batch of targets for throughput.
    """
    n = R.shape[0]
    cprime = jnp.dot(Q.T, target, precision=jax.lax.Precision.HIGHEST)
    r_diag = jnp.diagonal(R)

    def body(x, i):
        s = jnp.dot(R[i, :], x,
                    precision=jax.lax.Precision.HIGHEST)  # x[j]=0 for j<=i
        xi = jnp.round((cprime[i] - s) / r_diag[i])
        return x.at[i].set(xi), None

    x0 = jnp.zeros((n,), dtype=R.dtype)
    x, _ = jax.lax.scan(body, x0, jnp.arange(n - 1, -1, -1))
    return x


def decode_cvp(basis, Q, R, target):
    """Closest-vector decoding via nearest-plane; returns (lattice_point,
    coeffs) (reference src/lattices/base.py:137-156)."""
    x = babai_nearest_plane(Q, R, target)
    return jnp.dot(basis, x, precision=jax.lax.Precision.HIGHEST), x
