"""Lattice as a JAX pytree + derived quantities as pure functions.

Design stance (SURVEY.md section 7): instead of the reference's stateful
`Lattice` ABC with caching (`src/lattices/base.py:16-341`), a lattice is an
immutable pytree holding the basis and its GSO, built once (QR on device) and
then passed by value into jitted samplers/diagnostics. All the reference's
derived quantities — dual basis, Gaussian heuristic, smoothing parameter,
covering radius, first-minimum estimate, Babai nearest-plane / CVP decoding —
are pure functions of that pytree.

Convention: basis columns are the lattice basis vectors; a lattice point is
`basis @ x` for integer coefficient vector x (same convention as the
reference, klein.py:218).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

from lattice_gaussian_mcmc_tpu.ops import linalg as _linalg
from lattice_gaussian_mcmc_tpu.ops.theta import smoothing_parameter_zn


@flax.struct.dataclass
class Lattice:
    """Immutable lattice pytree.

    Fields:
      basis:    (n, n) basis matrix, columns = basis vectors.
      Q, R:     QR of basis with R_ii > 0 (GSO; b*_i = R_ii Q[:, i]).
      gs_norms: (n,) Gram-Schmidt norms ||b*_i|| = R_ii.
      name, meta: static metadata (not traced).
    """

    basis: jnp.ndarray
    Q: jnp.ndarray
    R: jnp.ndarray
    gs_norms: jnp.ndarray
    name: str = flax.struct.field(pytree_node=False, default="lattice")
    meta: Dict[str, Any] = flax.struct.field(pytree_node=False, default_factory=dict)

    @property
    def n(self) -> int:
        return self.basis.shape[0]

    @property
    def min_gs_norm(self):
        return jnp.min(self.gs_norms)

    @property
    def max_gs_norm(self):
        return jnp.max(self.gs_norms)

    @property
    def log_det(self):
        """log |det(basis)| = sum log ||b*_i||."""
        return jnp.sum(jnp.log(self.gs_norms))

    def dual_basis(self):
        return _linalg.dual_basis(self.basis)

    def nearest_plane(self, target):
        """Babai nearest-plane integer coefficients for `target`."""
        return _linalg.babai_nearest_plane(self.Q, self.R, target)

    def decode_cvp(self, target):
        """(lattice_point, coeffs) closest-plane decoding of `target`."""
        return _linalg.decode_cvp(self.basis, self.Q, self.R, target)


def lattice_from_basis(basis, name: str = "lattice",
                       meta: Optional[Dict[str, Any]] = None,
                       dtype=None, host_gso: Optional[bool] = None) -> Lattice:
    """Build the lattice pytree: push basis to device, GSO via QR.

    (Parity: reference SimpleLattice eager GS+dual, src/lattices/simple.py:39-64.)

    `host_gso=True` computes the QR in float64 on the host (numpy) and
    downcasts the factors to the device dtype. On TPU (f32-only linalg) this
    matters for ill-conditioned bases: the conditional sigmas
    sigma_i = sigma / R_ii inherit the full f64 accuracy of R's diagonal
    instead of f32-QR rounding (SURVEY.md section 7 "f64 and numerical
    parity"). The extra cost is one host-side QR at build time.
    """
    basis = jnp.asarray(basis, dtype=dtype)
    if basis.ndim != 2 or basis.shape[0] != basis.shape[1]:
        raise ValueError(f"basis must be square, got {basis.shape}")
    if host_gso is None:
        # f32 device QR loses ~1e-3 relative accuracy on reduced crypto
        # bases (measured); default to the exact host path there
        host_gso = basis.dtype == jnp.float32
    if host_gso:
        Bh = np.asarray(basis, dtype=np.float64)
        Qh, Rh = np.linalg.qr(Bh)
        sign = np.sign(np.diag(Rh))
        sign[sign == 0] = 1.0
        Qh = Qh * sign[None, :]
        Rh = Rh * sign[:, None]
        Q = jnp.asarray(Qh, dtype=basis.dtype)
        R = jnp.asarray(Rh, dtype=basis.dtype)
    else:
        Q, R = _linalg.gso_qr(basis)
    gs = jnp.abs(jnp.diagonal(R))
    return Lattice(basis=basis, Q=Q, R=R, gs_norms=gs, name=name,
                   meta=dict(meta or {}))


# ---------------------------------------------------------------------------
# Derived analytic quantities (pure functions).
# ---------------------------------------------------------------------------


def gaussian_heuristic(lattice: Lattice):
    """sigma_GH = sqrt(n / (2 pi e)) * det^{1/n}
    (reference src/lattices/base.py:158-169)."""
    n = lattice.n
    return math.sqrt(n / (2 * math.pi * math.e)) * jnp.exp(lattice.log_det / n)


def first_minimum_estimate(lattice: Lattice):
    """Gaussian-heuristic estimate of lambda_1
    (reference src/lattices/base.py:316-333)."""
    n = lattice.n
    return math.sqrt(n / (2 * math.pi * math.e)) * jnp.exp(lattice.log_det / n)


def smoothing_parameter(lattice: Lattice, eps: float = 0.01):
    """Upper bound on eta_eps(L) via lambda_1(L*) >= 1/max||b*_i||
    (reference src/lattices/base.py:171-192 uses the dual-first-minimum
    bound; for Z^n this reduces to the closed form)."""
    return smoothing_parameter_zn(lattice.n, eps) * lattice.max_gs_norm


def covering_radius_bound(lattice: Lattice):
    """Babai bound mu(L) <= (1/2) sqrt(sum ||b*_i||^2). (The reference's
    base.py:205-216 uses the looser (1/2) sum ||b*_i||; we keep the standard
    nearest-plane bound, which is what the guarantee actually gives.)"""
    return 0.5 * jnp.sqrt(jnp.sum(lattice.gs_norms**2))


def volume(lattice: Lattice):
    return jnp.exp(lattice.log_det)


def is_integer_basis(basis, tol: float = 1e-9) -> bool:
    b = np.asarray(basis)
    return bool(np.all(np.abs(b - np.round(b)) < tol))


def coeffs_from_points(lattice: Lattice, points, tol: float = 1e-6):
    """Recover integer coefficients x with basis @ x = point (batched least
    squares + rounding; reference src/samplers/base.py:98-118
    `sample_coefficients`). Returns (coeffs, max_residual)."""
    pts = jnp.asarray(points, dtype=lattice.basis.dtype)
    squeeze = pts.ndim == 1
    if squeeze:
        pts = pts[None, :]
    x = jnp.linalg.solve(lattice.basis, pts.T).T
    xi = jnp.round(x)
    resid = jnp.max(jnp.abs(pts - xi @ lattice.basis.T))
    if squeeze:
        xi = xi[0]
    return xi, resid
