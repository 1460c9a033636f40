# coding: utf-8
"""Linear algebra helpers.

Two categories, deliberately separated for the TPU design:

* **Host-side (numpy)** spectral decompositions of the small, *constant* width
  matrices Gamma (symmetric sqrtm, pseudo-inverses, pseudo-determinants,
  null-space projectors). In the reference these run on the device per
  propagator construction (reference propagators.py:25-82, 124-179, 493-531);
  here they run once on the host so that no eigendecomposition — and more
  importantly no *dynamic rank* — ever enters a jitted function. The rank of
  Gamma becomes a static Python int and the null-space projector U a fixed
  (d, r) matrix baked into the compiled program.

* **Device-side (jax)** batched determinants / inverses of small complex
  matrices over the trajectory axis — the per-step hot ops of the HK/WM
  prefactors (reference propagators.py:999, 1255, 1332, 1352-1359).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# small float, threshold for considering eigenvalues as 0
# (reference propagators.py:16)
ZERO = 1.0e-8

__all__ = [
    "ZERO",
    "sym_eigh",
    "sym_sqrtm",
    "is_symmetric_non_negative",
    "pseudo_inverse",
    "pseudo_det",
    "nonzero_subspace",
    "batched_det",
    "batched_inv",
]


# ---------------------------------------------------------------------------
# host-side spectral helpers (numpy, float64)
# ---------------------------------------------------------------------------

def sym_eigh(A: np.ndarray):
    """Eigendecomposition of a real symmetric matrix, ascending eigenvalues."""
    A = np.asarray(A, dtype=np.float64)
    return np.linalg.eigh(A)


def sym_sqrtm(A: np.ndarray):
    """Square root of a symmetric real matrix and pseudo-inverse of the root.

    Returns (A^{1/2}, A^{+(-1/2)}) as complex arrays; negative eigenvalues are
    handled by the complex square root, zero eigenvalues (|e| <= ZERO) are
    excluded from the pseudo-inverse. Mirrors reference propagators.py:25-59.
    """
    e, V = sym_eigh(A)
    non_zero = np.abs(e) > ZERO
    ec = e.astype(np.complex128)
    Vc = V.astype(np.complex128)
    sqA = np.einsum("ij,j,kj->ik", Vc, np.sqrt(ec), Vc)
    sqA_pinv = np.einsum(
        "ij,j,kj->ik",
        Vc[:, non_zero],
        1.0 / np.sqrt(ec[non_zero]),
        Vc[:, non_zero],
    )
    return sqA, sqA_pinv


def is_symmetric_non_negative(A: np.ndarray, eps: float = 1.0e-6) -> bool:
    """Check that A is symmetric and positive semi-definite.

    Mirrors reference propagators.py:61-82.
    """
    A = np.asarray(A, dtype=np.float64)
    relerr = np.sum(np.abs(A - A.T)) / np.sum(np.abs(A))
    if relerr > eps:
        return False
    e, _ = np.linalg.eigh(A)
    return bool((e >= -ZERO).all())


def pseudo_inverse(A: np.ndarray) -> np.ndarray:
    """Moore-Penrose pseudo-inverse of a symmetric matrix via eigh,
    dropping eigenvalues with |e| <= ZERO."""
    e, V = sym_eigh(A)
    nz = np.abs(e) > ZERO
    return np.einsum("ij,j,kj->ik", V[:, nz], 1.0 / e[nz], V[:, nz])


def pseudo_det(A: np.ndarray, scale: float = 1.0) -> float:
    """Pseudo-determinant: product of non-zero eigenvalues of symmetric A,
    each divided by `scale` (used to absorb pi / 2pi factors as in the
    reference WM propagator, propagators.py:1107-1125)."""
    e, _ = sym_eigh(A)
    nz = np.abs(e) > ZERO
    return float(np.prod(e[nz] / scale))


def nonzero_subspace(A: np.ndarray, positive_only: bool = True) -> np.ndarray:
    """Orthonormal basis U (d, r) of the non-zero eigenspace of symmetric A.

    The reference keeps this projector for transforming prefactor matrices
    into the subspace complementary to the null space of Gamma
    (propagators.py:496-498, 994, 1246-1250). `r` is concrete here, so every
    downstream jitted shape is static.
    """
    e, V = sym_eigh(A)
    nz = (e > ZERO) if positive_only else (np.abs(e) > ZERO)
    return np.ascontiguousarray(V[:, nz])


# ---------------------------------------------------------------------------
# device-side batched small-matrix ops (jax)
# ---------------------------------------------------------------------------

def batched_det(A: jax.Array) -> jax.Array:
    """Determinant of a batch of small (complex) matrices, shape (n, r, r).

    Uses XLA's LU-based determinant. Kept behind this wrapper so the
    implementation can be swapped (e.g. a Pallas LU) without touching callers.
    """
    return jnp.linalg.det(A)


def batched_inv(A: jax.Array) -> jax.Array:
    """Inverse of a batch of small (complex) matrices, shape (n, r, r)."""
    return jnp.linalg.inv(A)
