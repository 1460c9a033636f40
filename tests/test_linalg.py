# coding: utf-8
"""Unit tests for linear-algebra helpers (oracle: scipy, numpy)."""

import numpy as np
import scipy.linalg as sla

import jax.numpy as jnp

from semiclassical_tpu import linalg


def test_sym_sqrtm_vs_scipy():
    rng = np.random.default_rng(0)
    n = 5
    A = 5.0 * 2.0 * (rng.random((n, n)) - 0.5)
    A = A + A.T
    sqA, isqA = linalg.sym_sqrtm(A)
    sqA_scipy = sla.sqrtm(A)
    isqA_scipy = sla.inv(sla.sqrtm(A))
    assert np.allclose(sqA, sqA_scipy)
    assert np.allclose(isqA, isqA_scipy)


def test_sym_sqrtm_singular():
    """Pseudo-inverse of the root ignores the null space."""
    rng = np.random.default_rng(1)
    V, _ = np.linalg.qr(rng.random((4, 4)))
    e = np.array([2.0, 1.0, 0.5, 0.0])
    A = V @ np.diag(e) @ V.T
    sqA, isqA = linalg.sym_sqrtm(A)
    # sqA isqA should be the projector on the non-zero subspace
    proj = V[:, :3] @ V[:, :3].T
    assert np.allclose(sqA @ isqA, proj, atol=1e-10)


def test_is_symmetric_non_negative():
    rng = np.random.default_rng(2)
    n = 5
    e = rng.random(n) + 0.1
    V = 5.0 * 2.0 * (rng.random((n, n)) - 0.5)
    A = V @ np.diag(e) @ V.T
    assert linalg.is_symmetric_non_negative(A)
    A[0, 1] += 0.5
    assert not linalg.is_symmetric_non_negative(A)


def test_pseudo_det_and_inverse():
    rng = np.random.default_rng(3)
    V, _ = np.linalg.qr(rng.random((5, 5)))
    e = np.array([3.0, 2.0, 1.0, 0.5, 0.0])
    A = V @ np.diag(e) @ V.T
    assert np.isclose(linalg.pseudo_det(A), 3.0 * 2.0 * 1.0 * 0.5)
    assert np.isclose(linalg.pseudo_det(A, scale=2.0), 3.0 * 2.0 * 1.0 * 0.5 / 16.0)
    iA = linalg.pseudo_inverse(A)
    proj = V[:, :4] @ V[:, :4].T
    assert np.allclose(A @ iA, proj, atol=1e-10)


def test_nonzero_subspace():
    rng = np.random.default_rng(4)
    V, _ = np.linalg.qr(rng.random((5, 5)))
    e = np.array([3.0, 2.0, 1.0, 0.0, 0.0])
    A = V @ np.diag(e) @ V.T
    U = linalg.nonzero_subspace(A)
    assert U.shape == (5, 3)
    # U spans the range of A
    assert np.allclose(U @ U.T @ A, A, atol=1e-10)


def test_batched_det_inv_complex():
    rng = np.random.default_rng(5)
    A = (rng.standard_normal((32, 6, 6))
         + 1j * rng.standard_normal((32, 6, 6)) + 3 * np.eye(6))
    Aj = jnp.asarray(A)
    assert np.allclose(np.asarray(linalg.batched_det(Aj)), np.linalg.det(A))
    assert np.allclose(np.asarray(linalg.batched_inv(Aj)), np.linalg.inv(A))


def test_schur_det_inv():
    """Schur-recursion det/inv (the TPU path) vs LAPACK, incl. odd sizes."""
    rng = np.random.default_rng(7)
    for r in (1, 2, 3, 5, 12, 60):
        A = (np.eye(r) + 0.5 * (rng.standard_normal((8, r, r))
                                + 1j * rng.standard_normal((8, r, r)))
             / np.sqrt(r))
        Aj = jnp.asarray(A)
        det, inv = linalg._det_inv_schur(Aj)
        assert np.allclose(np.asarray(det), np.linalg.det(A),
                           rtol=1e-10), r
        assert np.allclose(np.asarray(inv), np.linalg.inv(A),
                           atol=1e-10), r
        det2 = linalg._det_schur(Aj)
        assert np.allclose(np.asarray(det2), np.linalg.det(A), rtol=1e-10), r


def test_lu_det_inv():
    """Hand-written batched LU with partial pivoting vs LAPACK."""
    rng = np.random.default_rng(8)
    A = (rng.standard_normal((16, 9, 9))
         + 1j * rng.standard_normal((16, 9, 9)) + 2 * np.eye(9))
    Aj = jnp.asarray(A)
    assert np.allclose(np.asarray(linalg._det_jax(Aj)), np.linalg.det(A))
    assert np.allclose(np.asarray(linalg._inv_jax(Aj)), np.linalg.inv(A),
                       atol=1e-10)


def test_det_peel():
    """Panel-peeling determinant vs LAPACK, including non-multiple sizes."""
    rng = np.random.default_rng(9)
    for r in (5, 12, 25, 60):
        A = (np.eye(r) + 0.3 * (rng.standard_normal((8, r, r))
                                + 1j * rng.standard_normal((8, r, r)))
             / np.sqrt(r))
        det = linalg._det_peel(jnp.asarray(A), b=12)
        assert np.allclose(np.asarray(det), np.linalg.det(A), rtol=1e-10), r


def test_pallas_det_lanes_interpret():
    """The trajectory-in-lanes LU det kernel (TPU production path for
    `batched_det`) against LAPACK in interpreter mode, complex64 accuracy."""
    from semiclassical_tpu.ops import pallas_batched_det_lanes

    rng = np.random.default_rng(10)
    r, n = 12, 20  # n deliberately not a multiple of the tile (padding path)
    A = (np.eye(r)[None] + 0.3 * (rng.standard_normal((n, r, r))
                                  + 1j * rng.standard_normal((n, r, r)))
         / np.sqrt(r))
    det = np.asarray(pallas_batched_det_lanes(jnp.asarray(A, jnp.complex64),
                                              tile=16))
    ref = np.linalg.det(A)
    assert np.abs(det - ref).max() / np.abs(ref).min() < 1e-4


def test_batched_mode_product():
    """Transcendental-free mode product (exponent-bitcast normalization +
    halving tree) vs the exact f64 product, both dtypes, odd mode counts,
    magnitudes spanning six decades, and an exact-zero factor.

    Production note: measured on v5e this primitive LOST to the fused
    log+arctan2 form inside the HK/WM diag scans (XLA fuses the
    transcendentals into the surrounding elementwise chain; the tree
    forces extra fusion boundaries), so the scans keep log space — this
    gate keeps the primitive correct for range-critical uses."""
    import jax

    from semiclassical_tpu.linalg import batched_mode_product

    rng = np.random.default_rng(7)
    for dtype, cd, tol in ((np.float32, jnp.complex64, 2e-5),
                           (np.float64, jnp.complex128, 1e-13)):
        for d in (1, 5, 60):
            mag = 10.0 ** rng.uniform(-3, 3, size=(500, d))
            ang = rng.uniform(-np.pi, np.pi, size=(500, d))
            zr = (mag * np.cos(ang)).astype(dtype)
            zi = (mag * np.sin(ang)).astype(dtype)
            exact = np.prod(zr.astype(np.float64)
                            + 1j * zi.astype(np.float64), axis=1)
            got = np.asarray(jax.jit(
                batched_mode_product, static_argnames="cdtype")(
                    jnp.asarray(zr), jnp.asarray(zi), cd))
            ok = (np.abs(exact) < 1e30) & (np.abs(exact) > 1e-30)
            rel = np.abs(got[ok] - exact[ok]) / np.abs(exact[ok])
            assert rel.max() < tol, (dtype, d, rel.max())
        zr[:, 0] = 0.0
        zi[:, 0] = 0.0
        got = np.asarray(batched_mode_product(jnp.asarray(zr),
                                              jnp.asarray(zi), cd))
        assert (got == 0).all()

    # factors whose |z|^2 under/overflows the dtype (|z| = 1e+-30 in f32:
    # |z|^2 = 1e+-60 is 0.0/inf) while the PRODUCT is representable — the
    # exponent pre-scaling must recover the exact result
    ang = np.array([[0.3] * 4 + [-0.2] * 4], dtype=np.float32)
    mag = np.array([[1e-30] * 4 + [1e30] * 4], dtype=np.float32)
    zr = (mag * np.cos(ang)).astype(np.float32)
    zi = (mag * np.sin(ang)).astype(np.float32)
    got = np.asarray(batched_mode_product(jnp.asarray(zr),
                                          jnp.asarray(zi), jnp.complex64))
    assert abs(got[0] - np.exp(0.4j)) < 1e-6, got
    zr64 = np.array([[1e-200] * 3 + [1e200] * 3], dtype=np.float64)
    got = np.asarray(batched_mode_product(
        jnp.asarray(zr64), jnp.asarray(np.zeros_like(zr64)), jnp.complex128))
    assert abs(got[0] - 1.0) < 1e-13, got
