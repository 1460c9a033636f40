# coding: utf-8
"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from semiclassical_tpu.ops import pallas_batched_det


def test_pallas_det_vs_lapack():
    rng = np.random.default_rng(0)
    for n, r in [(100, 7), (256, 60), (300, 12), (128, 1)]:
        A = (np.eye(r)
             + 0.4 * (rng.standard_normal((n, r, r))
                      + 1j * rng.standard_normal((n, r, r))) / np.sqrt(r)
             ).astype(np.complex64)
        d = np.asarray(pallas_batched_det(jnp.asarray(A)))
        dn = np.linalg.det(A.astype(np.complex128))
        assert np.abs(d - dn).max() / np.abs(dn).max() < 1e-5, (n, r)


def test_pallas_det_padding():
    """n not a multiple of the tile: identity padding must not leak."""
    rng = np.random.default_rng(1)
    r = 5
    A = (2 * np.eye(r)
         + 0.1 * rng.standard_normal((7, r, r))).astype(np.complex64)
    d = np.asarray(pallas_batched_det(jnp.asarray(A)))
    dn = np.linalg.det(A.astype(np.complex128))
    assert d.shape == (7,)
    assert np.allclose(d, dn, rtol=1e-5)
