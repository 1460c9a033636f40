# coding: utf-8
"""Gates for the Ozaki error-free-slicing f64 matmul (ops/ozaki.py).

The scheme's promise: f64-roundoff-level products out of native bf16 MXU
passes. The adversarial cases here (KRR-scale magnitudes ~1e11 with
cancellation, wide dynamic range within rows) are exactly where a plain
f32/bf16 matmul loses 7+ digits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semiclassical_tpu.ops.ozaki import (matmul_sliced, ozaki_matmul,
                                         slice_f64, slice_f64_host)


def _rel_err(approx, exact):
    scale = np.max(np.abs(exact)) or 1.0
    return np.max(np.abs(np.asarray(approx) - exact)) / scale


def test_slicing_reconstructs_f64():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((17, 136)) * np.exp(
        rng.uniform(-3, 3, size=(17, 136)))
    parts, scale = jax.jit(lambda a: slice_f64(a, axis=-1))(x)
    recon = np.zeros_like(x)
    for p in parts:
        recon += np.asarray(p, dtype=np.float64)
    recon *= np.asarray(scale)
    # the device slicer works through a 3-component f32 split (72 >= 53
    # bits per element); the row-relative grid keeps 8 x 7 = 56 bits and
    # the stream-join residue adds round at ~2^-52 of the row scale
    assert _rel_err(recon, x) < 2 ** -52


def test_matches_f64_matmul_gaussian():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((64, 136))
    b = rng.standard_normal((136, 50))
    exact = a @ b
    got = jax.jit(ozaki_matmul)(a, b)
    assert _rel_err(got, exact) < 1e-14
    # the f32 matmul is nowhere near (sanity that the gate means something)
    loose = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    assert _rel_err(loose, exact) > 1e-9


def test_matches_f64_at_krr_scales():
    """Magnitudes of the coumarin sGDML pack: |alpha| ~ 1e11 weights
    against ~O(1) descriptors, result cancels ~1e5x."""
    rng = np.random.default_rng(2)
    xs = 1.0 / rng.uniform(2.0, 12.0, size=(32, 136))      # descriptors
    A = rng.standard_normal((200, 136)) * 7e11             # expanded alphas
    exact = xs @ A.T
    got = jax.jit(ozaki_matmul)(xs, A.T)
    assert _rel_err(got, exact) < 1e-14


def test_wide_dynamic_range_rows():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((8, 100)) * 10.0 ** rng.integers(
        -8, 8, size=(8, 100))
    b = rng.standard_normal((100, 8)) * 10.0 ** rng.integers(
        -8, 8, size=(100, 8))
    exact = a @ b
    got = jax.jit(ozaki_matmul)(a, b)
    # error is relative to the row/column maxima (same contract as the
    # f64 accumulation itself)
    assert _rel_err(got, exact) < 1e-13


def test_zero_rows_and_exact_zero():
    a = np.zeros((4, 16))
    b = np.zeros((16, 4))
    got = np.asarray(jax.jit(ozaki_matmul)(a, b))
    assert np.all(got == 0.0)


def test_constant_operand_host_slicing():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((16, 136))
    b = rng.standard_normal((136, 24)) * 1e10
    b_parts, b_scale = slice_f64_host(b, axis=0)

    @jax.jit
    def f(a):
        a_parts, a_scale = slice_f64(a, axis=-1)
        return matmul_sliced(a_parts, a_scale, b_parts, b_scale)

    assert _rel_err(f(a), a @ b) < 1e-14


def test_contraction_length_guard():
    a = np.zeros((4, 4096))
    b = np.zeros((4096, 4))
    with pytest.raises(AssertionError, match="overflows"):
        ozaki_matmul(a, b)
