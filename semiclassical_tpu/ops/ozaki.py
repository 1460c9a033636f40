# coding: utf-8
"""f64-accurate matrix products on the TPU MXU via error-free slicing.

XLA emulates float64 on TPU in software on the VPU; an f64 matmul never
touches the MXU and runs ~2 orders of magnitude below the chip's matmul
rate. The sGDML energy/gradient path is *required* to run at f64-level
accuracy (the permutation-expanded KRR weights are ~1e11 and the M-sums
cancel 1e5-1e7x — BASELINE.md round-3 finding; reference
gdml_predictor.py:159-197 runs f64 for the same reason), which round 4
left as the dominant cost of GDML dynamics.

This module implements the Ozaki error-free-transformation scheme
[Ozaki et al., Numer. Algorithms 59 (2012); the same construction behind
"DGEMM on tensor cores" literature]: split each f64 operand into `s`
slices of `t` mantissa bits aligned to a per-row/column power-of-two
scale,

    a = mu_row * sum_i s_i,   s_i = m_i 2^{-t i},  |m_i| <= 2^t,

so every slice is EXACTLY representable in bfloat16 (t <= 7 plus the
sign), every slice-pair product is an integer multiple of its 2^{-t(i+j)}
grid, and a K-term dot product of such multiples accumulates EXACTLY in
the MXU's float32 accumulator as long as

    2 t + ceil(log2 K) + 2 <= 24.

The f64 x f64 matmul then becomes sum_{i+j <= L} mu nu (A_i @ B_j): a
handful of NATIVE bf16 MXU passes (one per slice pair) plus an exact
f64 recombination; dropped pairs (i + j > L) contribute < 2^{-t(L-1)}
relative to |a||b| — below f64 roundoff for the default (t=7, L=9).
Constant operands (training descriptors, regression weights) are sliced
ONCE at model build; per-call slicing of the activations is a short
elementwise chain.

Validation: tests/test_ozaki.py gates the product against the f64
reference at ~1e-15 relative on adversarial magnitude spreads (which a
plain f32/bf16 matmul fails at ~1e-7).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["slice_f64", "slice_f64_host", "ozaki_matmul",
           "matmul_sliced", "SLICES", "TBITS"]

# 8 slices x 7 bits = 56 >= 53 mantissa bits of f64; with K <= 2^8 the
# slice-pair products accumulate exactly in f32 (7+7+8+2 = 24)
SLICES = 8
TBITS = 7
# keep pairs with i + j + 2 <= MAXLEVEL (1-indexed levels i+j in the
# docstring's terms); 9 drops only contributions < 2^-56 |a||b|
MAXLEVEL = 9


def _row_scale(x, axis):
    """Power-of-two scale 2^ceil(log2 max|x|) along `axis` (1.0 for all-zero
    rows), exactly representable at every precision."""
    mx = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    _, e = jnp.frexp(mx)                      # mx = m * 2^e, m in [0.5, 1)
    scale = jnp.ldexp(jnp.ones_like(mx), e)   # 2^ceil(log2 mx)
    return jnp.where(mx > 0, scale, 1.0)


def slice_f64(x, axis, slices=SLICES, t=TBITS):
    """Split f64 `x` into bf16 slices along the contraction axis.

    Returns (parts, scale): parts is a length-`slices` list of bf16 arrays
    with x = scale * sum_i parts_i exactly through slice `slices` (the
    tail beyond t*slices bits is rounded into the last slice's residual
    and dropped — 2^-56 relative for the defaults), scale is the f64
    per-row power-of-two with keepdims.
    """
    x = jnp.asarray(x, dtype=jnp.float64)
    scale = _row_scale(x, axis)
    y = x / scale                             # exact: power-of-two divide
    parts = []
    for i in range(1, slices + 1):
        grid = np.float64(2.0) ** (t * i)
        si = jnp.round(y * grid) / grid       # multiple of 2^-ti, |.|<=2^-t(i-1)
        y = y - si                            # exact (aligned grids)
        parts.append(si.astype(jnp.bfloat16))
    return parts, scale


def slice_f64_host(x, axis, slices=SLICES, t=TBITS):
    """Host (numpy) version of slice_f64 for constant operands — sliced
    once at model build, no device work."""
    x = np.asarray(x, dtype=np.float64)
    mx = np.max(np.abs(x), axis=axis, keepdims=True)
    e = np.frexp(np.where(mx > 0, mx, 1.0))[1]
    scale = np.where(mx > 0, np.ldexp(np.ones_like(mx), e), 1.0)
    y = x / scale
    parts = []
    for i in range(1, slices + 1):
        grid = np.float64(2.0) ** (t * i)
        si = np.round(y * grid) / grid
        y = y - si
        parts.append(jnp.asarray(si, dtype=jnp.bfloat16))
    return parts, jnp.asarray(scale)


def matmul_sliced(a_parts, a_scale, b_parts, b_scale, max_level=MAXLEVEL):
    """sum_{i+j <= max_level} (A_i @ B_j) * a_scale * b_scale, f64.

    a_parts: slices of A (n, k) along axis 1 (a_scale (n, 1));
    b_parts: slices of B (k, m) along axis 0 (b_scale (1, m)).
    Each pass is one native bf16 MXU matmul with an exact f32 accumulator;
    the cross-pass accumulation runs at f64 (exact to f64 roundoff).
    """
    total = None
    for i, ai in enumerate(a_parts, start=1):
        for j, bj in enumerate(b_parts, start=1):
            if i + j > max_level:
                continue
            p = jax.lax.dot_general(
                ai, bj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            p64 = p.astype(jnp.float64)
            total = p64 if total is None else total + p64
    return total * a_scale * b_scale


def ozaki_matmul(a, b, slices=SLICES, t=TBITS, max_level=MAXLEVEL):
    """A @ B for f64 operands through bf16 MXU passes (see module doc).

    K = a.shape[1] must satisfy 2 t + ceil(log2 K) + 2 <= 24 for the
    in-pass f32 accumulation to stay exact (K <= 256 at the defaults);
    larger K: split the contraction and call per block.
    """
    k = a.shape[-1]
    assert 2 * t + int(np.ceil(np.log2(max(k, 2)))) + 2 <= 24, (
        f"contraction length {k} overflows the exact f32 accumulator at "
        f"t={t}; reduce t or block the contraction")
    a_parts, a_scale = slice_f64(a, axis=-1, slices=slices, t=t)
    b_parts, b_scale = slice_f64(b, axis=0, slices=slices, t=t)
    return matmul_sliced(a_parts, a_scale, b_parts, b_scale, max_level)
