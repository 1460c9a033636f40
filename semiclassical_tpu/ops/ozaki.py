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
    """Power-of-two scale ~2^ceil(log2 max|x|) along `axis` (1.0 for
    all-zero rows), exactly representable at every precision.

    The exponent is extracted at f32 (f64 frexp needs an s64
    bitcast-convert that XLA's TPU X64 rewrite does not implement); the
    f32 rounding of the max can move the scale by at most one binade in
    either direction, which only shifts which bits land in which slice —
    the slice mantissas stay <= 2^{t+1} (still bf16-exact, and the
    in-pass f32 accumulation keeps >= 1 bit of headroom at the default
    t=7, K<=256) and the reconstruction identity is unaffected. Operand
    magnitudes must sit inside the f32 exponent range (~1e+-38) — far
    beyond any KRR pack."""
    mx = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    mx32 = jnp.where(mx > 0, mx, 1.0).astype(jnp.float32)
    _, e = jnp.frexp(mx32)                    # mx32 = m * 2^e, m in [0.5, 1)
    scale = jnp.ldexp(jnp.ones_like(mx32), e).astype(x.dtype)
    return jnp.where(mx > 0, scale, 1.0)


def _round_to_grid_f32(z, grid_bits):
    """Round f32 z to multiples of 2^-grid_bits — native f32 ops only.
    Uses the round HLO, not the classic add-sub constant trick: this
    image runs XLA with --xla_allow_excess_precision, which algebraically
    simplifies (z + c) - c back to z."""
    up = np.float32(2.0) ** grid_bits
    return jnp.round(z * up) / up


def slice_f64(x, axis, slices=SLICES, t=TBITS):
    """Split f64 `x` into bf16 slices along the contraction axis.

    Returns (parts, scale): parts is a length-`slices` list of bf16 arrays
    with x = scale * sum_i parts_i through ~48 captured bits per element
    (the hi/lo-f32 working split below), scale is the f64 per-row
    power-of-two with keepdims.

    Implementation note (TPU): a direct f64 extract loop costs ~24
    emulated-f64 ops per element and MEASURED 0.59 ms per (2048, 136)
    activation — as much as all the bf16 passes it feeds. Instead the
    normalized value is split ONCE into a hi/lo f32 pair (2 emulated-f64
    ops) and all grid extraction runs in native f32 with the add-sub
    rounding trick; the hi stream fills the first `slices`//2 grids, the
    f32-exact remainder plus lo fills the rest.
    """
    x = jnp.asarray(x, dtype=jnp.float64)
    scale = _row_scale(x, axis)
    y = x / scale                             # exact: power-of-two divide
    # three-way f32 component split: 3 x 24 = 72 captured bits >= the
    # full f64 mantissa, at 3 emulated-f64 ops per element
    hi = y.astype(jnp.float32)                # bits 1..24 per element
    r64 = y - hi.astype(jnp.float64)
    mid = r64.astype(jnp.float32)             # bits 25..48
    lo = (r64 - mid.astype(jnp.float64)).astype(jnp.float32)  # bits 49..72

    parts = []
    # Each f32 component feeds the uniform-grid extraction for 3 slices,
    # then the next component joins at the following grid. The join
    # rounds BOTH streams to the slice grid and adds only the sub-grid
    # residues (a plain f32 pre-add would re-round the joining
    # component's low bits — measured 2^-44 reconstruction loss); the
    # residue add rounds at ~2^-52 of the row scale, below the slice
    # range. Mantissa bounds: rem after slice 3k is <= 0.5 * 2^-21k and
    # the joining component <= 2^-24k-ish, so the summed slice stays
    # within ~2^t (bf16-exact; joining later would break this).
    rem = hi
    for i in range(1, slices + 1):
        join = mid if i == 4 else (lo if i == 7 else None)
        si = _round_to_grid_f32(rem, t * i)
        rem = rem - si                        # exact: aligned grids
        if join is not None:
            sj = _round_to_grid_f32(join, t * i)
            rem = rem + (join - sj)
            si = si + sj                      # exact: same grid, small m
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
