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
    "times_i",
    "real_dtype",
    "to_device",
    "from_device",
    "phase_exp",
    "complex_exp",
    "logspace_mode_product",
    "batched_mode_product",
    "sym_eigh",
    "sym_sqrtm",
    "is_symmetric_non_negative",
    "pseudo_inverse",
    "pseudo_det",
    "pseudo_logdet",
    "nonzero_subspace",
    "batched_det",
    "batched_inv",
    "batched_det_inv",
    "set_linalg_impl",
]




def real_dtype(cdtype):
    """float dtype matching a complex dtype."""
    return jnp.float32 if jnp.dtype(cdtype) == jnp.complex64 else jnp.float64


def to_device(x, dtype, sharding=None):
    """np -> jnp conversion that works for complex on TPU backends.

    The axon TPU backend implements neither complex128 programs nor
    host->device transfer of complex arrays (of any width) — but complex
    values *computed on device* are fine. So complex inputs are shipped as
    two real arrays and combined with lax.complex on device; real inputs
    take the plain path with the cast done host-side.

    `sharding`, if given, places the transferred array (for complex inputs:
    each real plane, so the combine happens shard-local and no complex
    array is ever resharded).
    """
    dtype = jnp.dtype(dtype)
    x = np.asarray(x)

    def place(arr):
        if sharding is not None:
            return jax.device_put(arr, sharding)
        return jnp.asarray(arr)

    if jnp.issubdtype(dtype, jnp.complexfloating):
        rtype = np.float32 if dtype == jnp.complex64 else np.float64
        return jax.lax.complex(place(x.real.astype(rtype)),
                               place(x.imag.astype(rtype)))
    return place(x.astype(dtype.type))


def from_device(x):
    """Device -> host fetch that works for complex arrays on TPU backends
    (complex transfers are unimplemented in either direction; real views
    transfer fine)."""
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return np.asarray(x.real) + 1j * np.asarray(x.imag)
    return np.asarray(x)


def batched_mode_product(z_re, z_im, cdtype):
    """prod over the mode axis (axis 1) of z = z_re + i z_im (n, d) real
    planes, returned as `cdtype` (n,) — WITHOUT transcendentals.

    The log-space form (sum of log |z|^2 + sum of arctan2, then
    exp/cos/sin) is range-safe but evaluates two transcendentals per
    (trajectory, mode) element — measured ~5.5 ms of the 11.4 ms 524k-
    trajectory HK diag step on v5e. Here each factor is instead scaled by
    an exact power of two read off its |z|^2 EXPONENT FIELD
    (j = floor(exponent/2), |z * 2^-j| in [1, 2)), the normalized complex
    product is taken by a static halving tree (exact phase, magnitude in
    [1, 2^d) — representable for any d <= 120 in f32), and the collected
    integer exponent re-enters as two power-of-two factors. Only integer
    ops and multiplies touch the (n, d) planes; the two exp2 calls act on
    (n,) scalars. Range contract: the RESULT magnitude must be
    representable in the real dtype — the same contract the previous
    complex_exp(log...) return value already imposed (prefactor dets are
    balanced/scaled to O(1) upstream: hk factors_diag, wm m_scale/Dbal).
    """
    rd = real_dtype(cdtype)
    if z_re.dtype == jnp.float64:
        ibits, mant, bias = jnp.int64, 52, 1023
    else:
        ibits, mant, bias = jnp.int32, 23, 127
    m2 = z_re * z_re + z_im * z_im
    # |z|^2 spans TWICE the exponent range of z: factors whose |z|^2
    # underflows (subnormal/zero, exponent field 0) or overflows (inf,
    # exponent field all-ones) would mis-normalise. Pre-scale those rows
    # by the exact power 2^{-+(bias-1)} and fold the shift into j — the
    # whole representable |z| range then normalises correctly (exact
    # zeros stay zero and zero the product, matching the log-space
    # form's -inf).
    pre = bias - 1                                 # even for f32 and f64
    field = (jax.lax.bitcast_convert_type(m2, ibits) >> mant)
    tiny = field == 0
    big = field == (2 * bias + 1)
    pscale = jnp.asarray(2.0, m2.dtype) ** pre
    adj = jnp.where(tiny, pscale, jnp.where(big, 1.0 / pscale, 1.0))
    zr0 = z_re * adj
    zi0 = z_im * adj
    m2 = zr0 * zr0 + zi0 * zi0
    k = (jax.lax.bitcast_convert_type(m2, ibits) >> mant) - bias
    # z = z_norm * 2^j: j = floor(k/2), shifted by the full pre-scale for
    # the adjusted rows (the 2^{-+pre} sits inside z_norm's normalisation)
    j = (k >> 1) - jnp.where(tiny, pre, 0) + jnp.where(big, pre, 0)
    # clamp so the constructed exponent field stays legal (only the exact-
    # zero rows hit the clamp, and any finite scale is correct for z = 0)
    js = jnp.clip((k >> 1), -(bias - 1), bias - 1)
    scale = jax.lax.bitcast_convert_type(
        (jnp.asarray(bias, ibits) - js) << mant, m2.dtype)
    zr = zr0 * scale
    zi = zi0 * scale
    sj = jnp.sum(j, axis=1)                        # (n,) int

    n, d = z_re.shape
    n2 = 1
    while n2 < d:
        n2 *= 2
    if n2 != d:                                    # pad with neutral 1+0i
        zr = jnp.concatenate(
            [zr, jnp.ones((n, n2 - d), zr.dtype)], axis=1)
        zi = jnp.concatenate(
            [zi, jnp.zeros((n, n2 - d), zi.dtype)], axis=1)
    h = n2 // 2
    while h >= 1:
        ar, ai = zr[:, :h], zi[:, :h]
        br, bi = zr[:, h:2 * h], zi[:, h:2 * h]
        zr, zi = ar * br - ai * bi, ar * bi + ai * br
        h //= 2
    zr, zi = zr[:, 0], zi[:, 0]

    # 2^sj in two exact halves: |sj| <= 2 * 60-ish + log2|result| stays
    # well inside the exponent range of each half
    a = sj >> 1
    fa = jnp.exp2(a.astype(m2.dtype))
    fb = jnp.exp2((sj - a).astype(m2.dtype))
    return jax.lax.complex(((zr * fa) * fb).astype(rd),
                           ((zi * fa) * fb).astype(rd))


def complex_exp(re, im, cdtype):
    """exp(re + i im) evaluated in the precision of re/im, returned as
    `cdtype`. Keeps large exponents accurate in f64 while the result is
    safe for complex64-only devices."""
    rd = real_dtype(cdtype)
    mag = jnp.exp(re)
    return jax.lax.complex((mag * jnp.cos(im)).astype(rd),
                           (mag * jnp.sin(im)).astype(rd))


def logspace_mode_product(z_re, z_im, cdtype, axis=1):
    """prod of (z_re + i z_im) over the mode `axis`, in log space:
    magnitudes as a sum of logs, phases as a sum of angles — range-safe at
    any mode count.  The shared primitive behind both propagators'
    diagonal-path determinants (HK `hk_prefactor_det`, WM detA/detM); any
    range/branch fix lands here once.  For the transcendental-free
    alternative (and why it measured slower in the fused HK step) see
    `batched_mode_product`."""
    log_mag = 0.5 * jnp.sum(jnp.log(z_re**2 + z_im**2), axis=axis)
    ang = jnp.sum(jnp.arctan2(z_im, z_re), axis=axis)
    return complex_exp(log_mag, ang, cdtype)


def phase_exp(s, cdtype):
    """exp(i s) at the precision of `cdtype`, with the angle reduced mod 2 pi
    *before* any down-cast — for long propagations the action S grows to
    ~1e4 and a bare f64 -> f32 cast would cost ~1e-3 rad of phase."""
    rd = real_dtype(cdtype)
    if s.dtype != rd:
        two_pi = 2.0 * np.pi
        s = s - two_pi * jnp.round(s / two_pi)
        s = s.astype(rd)
    return jnp.exp(times_i(s))


def times_i(x):
    """1j * x without materialising a complex128 constant.

    With x64 enabled, the Python literal ``1j`` is a weakly-typed complex128
    scalar; some TPU toolchains reject any complex128 constant even when the
    result dtype is complex64. ``lax.complex`` keeps everything in the
    operand's precision (f32 -> c64, f64 -> c128).
    """
    if jnp.iscomplexobj(x):
        return jax.lax.complex(-x.imag, x.real)
    return jax.lax.complex(jnp.zeros_like(x), x)


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


def pseudo_logdet(A: np.ndarray, scale: float = 1.0) -> float:
    """log of the pseudo-determinant of a PSD matrix (eigenvalues / scale).

    For d ~ 60+ modes the pseudo-determinants of the width matrices
    under/overflow even float64 (prod of ~1e-3 eigenvalues); WM's scalar
    prefactors are therefore combined in log space on the host.
    """
    e, _ = sym_eigh(A)
    nz = e > ZERO
    return float(np.sum(np.log(e[nz] / scale)))


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
#
# Two interchangeable implementations:
#
# * "xla"  — jnp.linalg.det/inv (LAPACK on CPU, XLA's LU custom call on TPU)
# * "jax"  — hand-written batched LU with partial pivoting expressed in
#   plain vectorised jnp ops (a fori_loop over columns with masked row
#   selection). This compiles to simple HLO everywhere — on TPU it avoids
#   the enormous complex128 LU custom-call lowering — and keeps the whole
#   batch axis vectorised (one argmax / one outer-product update per column
#   for all n matrices at once).
#
# Select via set_linalg_impl("jax"|"xla") or SEMI_LINALG_IMPL env var.

import os as _os

_LINALG_IMPL = _os.environ.get("SEMI_LINALG_IMPL", "auto")


def set_linalg_impl(name: str):
    """Choose the batched det/inv backend: "xla", "jax", "pallas", "lanes"
    or "auto".

    "lanes" uses the static-unrolled trajectory-in-lanes in-VMEM LU kernel
    (TPU; interpreter elsewhere) for `batched_det` — the production TPU
    path, 16x faster than the matmul-only Schur recursion (19.4 ms vs
    321 ms per (32768, 60, 60) complex det on v5e, scripts/det_bench.py).
    "pallas" is the older dual-copy fori-loop kernel. `batched_inv` /
    `batched_det_inv` stay on the Schur path in either mode.
    """
    global _LINALG_IMPL
    assert name in ("xla", "jax", "pallas", "lanes", "auto"), name
    _LINALG_IMPL = name


def _resolve_impl():
    if _LINALG_IMPL != "auto":
        return _LINALG_IMPL
    # XLA's complex LU on the TPU backend is numerically unreliable
    # (det of a 60x60 identity comes back as 1.03) and the LU custom call
    # does not exist there anyway; CPU LAPACK is exact and fast. On TPU the
    # Pallas lanes kernel carries `batched_det`, everything else uses the
    # matmul-only recursions ("jax").
    return "lanes" if jax.default_backend() == "tpu" else (
        "jax" if jax.default_backend() != "cpu" else "xla")


def _lu_factor_batched(A: jax.Array):
    """Batched LU with partial pivoting, vectorised over the leading axis.

    Returns (LU, parity) where LU holds L (unit diagonal, below) and U
    (on/above the diagonal) and parity is the +-1 permutation sign per
    matrix. Doolittle right-looking updates; the pivot search and row swap
    are masked vector ops, so the only sequential dimension is the matrix
    size r.
    """
    n, r, _ = A.shape
    dtype = A.dtype

    def body(k, carry):
        LU, parity = carry
        col = LU[:, :, k]
        mag = jnp.abs(col)
        row_ids = jnp.arange(r)[None, :]
        mag = jnp.where(row_ids >= k, mag, -jnp.inf)
        piv = jnp.argmax(mag, axis=1)                       # (n,)

        # swap rows k <-> piv
        batch = jnp.arange(n)
        row_k = LU[batch, k, :]
        row_p = LU[batch, piv, :]
        LU = LU.at[batch, k, :].set(row_p)
        LU = LU.at[batch, piv, :].set(row_k)
        parity = parity * jnp.where(piv == k, 1.0, -1.0)

        pivval = LU[:, k, k]                                # (n,)
        below = jnp.arange(r)[None, :] > k                  # (1, r)
        factors = jnp.where(below, LU[:, :, k] / pivval[:, None], 0.0)
        LU = LU.at[:, :, k].set(jnp.where(below, factors, LU[:, :, k]))
        right = jnp.arange(r)[None, :] > k
        update = factors[:, :, None] * jnp.where(right, LU[:, k, :],
                                                 0.0)[:, None, :]
        LU = LU - update
        return LU, parity

    parity0 = jnp.ones((n,), dtype=A.real.dtype)
    LU, parity = jax.lax.fori_loop(0, r, body, (A, parity0))
    return LU, parity


def _det_jax(A: jax.Array) -> jax.Array:
    LU, parity = _lu_factor_batched(A)
    diag = jnp.diagonal(LU, axis1=1, axis2=2)
    return jnp.prod(diag, axis=1) * parity.astype(A.dtype)


def _inv_jax(A: jax.Array) -> jax.Array:
    # Gauss-Jordan on [A | I], vectorised over the batch, partial pivoting.
    n, r, _ = A.shape
    aug = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(r, dtype=A.dtype), (n, r, r))], axis=2)

    def body(k, aug):
        col = jnp.abs(aug[:, :, k])
        row_ids = jnp.arange(r)[None, :]
        col = jnp.where(row_ids >= k, col, -jnp.inf)
        piv = jnp.argmax(col, axis=1)
        batch = jnp.arange(n)
        row_k = aug[batch, k, :]
        row_p = aug[batch, piv, :]
        aug = aug.at[batch, k, :].set(row_p)
        aug = aug.at[batch, piv, :].set(row_k)

        pivval = aug[:, k, k]
        row = aug[:, k, :] / pivval[:, None]
        aug = aug.at[:, k, :].set(row)
        factors = aug[:, :, k]
        mask = (jnp.arange(r)[None, :] != k)
        update = jnp.where(mask, factors, 0.0)[:, :, None] * row[:, None, :]
        return aug - update

    aug = jax.lax.fori_loop(0, r, body, aug)
    return aug[:, :, r:]


# ---------------------------------------------------------------------------
# Schur-complement recursion: batched det/inv built from matmuls only.
#
# det([[A, B], [C, D]]) = det(A) det(D - C A^{-1} B)
# inv via the block formulas. The recursion unrolls at trace time (static
# shapes), turning an (n, r, r) determinant into ~log2(r) levels of batched
# matmuls — which the MXU eats — with 2x2 closed-form base cases. No
# pivoting: the propagator matrices are well-conditioned (identity at t=0,
# smooth evolution), and correctness is cross-checked against LAPACK on CPU
# in the test suite.
# ---------------------------------------------------------------------------

def _det_inv_schur(M):
    r = M.shape[-1]
    if r == 1:
        a = M[..., 0, 0]
        return a, (1.0 / a)[..., None, None]
    if r == 2:
        a, b = M[..., 0, 0], M[..., 0, 1]
        c, d = M[..., 1, 0], M[..., 1, 1]
        det = a * d - b * c
        inv = jnp.stack([
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ], axis=-2) / det[..., None, None]
        return det, inv
    r1 = r // 2
    A = M[..., :r1, :r1]
    B = M[..., :r1, r1:]
    C = M[..., r1:, :r1]
    D = M[..., r1:, r1:]
    detA, iA = _det_inv_schur(A)
    iA_B = iA @ B
    S = D - C @ iA_B
    detS, iS = _det_inv_schur(S)
    C_iA = C @ iA
    top_right = -iA_B @ iS
    inv = jnp.concatenate([
        jnp.concatenate([iA - top_right @ C_iA, top_right], axis=-1),
        jnp.concatenate([-iS @ C_iA, iS], axis=-1),
    ], axis=-2)
    return detA * detS, inv


def _det_schur(M):
    """det only — skips the inverse assembly of the trailing block."""
    r = M.shape[-1]
    if r == 1:
        return M[..., 0, 0]
    if r == 2:
        return (M[..., 0, 0] * M[..., 1, 1]
                - M[..., 0, 1] * M[..., 1, 0])
    r1 = r // 2
    A = M[..., :r1, :r1]
    B = M[..., :r1, r1:]
    C = M[..., r1:, :r1]
    D = M[..., r1:, r1:]
    detA, iA = _det_inv_schur(A)
    S = D - C @ (iA @ B)
    return detA * _det_schur(S)


# ---------------------------------------------------------------------------
# Panel-peeling determinant: the balanced Schur recursion above is correct
# but *dispatch-bound* on TPU — its tree bottoms out in hundreds of tiny
# (n,)-sized complex ops (2x2 base cases, stacks, concats) and its mid-level
# batched matmuls underfill the MXU. Peeling a fixed b x b panel per level
# keeps the op count O(r/b) fused loops + O(r/b) MXU matmuls:
#
#   det(M) = det(A_bb) * det(D - C A_bb^{-1} B),  recurse on the (r-b) block
#
# with the b x b inverse+det from a single fori-loop Gauss-Jordan (one
# compiled body, b iterations, touching only the (n, b, 2b) panel).
# No pivoting, like the Schur path: the propagator matrices are well-
# conditioned by construction and cross-checked against LAPACK in tests.
# ---------------------------------------------------------------------------

def _det_inv_gj(A: jax.Array):
    """(det, inv) of a batch of small (n, b, b) matrices by Gauss-Jordan
    without pivoting, as one fused fori_loop. det = product of pivots."""
    n, b, _ = A.shape
    aug = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), (n, b, b))], axis=2)

    def body(k, carry):
        aug, det = carry
        pivval = jax.lax.dynamic_slice(aug, (0, k, k), (n, 1, 1))[:, 0, 0]
        det = det * pivval
        row = jax.lax.dynamic_slice(aug, (0, k, 0), (n, 1, 2 * b))
        row = row / pivval[:, None, None]
        aug = jax.lax.dynamic_update_slice(aug, row, (0, k, 0))
        factors = jax.lax.dynamic_slice(aug, (0, 0, k), (n, b, 1))
        mask = (jnp.arange(b) != k)[None, :, None]
        update = jnp.where(mask, factors, 0.0) * row
        return aug - update, det

    aug, det = jax.lax.fori_loop(0, b, body,
                                 (aug, jnp.ones((n,), dtype=A.dtype)))
    return det, aug[:, :, b:]


def _det_peel(M: jax.Array, b: int = 12) -> jax.Array:
    """Determinant of (n, r, r) by sequential b x b panel elimination."""
    det = jnp.ones((M.shape[0],), dtype=M.dtype)
    while M.shape[-1] > b:
        A = M[..., :b, :b]
        B = M[..., :b, b:]
        C = M[..., b:, :b]
        D = M[..., b:, b:]
        detA, iA = _det_inv_gj(A)
        M = D - C @ (iA @ B)
        det = det * detA
    detA, _ = _det_inv_gj(M)
    return det * detA


# Above this size one block-Schur level splits the matrix before the fused
# Pallas Gauss-Jordan: the kernel's VPU flops are 8 m^3 per trajectory, so
# halving m at the cost of a few MXU matmuls wins 4x (and keeps the static
# unroll, hence compile time, at HK-kernel scale). 2r = 120 at the 60-mode
# flagship splits into two r = 60 kernel calls.
_GJ_LEAF = 64


def _det_inv_lanes_blocked(A: jax.Array):
    """(det, inv) with the fused lanes Gauss-Jordan kernel at the leaves and
    block-Schur levels above `_GJ_LEAF`. A is (n, m, m) complex."""
    from semiclassical_tpu.ops import pallas_batched_det_inv_lanes

    m = A.shape[-1]
    if m <= 2:
        return _det_inv_schur(A)
    if m <= _GJ_LEAF:
        return pallas_batched_det_inv_lanes(A)
    r1 = m // 2
    A11 = A[..., :r1, :r1]
    A12 = A[..., :r1, r1:]
    A21 = A[..., r1:, :r1]
    A22 = A[..., r1:, r1:]
    det1, i11 = _det_inv_lanes_blocked(A11)
    i11_A12 = i11 @ A12
    S = A22 - A21 @ i11_A12
    det2, iS = _det_inv_lanes_blocked(S)
    A21_i11 = A21 @ i11
    top_right = -i11_A12 @ iS
    inv = jnp.concatenate([
        jnp.concatenate([i11 - top_right @ A21_i11, top_right], axis=-1),
        jnp.concatenate([-iS @ A21_i11, iS], axis=-1),
    ], axis=-2)
    return det1 * det2, inv


def _mT_b(M, B):
    """M^T @ B batched — einsum reads the transpose for free in the matmul
    lowering (no materialised transpose pass)."""
    return jnp.einsum("nba,nbj->naj", M, B)


def _det_solveT_lanes(A: jax.Array, B: jax.Array):
    """(det(A), A^{-T} B) without materialising the full inverse above the
    kernel leaf size: one block-Schur level per factor of 2, with the
    half-size inverses from the fused Gauss-Jordan kernel and the solve
    propagated through the block formulas. For the (n, 2r, 2r) WM A-matrix
    this replaces the (n, 2r, 2r) inverse materialisation + big concats +
    a full-width multiply with five half-width multiplies — the profile
    showed the inverse assembly was ~30% of the WM step."""
    m = A.shape[-1]
    if m <= 2:
        det, inv = _det_inv_schur(A)
        return det, _mT_b(inv, B)
    if m <= _GJ_LEAF:
        from semiclassical_tpu.ops import pallas_batched_det_inv_lanes
        det, inv = pallas_batched_det_inv_lanes(A)
        return det, _mT_b(inv, B)
    r1 = m // 2
    A11 = A[..., :r1, :r1]
    A12 = A[..., :r1, r1:]
    A21 = A[..., r1:, :r1]
    A22 = A[..., r1:, r1:]
    det1, i11 = _det_inv_lanes_blocked(A11)
    S = A22 - A21 @ (i11 @ A12)
    B1 = B[..., :r1, :]
    B2 = B[..., r1:, :]
    # A^{-T} through the Schur blocks of A^T (whose Schur complement is S^T)
    t1 = _mT_b(i11, B1)
    det2, Y2 = _det_solveT_lanes(S, B2 - _mT_b(A12, t1))
    Y1 = _mT_b(i11, B1 - _mT_b(A21, Y2))
    return det1 * det2, jnp.concatenate([Y1, Y2], axis=-2)


def batched_det_solve_t(A: jax.Array, B: jax.Array):
    """(det(A), A^{-T} B) for A (..., m, m), B (..., m, k).

    The fused form callers want when the inverse only ever appears as
    A^{-T} @ (tall block) — the WM prefactor's Y = iAb^T P."""
    impl = _resolve_impl()
    if impl in ("lanes", "pallas") and A.shape[-1] > 2:
        shape = A.shape
        det, Y = _det_solveT_lanes(
            A.reshape((-1,) + shape[-2:]),
            B.reshape((-1,) + B.shape[-2:]))
        return det.reshape(shape[:-2]), Y.reshape(B.shape)
    det, inv = batched_det_inv(A)
    return det, jnp.einsum("...ba,...bj->...aj", inv, B)


def _det_solve_lanes(A: jax.Array, B: jax.Array):
    """(det(A), A^{-1} B) with the augmented Gauss-Jordan kernel at the
    leaves and block elimination above `_GJ_LEAF`. A (n, m, m), B (n, m, k).

    Unlike `_det_solveT_lanes` (which materialises half-size inverses and
    spends ~8 HBM matmul roundtrips at 2r = 120), every leaf here is ONE
    fused kernel call and the blocked level needs only two batched matmuls
    — the round-3 profile showed those roundtrips, not flops, dominate."""
    m = A.shape[-1]
    if m <= 2:
        det, inv = _det_inv_schur(A)
        return det, inv @ B
    if m <= _GJ_LEAF:
        from semiclassical_tpu.ops import pallas_batched_det_solve_lanes
        return pallas_batched_det_solve_lanes(A, B)
    r1 = m // 2
    return _det_solve_lanes_blocks(
        A[..., :r1, :r1], A[..., :r1, r1:],
        A[..., r1:, :r1], A[..., r1:, r1:],
        B[..., :r1, :], B[..., r1:, :])


def _det_solve_lanes_blocks(A11, A12, A21, A22, B1, B2):
    """Block elimination for [[A11, A12], [A21, A22]] [Y1; Y2] = [B1; B2]:

        det1, [G | t] = A11^{-1} [A12 | B1]      (one fused kernel)
        S = A22 - A21 G,  rhs2 = B2 - A21 t      (ONE batched matmul)
        det2, Y2 = S^{-1} rhs2                   (recurse)
        Y1 = t - G Y2                            (one batched matmul)
    """
    det1, Gt_ = _det_solve_lanes(
        A11, jnp.concatenate([A12, B1], axis=-1))
    G = Gt_[..., :A12.shape[-1]]
    t = Gt_[..., A12.shape[-1]:]
    A21Gt = A21 @ Gt_
    S = A22 - A21Gt[..., :A12.shape[-1]]
    rhs2 = B2 - A21Gt[..., A12.shape[-1]:]
    det2, Y2 = _det_solve_lanes(S, rhs2)
    Y1 = t - G @ Y2
    return det1 * det2, jnp.concatenate([Y1, Y2], axis=-2)


def batched_det_solve(A: jax.Array, B: jax.Array):
    """(det(A), A^{-1} B) for A (..., m, m), B (..., m, k)."""
    impl = _resolve_impl()
    if impl in ("lanes", "pallas") and A.shape[-1] > 2:
        shape = A.shape
        det, Y = _det_solve_lanes(
            A.reshape((-1,) + shape[-2:]),
            B.reshape((-1,) + B.shape[-2:]))
        return det.reshape(shape[:-2]), Y.reshape(B.shape)
    det, inv = batched_det_inv(A)
    return det, jnp.einsum("...ab,...bj->...aj", inv, B)


def batched_det_solve_blocks(A11, A12, A21, A22, B1, B2):
    """(det, [Y1; Y2]) of the 2x2-blocked system — callers that assemble
    the blocks natively (the WM A-matrix) skip the (n, 2r, 2r) concat +
    re-slice roundtrip entirely on the lanes path."""
    impl = _resolve_impl()
    if impl in ("lanes", "pallas") and A11.shape[-1] > 2:
        return _det_solve_lanes_blocks(A11, A12, A21, A22, B1, B2)
    A = jnp.concatenate([
        jnp.concatenate([A11, A12], axis=-1),
        jnp.concatenate([A21, A22], axis=-1)], axis=-2)
    B = jnp.concatenate([B1, B2], axis=-2)
    return batched_det_solve(A, B)


def batched_det_inv(A: jax.Array):
    """(det, inv) of a batch of small (complex) matrices, shape
    (..., r, r) — any number of leading batch dims.

    One fused computation — callers needing both (the WM prefactor) avoid
    paying for two factorizations. On TPU this is the in-VMEM Gauss-Jordan
    lanes kernel (with block-Schur splitting above 64), elsewhere the
    matmul-only Schur recursion or LAPACK.
    """
    impl = _resolve_impl()
    if impl in ("lanes", "pallas") and A.shape[-1] > 2:
        shape = A.shape
        det, inv = _det_inv_lanes_blocked(
            A.reshape((-1,) + shape[-2:]))
        return det.reshape(shape[:-2]), inv.reshape(shape)
    if impl in ("jax", "lanes", "pallas"):
        return _det_inv_schur(A)
    return jnp.linalg.det(A), jnp.linalg.inv(A)


def batched_det(A: jax.Array) -> jax.Array:
    """Determinant of a batch of small (complex) matrices, shape (n, r, r)."""
    impl = _resolve_impl()
    if impl == "lanes" and A.shape[-1] > 2:
        from semiclassical_tpu.ops import pallas_batched_det_lanes
        return pallas_batched_det_lanes(A)
    if impl == "pallas":
        from semiclassical_tpu.ops import pallas_batched_det
        return pallas_batched_det(A)
    if impl in ("jax", "lanes"):
        return _det_schur(A)
    return jnp.linalg.det(A)


def batched_inv(A: jax.Array) -> jax.Array:
    """Inverse of a batch of small (complex) matrices, shape (n, r, r)."""
    if _resolve_impl() in ("jax", "lanes", "pallas"):
        return _det_inv_schur(A)[1]
    return jnp.linalg.inv(A)
