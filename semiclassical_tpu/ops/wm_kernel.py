# coding: utf-8
"""Pallas TPU kernel: fused WM diag-path derived chain.

The separable all-diagonal WM fast path (`wm._wm_scan_derived_diag`,
eqns. 50-100 decoupled into per-mode 2x2 complex systems) is pure
elementwise (n, d) work plus mode-axis reductions. Profiled at
ntraj = 524288 / d = 60 on v5e (scripts/wm_diag_ablate.py) the XLA
lowering spends ~25 ms/step: the 13 Gram reductions and ~30 complex
intermediates split into many fusions, each roundtripping 126 MB (n, d)
planes through HBM. This kernel evaluates the WHOLE chain — the 2x2
A/M algebra of `_wm_diag_core` plus every time-dependent bilinear form —
in one VMEM pass over the 10 input planes.

Layout: modes in SUBLANES, trajectories in LANES (the det-kernel layout).
A first attempt kept the natural (n, d) trajectory-in-sublanes layout to
avoid transposes, but with d = 60 every vector op ran at <50% lane
utilization and the mode reductions needed lane shuffles — measured
SLOWER than XLA (66 ms with a lane halving tree, 46 ms with native lane
reductions, vs 32 ms for XLA). Here each input block (tile, d) is
transposed once on entry (the VPU's transpose unit), all arithmetic runs
at full 128-lane utilization, and mode reductions are static sublane
halving trees — the cheap direction. Outputs are per-trajectory scalars
in the lanes of a (32, n) block plus the two per-mode determinant planes
(their range-safe log-space product stays outside, in XLA).

MEASURED RESULT (round 3, v5e, 60-mode comp32 WM): this layout compiles
and matches the XLA path to f32 rounding, but does NOT beat it — 30.4 ms
vs 32.2 ms/step at ntraj = 524288 (tile 256/512/1024 within 2 ms), and
0.45 ms vs 0.29 ms at the ntraj = 8192 throughput optimum, where XLA's
fusions are cache-resident. Conclusion: the diag derived chain is
VPU-compute-bound, not fusion/HBM-bound — XLA's lowering already sits at
the arithmetic floor, and the kernel's entry transposes + padded sublane
tiles eat its single-pass advantage. The kernel therefore stays OFF by
default (SEMI_WM_KERNEL=1 enables it; the interpret-mode parity gate in
tests/test_ops.py keeps it honest) as the recorded evidence for why the
production path is plain XLA.

Complex numbers are carried as (re, im) f32 plane tuples with im=None
encoding an exactly-zero imaginary plane (the s2/s3 Gram vectors are
real), so dead plane arithmetic never reaches the VPU. Mosaic constraints
as probed in ops/det_kernel.py: static slices only, 2D ops, x64-disabled
tracing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional (absent on some CPU-only installs)
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

__all__ = ["pallas_wm_diag_derived", "wm_diag_kernel_available",
           "build_const_pack", "N_SCAL_LANES"]

# const-pack row indices (must match build_const_pack)
_CONSTS = ("u1", "u2", "gt", "cb11", "cb12_im", "cb22",
           "c2_11", "c2_12_im", "c2_22", "m0", "inv_m_scale",
           "fq1", "fq2_im", "bq1", "bq2_im", "g0", "p0")

# scalar-output sublane map: 13 gram entries (re, im interleaved) + 4 reals
GRAM_PAIRS = ((0, 0), (0, 1), (0, 2), (0, 3), (0, 4),
              (1, 2), (1, 3), (1, 4),
              (2, 2), (2, 3), (2, 4),
              (3, 4), (4, 4))
_GRAM_PAIRS = GRAM_PAIRS  # backwards-compatible alias
_EXTRA_ROWS = ("g_DD", "g_Dn", "p0_dQ", "p0_n")
N_SCAL_LANES = 2 * len(GRAM_PAIRS) + len(_EXTRA_ROWS)  # 30
_NSCAL = 32  # padded to a full sublane tile


def scal_row(name: str) -> int:
    """Row index of a named extra quantity in the scal output (the gram
    rows are 2*i / 2*i+1 for GRAM_PAIRS[i]) — consumers must derive
    indices here instead of hardcoding them against GRAM_PAIRS' length."""
    return 2 * len(GRAM_PAIRS) + _EXTRA_ROWS.index(name)


def wm_diag_kernel_available(dtype, d):
    """The kernel is an f32 engine for the TPU backend (interpret mode on
    CPU is exercised by the tests via the _force flag)."""
    return (_HAVE_PLTPU and jnp.dtype(dtype) == jnp.float32 and d <= 256
            and jax.default_backend() == "tpu")


# -- in-kernel complex helpers: (re, im) plane pairs, im=None means 0 -----

def _cmul(a, b):
    ar, ai = a
    br, bi = b
    if ai is None and bi is None:
        return (ar * br, None)
    if ai is None:
        return (ar * br, ar * bi)
    if bi is None:
        return (ar * br, ai * br)
    return (ar * br - ai * bi, ar * bi + ai * br)


def _cadd(a, b):
    ar, ai = a
    br, bi = b
    if ai is None and bi is None:
        return (ar + br, None)
    if ai is None:
        return (ar + br, bi)
    if bi is None:
        return (ar + br, ai)
    return (ar + br, ai + bi)


def _csub(a, b):
    ar, ai = a
    br, bi = b
    if ai is None and bi is None:
        return (ar - br, None)
    if ai is None:
        return (ar - br, -bi)
    if bi is None:
        return (ar - br, ai)
    return (ar - br, ai - bi)


def _ctimes_i(a):
    """i * a."""
    ar, ai = a
    if ai is None:
        return (jnp.zeros_like(ar), ar)
    return (-ai, ar)


def _cconj_scale(a, s):
    """conj(a) * s for a real plane s."""
    ar, ai = a
    return (ar * s, None if ai is None else -ai * s)


def _mag2(a):
    ar, ai = a
    return ar * ar if ai is None else ar * ar + ai * ai


def _msum(x, d):
    """(d, T) -> (1, T) sublane-axis sum via a static halving tree (the
    cheap reduction direction in this layout; every slice is static)."""
    n2 = 1
    while n2 < d:
        n2 *= 2
    if n2 != d:
        x = jnp.concatenate(
            [x, jnp.zeros((n2 - d, x.shape[1]), dtype=x.dtype)], axis=0)
    h = n2 // 2
    while h >= 1:
        x = x[:h] + x[h:2 * h]
        h //= 2
    return x  # (1, T)


def _csum(a, d):
    ar, ai = a
    return (_msum(ar, d), None if ai is None else _msum(ai, d))


def _wm_diag_derived_kernel(mqq, mqp, mpq, mpp, dQ_in, dp_in, dq_in,
                            n1q_in, n1Q_in, v0c_in, consts,
                            out_scal_ref, out_det_ref):
    T, d = mqq.shape
    f32 = jnp.float32
    tr = lambda ref: jnp.swapaxes(ref[:], 0, 1)      # (T, d) -> (d, T)

    # (d, 1) per-mode constant columns: broadcast along the lane axis
    c = {name: jnp.swapaxes(consts[k:k + 1, :], 0, 1)
         for k, name in enumerate(_CONSTS)}

    # ---- per-mode 2x2 A / M algebra (wm._wm_diag_core) ----
    X1 = tr(mqq) * c["u1"]
    X2 = tr(mqp) * c["u2"]
    Z1 = tr(mpq) * c["u1"]
    Z2 = tr(mpp) * c["u2"]

    gt = c["gt"]
    G11, G12, G22 = gt * X1 * X1, gt * X1 * X2, gt * X2 * X2
    B11, B12 = X1 * Z1, X1 * Z2
    B21, B22 = X2 * Z1, X2 * Z2
    TR1, TR2 = Z1 * X2, Z2 * X2
    # hbar = 1 in atomic units (units.py) — the host wrapper asserts it
    At11 = (c["cb11"] + G11, B11)
    At12 = (G12, c["cb12_im"] + (2.0 * B12 - TR1))
    At21 = (G12, B21)
    At22 = (c["cb22"] + G22, (2.0 * B22 - TR2))
    P1 = (gt * X1, Z1)
    P2 = (gt * X2, Z2)

    det_i = _csub(_cmul(At11, At22), _cmul(At12, At21))
    inv_det = _cconj_scale(det_i, 1.0 / _mag2(det_i))
    y1 = _cmul(_csub(_cmul(At22, P1), _cmul(At12, P2)), inv_det)
    y2 = _cmul(_csub(_cmul(At11, P2), _cmul(At21, P1)), inv_det)

    c2y1 = _cadd(_cmul((c["c2_11"], None), y1),
                 _cmul((c["c2_12_im"], None), _ctimes_i(y2)))
    c2y2 = _cadd(_cmul((c["c2_12_im"], None), _ctimes_i(y1)),
                 _cmul((c["c2_22"], None), y2))
    Mp = _csub((c["m0"], None),
               _cadd(_cmul(y1, _cadd(P1, c2y1)), _cmul(y2, _cadd(P2, c2y2))))
    Mps = (Mp[0] * c["inv_m_scale"], Mp[1] * c["inv_m_scale"])
    iM = _cconj_scale(Mp, 1.0 / _mag2(Mp))

    # ---- time-dependent observable vectors and Gram forms ----
    yf = _cadd(_cmul((c["fq1"], None), y1),
               _cmul((c["fq2_im"], None), _ctimes_i(y2)))
    yb = _cadd(_cmul((c["bq1"], None), y1),
               _cmul((c["bq2_im"], None), _ctimes_i(y2)))
    dQ = tr(dQ_in)
    dp = tr(dp_in)
    n1Q = tr(n1Q_in)
    s0 = _cmul(yf, (tr(dq_in), None))
    s1 = _cmul(yf, (tr(n1q_in), None))
    s2 = (c["g0"] * dQ, None)
    s3 = (c["g0"] * n1Q, None)
    s4 = _cadd((dp, None), _cmul(yb, (tr(v0c_in), None)))
    sv = (s0, s1, s2, s3, s4)
    wv = tuple(_cmul(s, iM) for s in sv)

    pieces = []
    for k, l in _GRAM_PAIRS:
        gr, gi = _csum(_cmul(sv[k], wv[l]), d)
        pieces.append(gr)
        pieces.append(jnp.zeros_like(gr) if gi is None else gi)
    pieces.append(_msum(dQ * c["g0"] * dQ, d))       # g_DD
    pieces.append(_msum(dQ * c["g0"] * n1Q, d))      # g_Dn
    pieces.append(_msum(c["p0"] * dQ, d))            # p0_dQ
    pieces.append(_msum(c["p0"] * n1Q, d))           # p0_n

    scal = jnp.concatenate(pieces, axis=0)           # (30, T)
    pad = out_scal_ref.shape[0] - scal.shape[0]
    if pad:  # zero-sized arrays do not legalize in Mosaic
        scal = jnp.concatenate([scal, jnp.zeros((pad, T), f32)], axis=0)
    out_scal_ref[:] = scal

    # per-mode determinant planes [det_i re | det_i im | Mps re | Mps im];
    # the log-space mode products (range-safe at any d) run outside in XLA
    dpad = out_det_ref.shape[0] - 4 * d
    det_stack = [det_i[0], det_i[1], Mps[0], Mps[1]]
    if dpad:
        det_stack.append(jnp.zeros((dpad, T), f32))
    out_det_ref[:] = jnp.concatenate(det_stack, axis=0)


def build_const_pack(dg, p0, m_scale, d):
    """(17, d) f32 row-stack of the per-mode constants (WMDiagConsts plus
    the wavepacket momentum center p0 and the reciprocal detM scale)."""
    rows = {
        "u1": dg.u1, "u2": dg.u2, "gt": dg.gt,
        "cb11": dg.cb11, "cb12_im": dg.cb12_im, "cb22": dg.cb22,
        "c2_11": dg.c2_11, "c2_12_im": dg.c2_12_im, "c2_22": dg.c2_22,
        "m0": dg.m0,
        "inv_m_scale": jnp.broadcast_to(1.0 / m_scale, (d,)),
        "fq1": dg.fq1, "fq2_im": dg.fq2_im,
        "bq1": dg.bq1, "bq2_im": dg.bq2_im,
        "g0": dg.g0, "p0": p0,
    }
    return jnp.stack([rows[name].astype(jnp.float32) for name in _CONSTS])


@functools.partial(jax.jit, static_argnames=("tile", "_force"))
def pallas_wm_diag_derived(Mqq, Mqp, Mpq, Mpp, dQ, dp, dq, n1q, n1Q, v0c,
                           const_pack, tile: int = 512,
                           _force: bool = False):
    """Fused diag-path derived chain.

    All array arguments are (n, d) f32 (diagonal monodromy planes,
    displacements, NAC vectors, the constant ig0i*dp0 product);
    `const_pack` is the (17, d) row stack from `build_const_pack`.

    Returns (scal, det_planes) with TRAJECTORIES IN THE LAST AXIS:
    scal (32, n) f32, rows 0..2*len(GRAM_PAIRS)-1 = the gram entries as
    interleaved (re, im) pairs in GRAM_PAIRS order, then the rows
    [g_DD, g_Dn, p0_dQ, p0_n] (the remainder is sublane padding — use
    `scal_row` to index by name); det_planes (4, d, n) f32 =
    [det_i re, det_i im, Mps re, Mps im] mode-major.

    `_force` runs interpret mode off-TPU (tests).
    """
    n, d = Mqq.shape
    n_pad = -(-n // tile) * tile
    arrs = [Mqq, Mqp, Mpq, Mpp, dQ, dp, dq, n1q, n1Q, v0c]
    if n_pad != n:
        # pad rows with benign values: identity monodromy, zero vectors
        def rowpad(a, fill):
            return jnp.concatenate(
                [a.astype(jnp.float32),
                 jnp.full((n_pad - n, d), fill, jnp.float32)], axis=0)
        arrs = ([rowpad(arrs[0], 1.0), rowpad(arrs[1], 0.0),
                 rowpad(arrs[2], 0.0), rowpad(arrs[3], 1.0)]
                + [rowpad(a, 0.0) for a in arrs[4:]])
    else:
        arrs = [a.astype(jnp.float32) for a in arrs]

    K = const_pack.shape[0]
    ndet = -(-4 * d // 8) * 8

    grid = (n_pad // tile,)
    in_specs = [pl.BlockSpec((tile, d), lambda i: (i, 0))
                for _ in range(10)]
    in_specs.append(pl.BlockSpec((K, d), lambda i: (0, 0)))
    out_specs = (pl.BlockSpec((_NSCAL, tile), lambda i: (0, i)),
                 pl.BlockSpec((ndet, tile), lambda i: (0, i)))
    kwargs = {}
    if _HAVE_PLTPU and jax.default_backend() == "tpu" and not _force:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    else:
        kwargs["interpret"] = True

    # gridded kernels must be traced in 32-bit mode (see det_kernel.py)
    with jax.enable_x64(False):
        scal, det_planes = pl.pallas_call(
            _wm_diag_derived_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(jax.ShapeDtypeStruct((_NSCAL, n_pad), jnp.float32),
                       jax.ShapeDtypeStruct((ndet, n_pad), jnp.float32)),
            **kwargs,
        )(*arrs, const_pack.astype(jnp.float32))

    # consumers slice per-quantity rows; lanes are trajectories
    return scal[:, :n], det_planes[:4 * d, :n].reshape(4, d, n)
