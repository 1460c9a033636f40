# coding: utf-8
"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from semiclassical_tpu.ops import (
    pallas_batched_det,
    pallas_batched_det_inv_lanes,
)


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


def _random_well_conditioned(rng, n, m):
    return (np.eye(m)
            + 0.4 * (rng.standard_normal((n, m, m))
                     + 1j * rng.standard_normal((n, m, m))) / np.sqrt(m)
            ).astype(np.complex64)


def test_pallas_det_inv_vs_lapack():
    """Fused Gauss-Jordan det+inverse (the WM prefactor kernel)."""
    rng = np.random.default_rng(2)
    for n, m in [(100, 7), (64, 13), (130, 8), (16, 1)]:
        A = _random_well_conditioned(rng, n, m)
        d, iA = pallas_batched_det_inv_lanes(jnp.asarray(A))
        dn = np.linalg.det(A.astype(np.complex128))
        invn = np.linalg.inv(A.astype(np.complex128))
        assert np.abs(np.asarray(d) - dn).max() / np.abs(dn).max() < 1e-5, (n, m)
        assert np.abs(np.asarray(iA) - invn).max() < 1e-5, (n, m)


def test_det_inv_blocked_splitting(monkeypatch):
    """The block-Schur level above _GJ_LEAF (the path the (2r, 2r) WM
    A-matrix takes on TPU) must agree with LAPACK, including an odd split."""
    from semiclassical_tpu import linalg

    monkeypatch.setattr(linalg, "_GJ_LEAF", 8)
    rng = np.random.default_rng(3)
    for n, m in [(32, 20), (16, 21)]:
        A = _random_well_conditioned(rng, n, m)
        d, iA = linalg._det_inv_lanes_blocked(jnp.asarray(A))
        dn = np.linalg.det(A.astype(np.complex128))
        invn = np.linalg.inv(A.astype(np.complex128))
        assert np.abs(np.asarray(d) - dn).max() / np.abs(dn).max() < 1e-4, (n, m)
        assert np.abs(np.asarray(iA) - invn).max() < 1e-4, (n, m)


def test_det_solve_t_blocked(monkeypatch):
    """Fused det + A^{-T} B block solve (the WM Y = iAb^T P path)."""
    from semiclassical_tpu import linalg

    monkeypatch.setattr(linalg, "_GJ_LEAF", 8)
    monkeypatch.setattr(linalg, "_LINALG_IMPL", "lanes")
    rng = np.random.default_rng(5)
    for n, m, k in [(32, 20, 7), (16, 13, 4)]:
        A = _random_well_conditioned(rng, n, m)
        B = (rng.standard_normal((n, m, k))
             + 1j * rng.standard_normal((n, m, k))).astype(np.complex64)
        det, Y = linalg.batched_det_solve_t(jnp.asarray(A), jnp.asarray(B))
        A128 = A.astype(np.complex128)
        dn = np.linalg.det(A128)
        Yn = np.linalg.solve(np.swapaxes(A128, 1, 2), B.astype(np.complex128))
        assert np.abs(np.asarray(det) - dn).max() / np.abs(dn).max() < 1e-4
        assert np.abs(np.asarray(Y) - Yn).max() < 1e-4, (n, m, k)


def test_pallas_det_solve_vs_lapack():
    """Fused augmented-GJ det + A^{-1} B (the round-3 WM solve kernel),
    including n not a multiple of the tile (identity/zero padding)."""
    from semiclassical_tpu.ops import pallas_batched_det_solve_lanes

    rng = np.random.default_rng(6)
    for n, m, k in [(100, 7, 3), (64, 13, 13), (130, 8, 20), (16, 1, 2)]:
        A = _random_well_conditioned(rng, n, m)
        B = (rng.standard_normal((n, m, k))
             + 1j * rng.standard_normal((n, m, k))).astype(np.complex64)
        d, Y = pallas_batched_det_solve_lanes(jnp.asarray(A), jnp.asarray(B))
        A128 = A.astype(np.complex128)
        dn = np.linalg.det(A128)
        Yn = np.linalg.solve(A128, B.astype(np.complex128))
        assert np.abs(np.asarray(d) - dn).max() / np.abs(dn).max() < 1e-5
        assert np.abs(np.asarray(Y) - Yn).max() < 1e-5, (n, m, k)


def test_det_solve_blocked(monkeypatch):
    """batched_det_solve & the block-entry variant above _GJ_LEAF (the WM
    At-chain path) vs LAPACK, including an odd split."""
    from semiclassical_tpu import linalg

    monkeypatch.setattr(linalg, "_GJ_LEAF", 8)
    monkeypatch.setattr(linalg, "_LINALG_IMPL", "lanes")
    rng = np.random.default_rng(7)
    for n, m, k in [(32, 20, 10), (16, 13, 4)]:
        A = _random_well_conditioned(rng, n, m)
        B = (rng.standard_normal((n, m, k))
             + 1j * rng.standard_normal((n, m, k))).astype(np.complex64)
        det, Y = linalg.batched_det_solve(jnp.asarray(A), jnp.asarray(B))
        A128 = A.astype(np.complex128)
        dn = np.linalg.det(A128)
        Yn = np.linalg.solve(A128, B.astype(np.complex128))
        assert np.abs(np.asarray(det) - dn).max() / np.abs(dn).max() < 1e-4
        assert np.abs(np.asarray(Y) - Yn).max() < 1e-4, (n, m, k)

    # block-entry form: even split, blocks passed directly
    n, m, k = 24, 16, 6
    A = _random_well_conditioned(rng, n, m)
    B = (rng.standard_normal((n, m, k))
         + 1j * rng.standard_normal((n, m, k))).astype(np.complex64)
    r1 = m // 2
    Aj = jnp.asarray(A)
    Bj = jnp.asarray(B)
    det, Y = linalg.batched_det_solve_blocks(
        Aj[:, :r1, :r1], Aj[:, :r1, r1:], Aj[:, r1:, :r1], Aj[:, r1:, r1:],
        Bj[:, :r1, :], Bj[:, r1:, :])
    A128 = A.astype(np.complex128)
    assert np.abs(np.asarray(det) - np.linalg.det(A128)).max() < 1e-4
    assert np.abs(np.asarray(Y)
                  - np.linalg.solve(A128, B.astype(np.complex128))).max() < 1e-4


def test_batched_det_inv_leading_batch_dims():
    """batched_det_inv accepts (..., m, m) with several leading dims on the
    pallas route (wm_norm's (bi, bj, r, r) blocks)."""
    from semiclassical_tpu import linalg

    rng = np.random.default_rng(4)
    A = _random_well_conditioned(rng, 24, 5).reshape(4, 6, 5, 5)
    old = linalg._LINALG_IMPL
    linalg.set_linalg_impl("lanes")
    try:
        d, iA = linalg.batched_det_inv(jnp.asarray(A))
    finally:
        linalg.set_linalg_impl(old)
    A128 = A.astype(np.complex128)
    assert d.shape == (4, 6) and iA.shape == A.shape
    assert np.allclose(np.asarray(d), np.linalg.det(A128), rtol=1e-4)
    assert np.abs(np.asarray(iA) - np.linalg.inv(A128)).max() < 1e-5


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


def test_wm_diag_kernel_parity(monkeypatch):
    """Interpret-mode parity of the fused WM diag-chain Pallas kernel
    (ops/wm_kernel.py) against the production XLA lowering: every
    WMScanDerived field to f32 rounding on a padded (n=300) batch. The
    kernel is off by default (measured: it only matches XLA on TPU —
    module docstring); this gate keeps the recorded experiment honest."""
    from semiclassical_tpu.potentials import MorsePotential
    from semiclassical_tpu.propagation import WaltonManolopoulosPropagator
    import semiclassical_tpu.propagation.wm as wm

    rng = np.random.default_rng(42)
    d = 12
    omega = rng.uniform(200.0, 3000.0, size=d) / 219474.63
    S = rng.uniform(0.01, 0.3, size=d)
    pot = MorsePotential.create(omega, np.full(d, 0.02),
                                rng.uniform(-1, 1, size=d),
                                dtype=jnp.float32)
    Gamma = np.diag(omega)
    prop = WaltonManolopoulosPropagator(Gamma, Gamma, 1e4, 1e4,
                                        dtype=jnp.float32,
                                        traj_dtype=jnp.float64)
    prop.initial_conditions(np.sqrt(2 * S / omega), np.zeros(d), Gamma,
                            ntraj=300, key=0, potential=pot)
    prop.propagate(pot, 0.25, 5, check_energy=False)
    state, params, bc = prop.state, prop.params, prop._bc

    monkeypatch.setattr(wm, "_KERNEL_MODE", "0")
    sd0 = wm.wm_scan_derived(params, bc, state, pot)
    monkeypatch.setattr(wm, "_KERNEL_MODE", "force")
    sd1 = wm.wm_scan_derived(params, bc, state, pot)
    for f in ("detA", "detM", "gamma", "rqq", "rQQ", "rqQ",
              "Pq_dq", "PQ_dQ", "kfac"):
        a = np.asarray(getattr(sd0, f))
        b = np.asarray(getattr(sd1, f))
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
        assert rel < 1e-5, (f, rel)
