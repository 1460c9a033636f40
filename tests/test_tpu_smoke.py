# coding: utf-8
"""Real-chip smoke tier (``SEMI_TPU_TESTS=1 python -m pytest tests/ -q``).

These re-verify the TPU numerics contract mechanically on the hardware it
was written for — the kernels-vs-LAPACK gates, the mixed-precision C(0)
invariant, and a production-length HK scan. Everything else in the suite
runs on the CPU backend (conftest.py); these tests are skipped there.

Contract reminders encoded here: no complex host<->device transfers
(linalg.from_device), complex parameter packs flow as jit arguments, and
host fetches (np.asarray) are the only reliable timing/order fence on the
axon backend.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"needs a TPU backend, have {jax.default_backend()}")


def _random_well_conditioned(rng, n, m):
    return (np.eye(m)
            + 0.3 * (rng.standard_normal((n, m, m))
                     + 1j * rng.standard_normal((n, m, m))) / np.sqrt(m)
            ).astype(np.complex64)


def _fetch_complex(x):
    from semiclassical_tpu.linalg import from_device
    return np.asarray(from_device(x))


def test_lanes_det_kernel_vs_lapack_on_chip():
    """The trajectory-in-lanes LU det kernel against host LAPACK, on the
    real Mosaic compiler (the CPU suite only exercises interpret mode)."""
    from semiclassical_tpu.ops import pallas_batched_det_lanes

    rng = np.random.default_rng(0)
    A = _random_well_conditioned(rng, 512, 60)
    det = _fetch_complex(
        pallas_batched_det_lanes(jax.lax.complex(jnp.asarray(A.real),
                                                 jnp.asarray(A.imag))))
    ref = np.linalg.det(A.astype(np.complex128))
    assert np.abs(det - ref).max() / np.abs(ref).max() < 1e-4


def test_gj_det_inv_kernel_vs_lapack_on_chip():
    """The fused Gauss-Jordan det+inverse kernel (WM path) on hardware."""
    from semiclassical_tpu.ops import pallas_batched_det_inv_lanes

    rng = np.random.default_rng(1)
    A = _random_well_conditioned(rng, 256, 60)
    det, inv = pallas_batched_det_inv_lanes(
        jax.lax.complex(jnp.asarray(A.real), jnp.asarray(A.imag)))
    det = _fetch_complex(det)
    inv = _fetch_complex(inv)
    A128 = A.astype(np.complex128)
    ref_det = np.linalg.det(A128)
    ref_inv = np.linalg.inv(A128)
    assert np.abs(det - ref_det).max() / np.abs(ref_det).max() < 1e-4
    assert np.abs(inv - ref_inv).max() < 1e-4


def _as60(ntraj, integrator="rk4"):
    from semiclassical_tpu.potentials import MorsePotential
    from semiclassical_tpu.propagation import HermanKlukPropagator

    rng = np.random.default_rng(42)
    d = 60
    omega = rng.uniform(200.0, 3000.0, size=d) / 219474.63
    S = rng.uniform(0.01, 0.3, size=d)
    nac = rng.uniform(-1.0, 1.0, size=d)
    pot = MorsePotential.create(omega, np.full(d, 0.02), nac,
                                dtype=jnp.float64)
    dQ = np.sqrt(2.0 * S / omega)
    Gamma = np.diag(omega)
    prop = HermanKlukPropagator(Gamma, Gamma, dtype=jnp.float32,
                                traj_dtype=jnp.float64,
                                integrator=integrator)
    prop.initial_conditions(dQ, np.zeros(d), Gamma, ntraj=ntraj, key=0,
                            potential=pot)
    return prop, pot


def test_mixed_precision_c0_on_chip():
    """C(0) = 1 to 1e-3 in the TPU-production mixed mode — the canary for
    one-pass-bf16 matmul corruption and det-kernel regressions."""
    prop, pot = _as60(4096)
    cauto, kic = prop.propagate(pot, 0.25, 2, check_energy=False)
    assert abs(cauto[0] - 1.0) < 1e-3
    assert np.isfinite(cauto).all() and np.isfinite(kic).all()


@pytest.mark.slow
def test_hk_100_step_scan_on_chip():
    """A production-length chunked scan (100 steps) stays finite, keeps
    |C| <= ~1, and conserves the ensemble energy on chip."""
    prop, pot = _as60(4096)
    cauto, kic = prop.propagate(pot, 0.25, 100, chunk=50,
                                check_energy=False)
    assert np.isfinite(cauto).all() and np.isfinite(kic).all()
    assert abs(cauto[0] - 1.0) < 1e-3
    assert np.abs(cauto).max() < 1.5  # normalized autocorrelation


def test_wm_mixed_step_on_chip():
    """One WM fast-path step at 60 modes on hardware: C(0) ~ 1 and the
    determinant trackers stay finite (exercises the GJ kernel + blocked
    solve in the real compiler)."""
    from semiclassical_tpu.potentials import MorsePotential
    from semiclassical_tpu.propagation import WaltonManolopoulosPropagator

    rng = np.random.default_rng(42)
    d = 60
    omega = rng.uniform(200.0, 3000.0, size=d) / 219474.63
    S = rng.uniform(0.01, 0.3, size=d)
    nac = rng.uniform(-1.0, 1.0, size=d)
    pot = MorsePotential.create(omega, np.full(d, 0.02), nac,
                                dtype=jnp.float64)
    dQ = np.sqrt(2.0 * S / omega)
    Gamma = np.diag(omega)
    prop = WaltonManolopoulosPropagator(Gamma, Gamma, 10000.0, 10000.0,
                                        dtype=jnp.float32,
                                        traj_dtype=jnp.float64)
    prop.initial_conditions(dQ, np.zeros(d), Gamma, ntraj=2048, key=0,
                            potential=pot)
    cauto, kic = prop.propagate(pot, 0.25, 2, check_energy=False)
    assert abs(cauto[0] - 1.0) < 2e-2  # MC estimate at 2048 trajectories
    assert np.isfinite(cauto).all() and np.isfinite(kic).all()


def test_comp32_wm_step_on_chip():
    """The production comp32 WM path (per-mode 2x2 fast path + collapsed
    prefactor/overlap constants + residual-folded displacements) on
    hardware: C(0) ~ 1 and finite observables."""
    from semiclassical_tpu.potentials import MorsePotential
    from semiclassical_tpu.propagation import WaltonManolopoulosPropagator

    rng = np.random.default_rng(42)
    d = 60
    omega = rng.uniform(200.0, 3000.0, size=d) / 219474.63
    S = rng.uniform(0.01, 0.3, size=d)
    nac = rng.uniform(-1.0, 1.0, size=d)
    pot = MorsePotential.create(omega, np.full(d, 0.02), nac,
                                dtype=jnp.float32)
    dQ = np.sqrt(2.0 * S / omega)
    Gamma = np.diag(omega)
    prop = WaltonManolopoulosPropagator(Gamma, Gamma, 10000.0, 10000.0,
                                        dtype=jnp.float32,
                                        traj_dtype="comp32")
    prop.initial_conditions(dQ, np.zeros(d), Gamma, ntraj=2048, key=0,
                            potential=pot)
    assert prop.state.compensated and prop.state.diag_monodromy
    assert prop.params.hk.diag_ka is not None      # collapsed prefactor
    assert prop.params.hk.csot0.diag_w is not None  # collapsed overlaps
    cauto, kic = prop.propagate(pot, 0.25, 5, check_energy=False)
    assert abs(cauto[0] - 1.0) < 2e-2
    assert np.isfinite(cauto).all() and np.isfinite(kic).all()


def test_exact_morse_hybrid_on_chip():
    """The exact Morse integrator's hybrid (mixed mode) on hardware:
    twin run vs the RK4 integrator on the identical ensemble (unbound
    tail rows RK4-routed through the side-channel in the exact run).
    The gap is bounded by the tail-row f32 exponent noise (BASELINE.md:
    6.4e-4 at 524k comp32; looser here for the smaller batch)."""
    prop_r, pot = _as60(4096)
    c_r, k_r = prop_r.propagate(pot, 0.25, 20, check_energy=False)

    prop_e, pot_e = _as60(4096, integrator="exact")
    c_e, k_e = prop_e.propagate(pot_e, 0.25, 20, check_energy=True)
    assert np.isfinite(c_e).all() and np.isfinite(k_e).all()
    assert np.abs(c_e - c_r).max() < 5e-3
    # energy trace of the exact part is constant by construction
    assert np.ptp(prop_e.last_energies) < 1e-5
