# coding: utf-8
"""float32/complex64 propagation vs float64 reference.

The TPU backend has no complex128, so the production TPU path runs the scan
in f32/c64 (with f64 host-side scalar factors and normalised MC weights).
This gate checks that the reduced-precision correlations stay within a
fraction of the Monte-Carlo noise floor of the f64 result on a multi-mode
anharmonic model.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from semiclassical_tpu.potentials import MorsePotential
from semiclassical_tpu.propagation import (
    HermanKlukPropagator,
    WaltonManolopoulosPropagator,
)


def _run(prop_cls, kwargs, dtype, traj_dtype=None):
    rng = np.random.default_rng(0)
    d = 12
    omega = rng.uniform(300.0, 2500.0, size=d) / 219474.63
    chi = np.full(d, 0.02)
    nac = rng.uniform(-1.0, 1.0, size=d)
    S = rng.uniform(0.02, 0.3, size=d)
    pot = MorsePotential.create(omega, chi, nac, dtype=dtype)
    Gamma = np.diag(omega)
    q0 = np.sqrt(2 * S / omega)

    prop = prop_cls(Gamma, Gamma, dtype=dtype, traj_dtype=traj_dtype,
                    **kwargs)
    prop.initial_conditions(q0, np.zeros(d), Gamma, ntraj=4096, key=11,
                            potential=pot)
    # ~500 a.u. of propagation, production-like step
    return prop.propagate(pot, 2.0, 100, energy0_es=float(omega.sum() / 2),
                          check_energy=False)


@pytest.mark.parametrize("prop_cls,kwargs", [
    (HermanKlukPropagator, {}),
    (WaltonManolopoulosPropagator, {"alpha": 500.0, "beta": 500.0}),
])
def test_f32_matches_f64(prop_cls, kwargs):
    c64_c, c64_k = _run(prop_cls, kwargs, jnp.float64)
    c32_c, c32_k = _run(prop_cls, kwargs, jnp.float32)
    # identical sample stream is not guaranteed across dtypes (the normal
    # draws differ in dtype), but with the same key jax.random produces the
    # same underlying bits -> same trajectories up to rounding
    err_c = np.abs(c32_c - c64_c).max() / max(np.abs(c64_c).max(), 1e-30)
    err_k = np.abs(c32_k - c64_k).max() / max(np.abs(c64_k).max(), 1e-30)
    # f32 trajectory rounding is amplified by the anharmonic dynamics
    # (trajectory-level chaos); after 100 steps the ensemble-level deviation
    # is a few percent at this batch size — same order as the Monte-Carlo
    # statistical error. Production accuracy on TPU uses the mixed mode
    # (f64 trajectories + f32 monodromy/complex algebra).
    assert err_c < 5e-2, err_c
    assert err_k < 1e-1, err_k


@pytest.mark.parametrize("prop_cls,kwargs", [
    (HermanKlukPropagator, {}),
    (WaltonManolopoulosPropagator, {"alpha": 500.0, "beta": 500.0}),
])
def test_mixed_matches_f64(prop_cls, kwargs):
    """Mixed mode (f64 trajectories + f32 monodromy/complex) must track the
    full-f64 result far more tightly than pure f32 — the classical chaos
    lives in (q, p), which stay f64."""
    c64_c, c64_k = _run(prop_cls, kwargs, jnp.float64)
    cm_c, cm_k = _run(prop_cls, kwargs, jnp.float32, traj_dtype=jnp.float64)
    err_c = np.abs(cm_c - c64_c).max() / max(np.abs(c64_c).max(), 1e-30)
    err_k = np.abs(cm_k - c64_k).max() / max(np.abs(c64_k).max(), 1e-30)
    assert err_c < 1e-4, err_c
    assert err_k < 1e-3, err_k


def test_wm_mixed_many_modes():
    """Regression: the WM M-matrix determinant underflows complex64 beyond
    ~15 modes unless scaled (det(M'/2pi) ~ 1e-180 at 60 modes); the scaled
    formulation (WMParams.m_scale / m_log_det) must keep the production
    observables finite and within the mixed-precision envelope of f64."""
    rng = np.random.default_rng(42)
    d = 60
    omega = rng.uniform(200.0, 3000.0, size=d) / 219474.63
    S = rng.uniform(0.01, 0.3, size=d)
    nac = rng.uniform(-1.0, 1.0, size=d)
    chi = np.full(d, 0.02)
    pot = MorsePotential.create(omega, chi, nac, dtype=jnp.float64)
    dQ = np.sqrt(2.0 * S / omega)
    Gamma = np.diag(omega)

    def run(dtype, traj_dtype):
        prop = WaltonManolopoulosPropagator(
            Gamma, Gamma, alpha=10000.0, beta=10000.0,
            dtype=dtype, traj_dtype=traj_dtype)
        prop.initial_conditions(dQ, np.zeros(d), Gamma, ntraj=128, key=0,
                                potential=pot)
        c, k = prop.propagate(pot, 0.25, 5, check_energy=False)
        return np.asarray(c), np.asarray(k)

    cm, km = run(jnp.float32, jnp.float64)
    assert np.isfinite(cm).all() and np.isfinite(km).all()
    assert abs(cm[0] - 1.0) < 1e-2  # MC estimate at small ntraj
    c64, k64 = run(jnp.float64, None)
    assert np.abs(cm - c64).max() < 1e-3 * np.abs(c64).max()
