# coding: utf-8
"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The SURVEY test plan calls for identical-results tests across shardings
(1 chip vs mesh) — no fake backends, the same physics on both layouts.
"""

import numpy as np
import jax

from semiclassical_tpu.parallel import ensemble_mesh
from semiclassical_tpu.potentials import MorsePotential, NonHarmonicPotential
from semiclassical_tpu.propagation import (
    HermanKlukPropagator,
    WaltonManolopoulosPropagator,
)


def _correlations(prop_cls, kwargs, mesh, key=7):
    pot = NonHarmonicPotential.create()
    Gi = np.array([[2 * 2.5]])
    G0 = np.array([[1.0]])
    prop = prop_cls(Gi, Gi, **kwargs)
    prop.initial_conditions(np.array([7.3]), np.array([0.0]), G0,
                            ntraj=4096, key=key, potential=pot, mesh=mesh)
    return prop.propagate(pot, 0.02, 25, energy0_es=0.5)


def test_hk_sharded_matches_single_device():
    assert len(jax.devices()) == 8, "tests expect 8 virtual devices"
    mesh = ensemble_mesh()
    c1, k1 = _correlations(HermanKlukPropagator, {}, None)
    c8, k8 = _correlations(HermanKlukPropagator, {}, mesh)
    np.testing.assert_allclose(c8, c1, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(k8, k1, rtol=1e-12, atol=1e-14)


def test_wm_sharded_matches_single_device():
    mesh = ensemble_mesh()
    kwargs = dict(alpha=100.0, beta=100.0)
    c1, k1 = _correlations(WaltonManolopoulosPropagator, kwargs, None)
    c8, k8 = _correlations(WaltonManolopoulosPropagator, kwargs, mesh)
    np.testing.assert_allclose(c8, c1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(k8, k1, rtol=1e-10, atol=1e-12)


def test_sharded_multimode():
    """5-mode full-rank Morse: sharded and single-device runs must agree."""
    rng = np.random.default_rng(0)
    omega = rng.uniform(0.005, 0.02, size=5)
    chi = np.full(5, 0.02)
    nac = rng.uniform(-1.0, 1.0, size=5)
    pot = MorsePotential.create(omega, chi, nac)
    Gamma = np.diag(omega)
    q0 = rng.uniform(0.5, 1.5, size=5)
    p0 = np.zeros(5)

    mesh = ensemble_mesh()
    results = []
    for m in (None, mesh):
        prop = HermanKlukPropagator(Gamma, Gamma)
        prop.initial_conditions(q0, p0, Gamma, ntraj=2048, key=3,
                                potential=pot, mesh=m)
        results.append(prop.propagate(pot, 1.0, 10, energy0_es=0.01))
    np.testing.assert_allclose(results[1][0], results[0][0], rtol=1e-10)
    np.testing.assert_allclose(results[1][1], results[0][1], rtol=1e-10)
