# coding: utf-8
"""Device-side O(n^2) norm (VERDICT r3 weak #2): the block-pair loop as
ONE jitted program (hk.blocked_pair_sum / _pair_sum_device) and, under a
mesh, as a shard_map systolic ring over the `traj` axis
(hk._pair_sum_ring) — SURVEY P4. The host-loop fallback (uneven blocks)
is the round-3 behaviour and serves as the oracle."""

import numpy as np
import jax

from semiclassical_tpu.parallel import ensemble_mesh
from semiclassical_tpu.potentials import MorsePotential
from semiclassical_tpu.propagation import (HermanKlukPropagator,
                                           WaltonManolopoulosPropagator)
from semiclassical_tpu.propagation.hk import pairwise_norm
from semiclassical_tpu.propagation.wm import wm_norm


def _pot(d=3):
    rng = np.random.default_rng(1)
    omega = rng.uniform(0.004, 0.01, size=d)
    nac = rng.uniform(-1.0, 1.0, size=d)
    return MorsePotential.create(omega, np.full(d, 0.02), nac)


def _hk(ntraj=512, key=5, mesh=None, nt=8):
    pot = _pot()
    Gamma = np.diag(np.asarray(pot.omega))
    d = pot.dimensions()
    prop = HermanKlukPropagator(Gamma, Gamma)
    prop.initial_conditions(np.full(d, 0.2), np.zeros(d), Gamma,
                            ntraj=ntraj, key=key, potential=pot, mesh=mesh)
    if nt:
        prop.propagate(pot, 1.0, nt, energy0_es=0.05)
    return prop


def test_hk_device_blocked_equals_host_loop():
    prop = _hk()
    v = prop.coefficients()
    args = (prop.params.csott, prop.state.q, prop.state.p, v)
    n_dev = pairwise_norm(*args, block=128)   # single-jit device loop
    n_host = pairwise_norm(*args, block=100)  # uneven blocks -> host loop
    assert abs(n_dev - n_host) < 1e-10
    assert np.isfinite(n_dev) and n_dev > 0
    # (no |psi| ~ 1 assertion: norm estimates at tiny ensembles are
    # MC-noise dominated — project numerics notes; the host-loop oracle
    # equality above is the contract under test, the physics gates live
    # in tests/test_propagators_1d.py at 50k trajectories)


def test_hk_ring_matches_single_device():
    assert len(jax.devices()) == 8
    mesh = ensemble_mesh()
    p_mesh = _hk(mesh=mesh)
    p_solo = _hk(mesh=None)
    n_ring = p_mesh.norm()
    n_solo = p_solo.norm()
    assert abs(n_ring - n_solo) < 1e-10


def test_hk_ring_blocked_within_shard():
    """Ring path with multiple blocks per shard (n_loc = 128, block 32)."""
    mesh = ensemble_mesh()
    prop = _hk(ntraj=1024, mesh=mesh)
    v = prop.coefficients()
    args = (prop.params.csott, prop.state.q, prop.state.p, v)
    n_ring = pairwise_norm(*args, block=32, mesh=mesh)
    n_dev = pairwise_norm(*args, block=128)
    assert abs(n_ring - n_dev) < 1e-10


def _wm(ntraj=256, key=5, mesh=None, nt=8):
    pot = _pot()
    Gamma = np.diag(np.asarray(pot.omega))
    d = pot.dimensions()
    prop = WaltonManolopoulosPropagator(Gamma, Gamma, 1e4, 1e4)
    prop.initial_conditions(np.full(d, 0.2), np.zeros(d), Gamma,
                            ntraj=ntraj, key=key, potential=pot, mesh=mesh)
    if nt:
        prop.propagate(pot, 1.0, nt, energy0_es=0.05)
    return prop


def test_wm_device_blocked_equals_host_loop():
    prop = _wm()
    log_v, derived = prop._log_coefficients_and_derived()
    args = (prop.params, prop._bc, prop.state, derived, log_v)
    n_dev = wm_norm(*args, block=64)
    n_host = wm_norm(*args, block=100)  # uneven blocks -> host loop
    assert abs(n_dev - n_host) < 1e-10
    assert np.isfinite(n_dev) and n_dev > 0


def test_wm_ring_matches_single_device():
    mesh = ensemble_mesh()
    p_mesh = _wm(mesh=mesh)
    p_solo = _wm(mesh=None)
    assert abs(p_mesh.norm() - p_solo.norm()) < 1e-10
