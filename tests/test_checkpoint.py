# coding: utf-8
"""Checkpoint/resume: a killed-and-resumed run must reproduce the
uninterrupted run exactly (same trajectories, same sign-tracker state)."""

import numpy as np

from semiclassical_tpu.checkpoint import CheckpointedRun
from semiclassical_tpu.potentials import NonHarmonicPotential
from semiclassical_tpu.propagation import HermanKlukPropagator


def _make_prop(pot, key=5):
    Gi = np.array([[2 * 2.5]])
    G0 = np.array([[1.0]])
    prop = HermanKlukPropagator(Gi, Gi)
    prop.initial_conditions(np.array([7.3]), np.array([0.0]), G0,
                            ntraj=2000, key=key, potential=pot)
    return prop


def test_resume_matches_uninterrupted(tmp_path):
    pot = NonHarmonicPotential.create()
    dt, nt, en0 = 0.02, 40, 0.5

    # uninterrupted
    prop_a = _make_prop(pot)
    cauto_a, kic_a = prop_a.propagate(pot, dt, nt, energy0_es=en0)

    # checkpointed, "killed" after 2 segments, resumed in a fresh process
    ckpt = str(tmp_path / "ckpt.npz")
    prop_b = _make_prop(pot)
    run_b = CheckpointedRun(ckpt, prop_b, pot, dt=dt, nt=nt,
                            energy0_es=en0, segment=10)
    # simulate crash: run only 2 segments manually
    c_part, k_part = prop_b.propagate(pot, dt, 10, energy0_es=en0)
    c_part2, k_part2 = prop_b.propagate(pot, dt, 10, energy0_es=en0)
    from semiclassical_tpu.checkpoint import save_propagator_state
    cauto = np.zeros(nt, dtype=complex)
    kic = np.zeros(nt, dtype=complex)
    cauto[:10], cauto[10:20] = c_part, c_part2
    kic[:10], kic[10:20] = k_part, k_part2
    save_propagator_state(ckpt, prop_b,
                          partial={"cauto": cauto, "kic": kic,
                                   "steps_done": 20})

    # resume with a fresh propagator (different RNG key — overwritten by
    # the checkpoint)
    prop_c = _make_prop(pot, key=999)
    run_c = CheckpointedRun(ckpt, prop_c, pot, dt=dt, nt=nt,
                            energy0_es=en0, segment=10)
    cauto_c, kic_c = run_c.run()

    np.testing.assert_allclose(cauto_c, cauto_a, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(kic_c, kic_a, rtol=1e-12, atol=1e-14)


def test_chunked_propagation_matches_single_scan():
    """propagate(chunk=k) must reproduce the single-scan result exactly —
    including the branch-cut sign trackers carried across chunk borders."""
    pot = NonHarmonicPotential.create()
    dt, nt, en0 = 0.02, 30, 0.5

    prop_a = _make_prop(pot)
    ca, ka = prop_a.propagate(pot, dt, nt, energy0_es=en0)

    prop_b = _make_prop(pot)
    cb, kb = prop_b.propagate(pot, dt, nt, energy0_es=en0, chunk=7)

    np.testing.assert_allclose(cb, ca, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(kb, ka, rtol=1e-12, atol=1e-14)


def test_wm_checkpoint_roundtrip(tmp_path):
    from semiclassical_tpu.checkpoint import (
        load_propagator_state,
        save_propagator_state,
    )
    from semiclassical_tpu.propagation import WaltonManolopoulosPropagator

    pot = NonHarmonicPotential.create()
    Gi = np.array([[2 * 2.5]])
    G0 = np.array([[1.0]])

    prop = WaltonManolopoulosPropagator(Gi, Gi, 100.0, 100.0)
    prop.initial_conditions(np.array([7.3]), np.array([0.0]), G0,
                            ntraj=500, key=2, potential=pot)
    prop.propagate(pot, 0.02, 10, energy0_es=0.5)
    ckpt = str(tmp_path / "wm.npz")
    save_propagator_state(ckpt, prop)
    ref_c = prop.autocorrelation(energy0_es=0.5)

    prop2 = WaltonManolopoulosPropagator(Gi, Gi, 100.0, 100.0)
    prop2.initial_conditions(np.array([7.3]), np.array([0.0]), G0,
                             ntraj=500, key=77, potential=pot)
    load_propagator_state(ckpt, prop2)
    assert prop2.t == prop.t
    assert abs(prop2.autocorrelation(energy0_es=0.5) - ref_c) < 1e-12
