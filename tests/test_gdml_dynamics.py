# coding: utf-8
"""End-to-end HK dynamics on the sGDML coumarin potential.

Exercises the full molecular ML pipeline: fchk-derived initial wavepacket
(with 6 zero modes), analytic batched GDML Hessians inside the RK4 monodromy
propagation, and the IC observables — at test scale (small ensemble, short
time)."""

import numpy as np
import pytest

import jax.numpy as jnp

from semiclassical_tpu.io import FormattedCheckpointFile
from semiclassical_tpu.potentials import MolecularGDMLPotential, minimize
from semiclassical_tpu.propagation import HermanKlukPropagator


@pytest.mark.slow
def test_main_gdml_dynamics_without_hess_dtype(ref_data, tmp_path,
                                               monkeypatch):
    """A gdml task without the *optional* hess_dtype keyword must run
    through the real cli.main() path (validate_task + run) — regression for
    the round-2 schema bug that demanded every potential key."""
    import json

    from semiclassical_tpu import cli

    model_path = (ref_data / "GDML"
                  / "coumarin_forces_au-wB97XD_def2SVP-train200-sym1.npz")
    s1 = ref_data / "Gaussian16" / "coumarin_s1.fchk"
    if not model_path.exists() or not s1.exists():
        pytest.skip("coumarin fixtures not available")

    monkeypatch.chdir(tmp_path)
    task = {
        "task": "dynamics",
        "potential": {
            "type": "gdml",
            "ground": str(model_path),
            "excited": str(s1),
            "coupling": str(s1),
        },
        "batch_size": 8,
        "num_trajectories": 8,
        "num_steps": 3,
        "time_step_fs": 0.002,
        "results": {"correlations": "correlations.npz"},
    }
    with open("input.json", "w") as f:
        json.dump({"semi": [task]}, f)
    assert cli.main(["dynamics", "input.json"]) == 0
    d = np.load("correlations.npz")
    assert np.isfinite(d["autocorrelation"]).all()


@pytest.mark.slow
def test_gdml_hk_dynamics(ref_data):
    model_path = (ref_data / "GDML"
                  / "coumarin_forces_au-wB97XD_def2SVP-train200-sym1.npz")
    s0 = ref_data / "Gaussian16" / "coumarin_s0.fchk"
    s1 = ref_data / "Gaussian16" / "coumarin_s1.fchk"
    if not model_path.exists() or not s1.exists():
        pytest.skip("coumarin fixtures not available")

    model = np.load(model_path, allow_pickle=True)
    with open(s1) as f:
        exc = FormattedCheckpointFile(f)
    pot = MolecularGDMLPotential.create(model, exc)

    x0, Gamma0, zpe = exc.vibrational_groundstate()
    pot = minimize(pot, jnp.asarray(x0))

    prop = HermanKlukPropagator(Gamma0, Gamma0)
    prop.initial_conditions(x0, np.zeros_like(x0), Gamma0, ntraj=16, key=0,
                            potential=pot)
    # a handful of small steps — the gate is stability + C(0) normalisation
    dt = 0.1  # a.u.
    cauto, kic = prop.propagate(pot, dt, 5, energy0_es=zpe)
    assert np.isfinite(cauto).all() and np.isfinite(kic).all()
    assert abs(cauto[0] - 1.0) < 0.05  # MC estimate at tiny ntraj
    # |C| decays or stays bounded
    assert np.abs(cauto).max() < 1.5
