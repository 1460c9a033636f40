# coding: utf-8
"""End-to-end golden test: the methylium_AH example through the real CLI
task functions, compared against the reference's committed golden outputs
(reference tests/test_examples.py:43-111).

The reference golden was produced with torch's seeded RNG; our RNG stream
differs, so the comparison is the physics (correlations within a few % of
the max amplitude at 50k trajectories; rate at the curve maximum within a
few %), not bitwise identity.
"""

import json
import os
import shutil

import numpy as np
import pytest

from semiclassical_tpu import cli

EXAMPLE = "examples/methylium_AH"


@pytest.fixture()
def example_dir(ref_data, tmp_path):
    src = ref_data / EXAMPLE
    if not src.is_dir():
        pytest.skip(f"{src} not available")
    dst = tmp_path / "methylium_AH"
    shutil.copytree(src, dst)
    os.chmod(dst, 0o755)
    for p in dst.iterdir():
        os.chmod(p, 0o644)
    return dst


@pytest.mark.slow
def test_methylium_example(example_dir, monkeypatch):
    monkeypatch.chdir(example_dir)
    with open("semi.json") as f:
        config = json.load(f)

    # shrink: the golden was produced with 50000 trajectories x 2000 steps;
    # full scale is exercised in the benchmark, the test uses 10000 x 2000
    # which stays well within the 3%-of-max gates
    for task in config["semi"]:
        if task["task"] == "dynamics":
            task["num_trajectories"] = 10000
            task["batch_size"] = 10000
            task.pop("manual_seed", None)
            cli.run_semiclassical_dynamics(task)
    for task in config["semi"]:
        if task["task"] == "rates":
            cli.calculate_rates(task)

    data = dict(np.load("correlations.npz"))
    check = dict(np.load("correlations.npz.CHECK"))

    # The committed golden predates the reference adding the excited-state
    # phase exp(i E0 t / hbar) to the *autocorrelation* (the golden npz has
    # no `zero_point_energy` key and its C(0) = 1.024, which the current
    # reference CLI itself asserts against, reference cli.py:467). Running
    # the current torch reference reproduces OUR phases, not the golden's.
    # The comparison therefore uses: C(t) with the golden's phase
    # convention (no ZPE phase), and k~ic(t) / the rate as committed
    # (those carry the phase in both versions).
    zpe = float(data["zero_point_energy"])
    cauto_oldconv = data["autocorrelation"] * np.exp(-1j * zpe * data["times"])
    assert np.allclose(
        cauto_oldconv, check["autocorrelation"],
        atol=0.04 * np.abs(check["autocorrelation"]).max())
    assert np.allclose(
        data["ic_correlation"], check["ic_correlation"],
        atol=0.03 * np.abs(check["ic_correlation"]).max())
    imax = int(np.argmax(check["ic_rate"]))
    assert (abs(check["ic_rate"][imax] - data["ic_rate"][imax])
            < 0.05 * abs(data["ic_rate"][imax]))
