# coding: utf-8
"""argv-level smoke tests of the validation scripts (SURVEY C17).

The reference ships these scripts untested; round-1 review found dead code
in one of them that any execution would have caught — so here each script's
main() runs end-to-end on the coumarin fixtures and the output file is
sanity-checked.
"""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest

SCRIPTS = pathlib.Path(__file__).resolve().parents[1] / "scripts"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def gdml_fixtures(ref_data):
    model = ref_data / "GDML" / "coumarin_forces_au-wB97XD_def2SVP-train200-sym1.npz"
    fchk = ref_data / "Gaussian16" / "coumarin_s0.fchk"
    xyz = ref_data / "GDML" / "coumarin.xyz"
    return model, fchk, xyz


def test_compare_normal_modes_script(gdml_fixtures, tmp_path):
    model, fchk, _ = gdml_fixtures
    mod = _load("sgdml_compare_normal_modes")
    out = tmp_path / "modes.dat"
    rc = mod.main(["prog", str(model), str(fchk), str(out)])
    assert rc == 0
    lines = [ln for ln in out.read_text().splitlines()
             if ln and not ln.startswith("#")]
    # one row per vibrational mode: 3 * 17 atoms = 51
    assert len(lines) == 51
    # the tabulated sGDML frequencies should be finite numbers
    freqs = np.array([float(ln.split()[2]) for ln in lines])
    assert np.isfinite(freqs).all()


def test_compare_relaxed_scan_script(gdml_fixtures, tmp_path):
    model, _, xyz = gdml_fixtures
    mod = _load("sgdml_compare_relaxed_scan")
    out = tmp_path / "scan.dat"
    rc = mod.main(["prog", str(model), str(xyz), str(out)])
    assert rc == 0
    lines = [ln for ln in out.read_text().splitlines()
             if ln and not ln.startswith("#")]
    assert len(lines) == 1  # one frame in coumarin.xyz
    e_ml = float(lines[0].split()[2])
    assert np.isfinite(e_ml)


def test_scripts_usage_exit():
    for name in ("sgdml_compare_normal_modes", "sgdml_compare_relaxed_scan"):
        assert _load(name).main(["prog"]) == 1


@pytest.mark.slow
def test_validate_1d_study_script(tmp_path):
    """The standalone 1D validation study (scripts/validate_1d.py — the
    framework's analogue of the reference's long-form study script,
    reference tests/test_HK_WM_1d.py) passes its own gates at a reduced
    scale and writes the comparison figures."""
    mod = _load("validate_1d")
    out = tmp_path / "figs"
    rc = mod.main(["prog", "--ntraj", "2000", "--periods", "0.5",
                   "--nt", "40", "--plot", str(out)])
    assert rc == 0
    assert (out / "correlations_1d.png").exists()
    assert (out / "wavefunctions_1d.png").exists()
