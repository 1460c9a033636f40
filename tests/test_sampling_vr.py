# coding: utf-8
"""Variance-reduced initial-condition sampling (antithetic pairs and
scrambled-Sobol QMC; VERDICT r4 next #2).

BEYOND-reference capability: the reference samples with a plain torch
pseudo-random stream (reference propagators.py:537-555). Both
variance-reduction modes draw from the SAME Gaussian density — estimators
stay unbiased, converged values unchanged — while the realization-to-
realization spread of the Monte-Carlo observables shrinks at fixed ntraj.
Gates:

* structural: antithetic +-pairs interleave in adjacent rows and mirror
  around the center exactly; densities follow the same log-space formula;
* statistical health: `sampling_statistics` of both modes at least as good
  as the pseudo stream (antithetic mean deviation is exactly 0);
* unbiasedness: k~ic(t) of the 5-mode HARMONIC AS model matches the
  closed-form analytic oracle within the reference-strength gates for
  every mode;
* measured variance reduction across independent realizations at fixed
  ntraj (deterministic seeds — the measured ratios are reproducible);
* error bars: the antithetic stderr treats each pair as ONE sample
  (anticorrelated members) and never exceeds the i.i.d. formula's value.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semiclassical_tpu import units
from semiclassical_tpu.potentials import MorsePotential
from semiclassical_tpu.propagation import HermanKlukPropagator
from semiclassical_tpu.sampling import (SamplingParams,
                                        sample_initial_conditions,
                                        sampling_statistics)


def _params(d=4, seed=0):
    rng = np.random.default_rng(seed)
    omega = rng.uniform(0.002, 0.01, size=d)
    Gamma = np.diag(omega)
    q0 = rng.uniform(-0.5, 0.5, size=d)
    p0 = rng.uniform(-0.1, 0.1, size=d)
    return SamplingParams.create(q0, p0, Gamma, Gamma)


def test_antithetic_structure_and_density():
    params = _params()
    key = jax.random.key(1)
    q, p, logp = sample_initial_conditions(params, key, 64,
                                           method="antithetic")
    z = np.concatenate([np.asarray(q), np.asarray(p)], axis=1)
    z0 = np.asarray(params.z0)
    # interleaved pairs mirror exactly around the center
    assert np.allclose(z[0::2] + z[1::2], 2.0 * z0[None, :], atol=1e-12)
    # pair members have identical densities (the Gaussian is even)
    logp = np.asarray(logp)
    assert np.allclose(logp[0::2], logp[1::2], atol=1e-12)
    # the sample mean is exactly the center — zero-variance mean estimate
    mean_dev, _ = sampling_statistics(params, q, p)
    assert mean_dev < 1e-10


def test_antithetic_requires_even_ntraj():
    params = _params()
    with pytest.raises(ValueError, match="even"):
        sample_initial_conditions(params, jax.random.key(0), 63,
                                  method="antithetic")


def test_unknown_method_rejected():
    params = _params()
    with pytest.raises(ValueError, match="unknown sampling method"):
        sample_initial_conditions(params, jax.random.key(0), 64,
                                  method="qmc")


def test_sobol_density_and_statistics():
    params = _params()
    n = 4096
    q, p, logp = sample_initial_conditions(params, jax.random.key(3), n,
                                           method="sobol")
    q2, p2, _ = sample_initial_conditions(params, jax.random.key(3), n,
                                          method="pseudo")
    # the density formula is shared — verify against a direct evaluation
    # for the drawn points: log P = log_detLz - d log 2pi - |x|^2/2 with
    # x reconstructed through the pseudo-inverse transform
    z = np.concatenate([np.asarray(q), np.asarray(p)], axis=1)
    iLz = np.asarray(params.iLz, dtype=np.float64)
    # x @ iLz = z - z0 and iLz has full row rank: recover x by lstsq
    x = np.linalg.lstsq(iLz.T, (z - np.asarray(params.z0)).T, rcond=None)[0].T
    expect = (float(params.log_detLz)
              - params.dim * np.log(2 * np.pi)
              - 0.5 * np.sum(x * x, axis=1))
    assert np.allclose(np.asarray(logp), expect, atol=1e-6)
    # QMC stratification: covariance deviation no worse than the pseudo
    # stream's at the same n (deterministic seeds)
    _, cov_s = sampling_statistics(params, q, p)
    _, cov_p = sampling_statistics(params, q2, p2)
    assert cov_s <= cov_p * 1.05
    assert cov_s < np.sqrt(2.0 / n) * 3.0


def _harmonic_as():
    """5-mode harmonic AS model with its closed-form k~ic oracle
    (reference tests/test_propagators.py:330-513; eqns. 15-27 of the SI of
    DOI 10.1039/c9sc05012d)."""
    rng = np.random.default_rng(5)
    omega = np.array([450.0, 780.0, 1100.0, 1680.0, 2400.0]) / \
        units.hartree_to_wavenumbers
    S = np.array([0.12, 0.05, 0.20, 0.08, 0.15])
    nac = rng.uniform(-1.0, 1.0, size=5)
    dQ = np.sqrt(2.0 * S / omega)
    nt = 60
    t_max = 150.0 / units.autime_to_fs / 40.0
    times = np.linspace(0.0, t_max, nt)
    A = nac * np.sqrt(omega / (2 * S))
    B = -nac * np.sqrt(omega * S / 2)
    ic_qm = np.zeros(nt, dtype=complex)
    for t in range(nt):
        Xt = S * np.exp(-1j * omega * times[t])
        ic_qm[t] = (np.prod(np.exp(-S + Xt))
                    * (np.sum(A * Xt + B) ** 2 + np.sum(A**2 * Xt)))
    pot = MorsePotential.create(omega, np.zeros(5), nac)
    return omega, dQ, pot, times, nt, ic_qm


def _run_hk(omega, dQ, pot, times, nt, ntraj, key, method,
            error_bars=False):
    Gamma = np.diag(omega)
    prop = HermanKlukPropagator(Gamma, Gamma)
    prop.initial_conditions(dQ, np.zeros_like(dQ), Gamma, ntraj=ntraj,
                            key=key, potential=pot, sampling_method=method)
    dt = times[1] - times[0]
    return prop.propagate(pot, dt, nt, energy0_es=float(np.sum(0.5 * omega)),
                          error_bars=error_bars)


@pytest.mark.parametrize("method", ["antithetic", "sobol"])
def test_unbiased_vs_analytic_oracle(method):
    omega, dQ, pot, times, nt, ic_qm = _harmonic_as()
    cauto, kic = _run_hk(omega, dQ, pot, times, nt, 8192, 0, method)
    assert abs(cauto[0] - 1.0) < 1e-3
    # the reference-strength AS gate (tests/test_propagators.py:489)
    assert np.allclose(kic, ic_qm, rtol=0.1, atol=0.02 * np.abs(ic_qm).max())


def test_measured_variance_reduction():
    """Realization spread across independent keys at fixed ntraj.

    Scrambled-Sobol realizations are mutually independent (independent
    scrambles), so the across-key variance is an unbiased estimate of each
    estimator's MC variance; deterministic keys make the measured ratios
    reproducible. Measured on this 5-mode oracle (10 keys x 1024 traj,
    recorded in BASELINE.md):

        var(C)      pseudo 1.60e-4 | antithetic 1.70e-5 (9.4x)
                    | sobol 6.33e-7 (253x)
        var(k~ic)   pseudo 5.84e-8 | antithetic 7.64e-8 (0.76x — the
                    k~ic estimator is predominantly EVEN in the sampling
                    displacements, so +-pairs correlate positively)
                    | sobol 1.94e-9 (30x)

    The asserted bounds leave >=2x headroom. Practical guidance (also in
    the CLI docs): "sobol" is the variance-reduction default for both
    observables; "antithetic" only pays off for autocorrelation/spectrum
    workloads."""
    omega, dQ, pot, times, nt, ic_qm = _harmonic_as()
    nkeys, ntraj = 10, 1024

    def spread(method):
        ca, ki = [], []
        for k in range(nkeys):
            c, kk = _run_hk(omega, dQ, pot, times, nt, ntraj, 100 + k,
                            method)
            ca.append(np.asarray(c))
            ki.append(np.asarray(kk))
        return (float(np.mean(np.var(np.stack(ca), axis=0))),
                float(np.mean(np.var(np.stack(ki), axis=0))))

    vc_pseudo, vk_pseudo = spread("pseudo")
    vc_anti, vk_anti = spread("antithetic")
    vc_sobol, vk_sobol = spread("sobol")
    # antithetic: strong on the (odd-component-rich) autocorrelation ...
    assert vc_anti < 0.25 * vc_pseudo, (vc_anti, vc_pseudo)
    # ... and never worse than the theoretical 2x bound on k~ic
    assert vk_anti < 2.0 * vk_pseudo, (vk_anti, vk_pseudo)
    # scrambled Sobol stratifies all 10 sampling dimensions: large
    # reductions on BOTH observables
    assert vc_sobol < 0.05 * vc_pseudo, (vc_sobol, vc_pseudo)
    assert vk_sobol < 0.25 * vk_pseudo, (vk_sobol, vk_pseudo)


def test_antithetic_error_bars_pair_folding():
    """The antithetic stderr treats each +-pair as one sample. The
    honesty check runs BOTH formulas on the same ensemble: the pair-folded
    value must be SMALLER than i.i.d. where the pair members anticorrelate
    (the autocorrelation — measured 9.4x variance reduction above) and
    LARGER where they correlate positively (k~ic — measured 0.76x); the
    i.i.d. formula would misreport both."""
    from semiclassical_tpu.propagation.hk import _hk_scan_jit

    omega, dQ, pot, times, nt, _ = _harmonic_as()
    Gamma = np.diag(omega)
    prop = HermanKlukPropagator(Gamma, Gamma)
    prop.initial_conditions(dQ, np.zeros(5), Gamma, ntraj=512, key=7,
                            potential=pot, sampling_method="antithetic")
    dt = times[1] - times[0]

    cauto, kic, err_c, err_k = prop.propagate(
        pot, dt, 8, energy0_es=0.0, error_bars=True)
    assert np.isfinite(err_c).all() and np.isfinite(err_k).all()
    assert (err_c >= 0).all() and (err_k >= 0).all()
    # HK t=0 autocorrelation is importance-sampled exactly (the pair-folded
    # second moment cancels to f32-reduction roundoff, not to zero bitwise)
    assert err_c[0] < 1e-6

    # i.i.d. vs pair-folded second moments on the same state/ensemble
    def stderrs(mode, n_samples):
        p2 = HermanKlukPropagator(Gamma, Gamma)
        p2.initial_conditions(dQ, np.zeros(5), Gamma, ntraj=512, key=7,
                              potential=pot, sampling_method="antithetic")
        _, outs = _hk_scan_jit(p2.params, p2._bc, pot, p2.state,
                               p2.trackers["prefactorC"],
                               jnp.float64(0.0), jnp.float64(dt), 8,
                               None, mode)
        cauto_u, kic_u, m2c, m2k, _ = outs

        def one(m2, total):
            mx = np.asarray(m2[0], dtype=np.float64)
            ssq = np.asarray(m2[1], dtype=np.float64)
            rel = np.abs(np.asarray(total)) / np.where(mx > 0, mx, 1.0)
            var = np.maximum(ssq - rel**2 / n_samples, 0.0)
            return np.where(mx > 0, mx * np.sqrt(var), 0.0)

        return one(m2c, cauto_u), one(m2k, kic_u)

    iid_c, iid_k = stderrs(True, 512)
    pr_c, pr_k = stderrs("pairs", 256)
    # C(t): pairs anticorrelate -> folded stderr strictly smaller (t > 0)
    assert (pr_c[1:] < iid_c[1:]).all(), (pr_c, iid_c)
    # k~ic: pairs correlate positively -> folded stderr larger
    assert (pr_k > iid_k).all(), (pr_k, iid_k)


def test_antithetic_micro_batch_odd_subbatch_rejected():
    omega, dQ, pot, times, nt, _ = _harmonic_as()
    Gamma = np.diag(omega)
    prop = HermanKlukPropagator(Gamma, Gamma)
    # 384 = 128 sub-batches of 3 — an ODD sub-batch size that divides
    prop.initial_conditions(dQ, np.zeros(5), Gamma, ntraj=384, key=7,
                            potential=pot, sampling_method="antithetic")
    with pytest.raises(ValueError, match="even micro-batch"):
        prop.propagate(pot, 1.0, 2, error_bars=True, micro_batch=3)


def test_cli_sampling_keyword(tmp_path, monkeypatch):
    from semiclassical_tpu import cli

    model_file = tmp_path / "AS_model.dat"
    model_file.write_text("1500.0  0.1  0.5  0.00\n")
    monkeypatch.chdir(tmp_path)
    task = {
        "task": "dynamics",
        "potential": {"type": "anharmonic AS",
                      "model_file": str(model_file)},
        "propagator": "HK",
        "batch_size": 128,
        "num_trajectories": 128,
        "num_steps": 4,
        "time_step_fs": 0.1,
        "manual_seed": 3,
        "sampling": "antithetic",
        "error_bars": True,
        "results": {"correlations": str(tmp_path / "correlations.npz")},
    }
    from semiclassical_tpu.config import validate_task
    validate_task(task)
    cli.run_semiclassical_dynamics(task)
    data = np.load(tmp_path / "correlations.npz")
    assert abs(data["autocorrelation"][0] - 1.0) < 1e-3
    assert np.isfinite(data["ic_correlation_stderr"]).all()
