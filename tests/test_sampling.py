# coding: utf-8
"""Initial-condition sampling statistics (reference logs these diagnostics
at propagators.py:570-578; here they are asserted)."""

import numpy as np
import jax

from semiclassical_tpu.sampling import SamplingParams, sample_initial_conditions


def test_sampling_moments_full_rank():
    d = 3
    rng = np.random.default_rng(0)
    V, _ = np.linalg.qr(rng.random((d, d)))
    e = rng.random(d) + 0.5
    G0 = V @ np.diag(e) @ V.T
    Gi = G0
    q0 = rng.random(d)
    p0 = rng.random(d)

    params = SamplingParams.create(q0, p0, G0, Gi)
    assert params.rank == d
    q, p, log_prob = sample_initial_conditions(params, jax.random.key(0),
                                               200000)
    q, p = np.asarray(q), np.asarray(p)

    # sample means
    assert np.allclose(q.mean(0), q0, atol=0.02)
    assert np.allclose(p.mean(0), p0, atol=0.02)

    # analytic covariances: cov(q) = [2 Gi (Gi+G0)^{-1} G0]^{-1},
    # cov(p) = (Gi+G0)/2
    cov_q_expected = np.linalg.inv(2 * Gi @ np.linalg.inv(Gi + G0) @ G0)
    cov_p_expected = (Gi + G0) / 2
    assert np.allclose(np.cov(q.T), cov_q_expected, atol=0.03)
    assert np.allclose(np.cov(p.T), cov_p_expected, atol=0.03)

    # log densities are finite and O(d)
    assert np.isfinite(np.asarray(log_prob)).all()


def test_sampling_zero_modes():
    """Zero-frequency modes are excluded: samples stay at the center."""
    d = 4
    rng = np.random.default_rng(1)
    V, _ = np.linalg.qr(rng.random((d, d)))
    e = np.array([1.0, 0.7, 0.5, 0.0])
    G0 = V @ np.diag(e) @ V.T
    q0 = rng.random(d)
    p0 = np.zeros(d)

    params = SamplingParams.create(q0, p0, G0, G0)
    assert params.rank == 3
    q, p, log_prob = sample_initial_conditions(params, jax.random.key(0),
                                               5000)
    # displacement along the zero mode is identically zero
    null_vec = V[:, 3]
    dq = np.asarray(q) - q0
    assert np.abs(dq @ null_vec).max() < 1e-10
    assert np.abs(np.asarray(p) @ null_vec).max() < 1e-10
