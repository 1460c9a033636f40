# coding: utf-8
"""Rate constants by Fourier transform of correlation functions.

Behavioural parity with reference rates.py:20-82. This stage is host-side
numpy on purpose: it runs once per job on a ~10^3-point array — there is
nothing for a TPU to accelerate, and keeping it framework-free lets `semi
rates` run without any accelerator attached.
"""

__all__ = ["rate_from_correlation"]

import numpy as np
from numpy import fft

from semiclassical_tpu import units


def rate_from_correlation(times, correlation, lineshape):
    """Rate constant k(E) as the Fourier transform of the correlation k~(t).

    The environment is included by damping k~(t) with the time-domain
    lineshape f~(t):

        k(E) = 1/(2 pi hbar) \\int dt  e^{i E t / hbar} f~(t) k~(t)

    Parameters
    ----------
    times : real ndarray (nt,)
        equidistant time grid covering [0, t_max]
    correlation : complex ndarray (nt,)
        correlation function k~(t) on the time grid
    lineshape : callable
        time-domain lineshape f~(t), called as ``lineshape(times)``

    Returns
    -------
    energies : real ndarray (2 nt - 1,)
        energy gap E (Hartree)
    rate : complex ndarray (2 nt - 1,)
        rate constant k(E) (s^-1)
    """
    times = np.asarray(times)
    correlation = np.asarray(correlation)
    assert times.min() == 0.0, "time grid `times` should start at 0.0"
    assert times.shape == correlation.shape, (
        "arrays `times` and `correlation` should have the same length"
    )
    nt = times.shape[0]
    t_max = times.max()

    # k~(t) was sampled on [0, t_max]; the Fourier transform needs the
    # symmetric interval [-t_max, t_max]. Negative times are filled in from
    # the symmetry k(-t) = k(t)^*.
    times_ = np.linspace(-t_max, t_max, 2 * nt - 1)
    energies = fft.fftfreq(2 * nt - 1) * (2 * nt - 1) / (2 * t_max) * 2.0 * np.pi

    correlation_ = np.zeros(2 * nt - 1, dtype=complex)
    correlation_[(2 * nt - 1) // 2:] = correlation
    correlation_[: (2 * nt - 1) // 2] = (correlation[1:].conj())[::-1]

    lineshape_t = lineshape(times_)

    # Gibbs switching function damps k~(t) to 0 at t = t_max.
    # WARNING: if the propagation time is too short, the rates are determined
    # by the damping function rather than the correlation function.
    damp = np.cos(0.5 * np.pi * times_ / t_max) ** 2

    rate = 2 * t_max * fft.ifft(fft.ifftshift(damp * lineshape_t * correlation_))

    # convert from atomic units to s^-1
    rate *= 1.0e15 / units.autime_to_fs

    return fft.fftshift(energies), fft.fftshift(rate)
