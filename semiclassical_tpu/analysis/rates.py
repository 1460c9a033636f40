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
    n_sym = 2 * nt - 1

    # Hermitian extension onto [-t_max, t_max]: only t >= 0 was propagated;
    # k(-t) = k(t)^* because k(E) is real.
    t_sym = np.linspace(-t_max, t_max, n_sym)
    corr_sym = np.concatenate([correlation[:0:-1].conj(), correlation])

    # The integration window is the lineshape times a cos^2 (Gibbs) taper
    # that takes the integrand smoothly to zero at +-t_max, suppressing the
    # ringing of the hard cutoff. The taper also means a too-short t_max
    # yields rates set by the window, not the physics — t_max must be
    # converged until the rate curve stops moving.
    window = lineshape(t_sym) * np.cos(0.5 * np.pi * t_sym / t_max) ** 2

    # ifft computes the mean over the grid (1/N included); scaling by the
    # window length 2 t_max turns that mean into the Fourier integral
    rate = 2 * t_max * fft.ifft(fft.ifftshift(window * corr_sym))
    rate *= 1.0e15 / units.autime_to_fs     # a.u.(time)^-1 -> s^-1

    energies = 2.0 * np.pi * fft.fftfreq(n_sym, d=2.0 * t_max / n_sym)
    return fft.fftshift(energies), fft.fftshift(rate)
