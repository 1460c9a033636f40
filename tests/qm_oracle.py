# coding: utf-8
"""Exact quantum-mechanical oracles used by the propagator tests.

Independent split-operator FFT propagation on a 1D grid — the same class of
oracle the reference uses to validate HK/WM (reference
tests/test_propagators.py:143-246), implemented from the standard textbook
algorithm.
"""

import numpy as np
from numpy import fft

hbar = 1.0


def split_operator_correlations(v_grid, x, times, psi0, substeps=20,
                                mass=1.0, psi_ref=None):
    """Propagate psi0 on the potential `v_grid` and record <psi_ref|psi(t)>.

    Parameters
    ----------
    v_grid : (nx,) potential on the grid
    x : (nx,) equidistant spatial grid
    times : (nt,) equidistant time grid starting at 0
    psi0 : (nx,) initial wavefunction
    substeps : split-operator substeps per output time step
    psi_ref : wavefunction in the bra (defaults to psi0)

    Returns
    -------
    corr : complex (nt,) overlap <psi_ref|psi(t)>
    """
    nx = x.shape[0]
    dx = x[1] - x[0]
    nt = times.shape[0]
    dt = times[1] - times[0]
    if psi_ref is None:
        psi_ref = psi0

    k = 2.0 * np.pi * fft.fftfreq(nx, d=dx)
    expT = np.exp(-(1.0j / hbar) * (hbar * k) ** 2 / (2.0 * mass)
                  * (dt / substeps))
    expV = np.exp(-(1.0j / hbar) * v_grid * (dt / substeps))

    psi = psi0.astype(complex).copy()
    corr = np.zeros(nt, dtype=complex)
    for t in range(nt):
        corr[t] = np.sum(psi_ref.conjugate() * psi * dx)
        for _ in range(substeps):
            psi = expV * fft.ifft(expT * fft.fft(psi))
    return corr


def split_operator_wavefunctions(v_grid, x, times, psi0, save_steps,
                                 substeps=20, mass=1.0):
    """Propagate psi0 and return {step: psi(x, t_step)} for the requested
    output steps (same scheme as split_operator_correlations)."""
    nx = x.shape[0]
    dx = x[1] - x[0]
    nt = times.shape[0]
    dt = times[1] - times[0]
    save_steps = set(int(t) for t in save_steps)

    k = 2.0 * np.pi * fft.fftfreq(nx, d=dx)
    expT = np.exp(-(1.0j / hbar) * (hbar * k) ** 2 / (2.0 * mass)
                  * (dt / substeps))
    expV = np.exp(-(1.0j / hbar) * v_grid * (dt / substeps))

    psi = psi0.astype(complex).copy()
    out = {}
    for t in range(nt):
        if t in save_steps:
            out[t] = psi.copy()
        for _ in range(substeps):
            psi = expV * fft.ifft(expT * fft.fft(psi))
    return out


def gaussian_wavepacket(x, x0, p0, alpha):
    """Normalised Gaussian (2 alpha / pi)^{1/4} exp(-alpha (x-x0)^2 + i p0 (x-x0))."""
    return ((2 * alpha / np.pi) ** 0.25
            * np.exp(-alpha * (x - x0) ** 2 + 1.0j * p0 * (x - x0) / hbar))


def momentum_operator(psi, x):
    """Apply d/dx via FFT."""
    nx = x.shape[0]
    dx = x[1] - x[0]
    k = 2.0 * np.pi * fft.fftfreq(nx, d=dx)
    return fft.ifft((1.0j * k) * fft.fft(psi))
