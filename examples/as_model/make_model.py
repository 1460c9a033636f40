#!/usr/bin/env python
# coding: utf-8
"""Generate an anharmonic adiabatic-shift (AS) model file for `semi dynamics`.

Columns: frequency/cm^-1, Huang-Rhys factor (sign = displacement sign),
NAC component, anharmonicity chi. The example writes the 60-mode production
benchmark model.

Usage: python make_model.py [num_modes] [chi] > AS_model.dat
"""

import sys

import numpy as np


def main(argv):
    num_modes = int(argv[1]) if len(argv) > 1 else 60
    chi = float(argv[2]) if len(argv) > 2 else 0.02
    rng = np.random.default_rng(42)
    omega_cm = rng.uniform(200.0, 3000.0, size=num_modes)
    S = rng.uniform(0.01, 0.3, size=num_modes)
    nac = rng.uniform(-1.0, 1.0, size=num_modes)
    print("# AS model: frequency/cm-1, Huang-Rhys S, NAC, chi")
    for w, s, n in zip(omega_cm, S, nac):
        print(f"{w:12.4f} {s:12.6f} {n:12.6f} {chi:8.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
