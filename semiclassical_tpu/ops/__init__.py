# coding: utf-8
"""Pallas TPU kernels for the hot operations.

Currently: the batched complex determinant of the semiclassical prefactor
(the single most expensive op of the HK/WM step — see BASELINE.md ablation).
"""

from semiclassical_tpu.ops.det_kernel import (pallas_batched_det,
                                              pallas_batched_det_inv_lanes,
                                              pallas_batched_det_lanes,
                                              pallas_batched_det_solve_lanes)

__all__ = ["pallas_batched_det", "pallas_batched_det_lanes",
           "pallas_batched_det_inv_lanes", "pallas_batched_det_solve_lanes"]
