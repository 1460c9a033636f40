# coding: utf-8
"""Newton's equations of motion for trajectories + monodromy matrices,
and the fixed-step RK4 integrator.

Capability parity with reference propagators.py:86-119 (RK4) and
propagators.py:296-398 (EquationsOfMotion). Differences by design:

* the derivative acts on the structured `TrajState` pytree via `tree_map`
  instead of a packed flat vector;
* the Hessian-monodromy products go through the potential's structured
  `HessianOp`, so separable potentials cost O(n d^2) instead of O(n d^3);
* each RK4 stage evaluates the potential once, exactly like the reference
  (4 PES evaluations per step — required for trajectory-level parity);
* the batch-mean total energy <T + V> at the step start is returned for the
  post-scan energy-conservation check (the reference syncs it to the host
  every step, propagators.py:380-398).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semiclassical_tpu.propagation.state import TrajState

__all__ = ["state_derivative", "rk4_step"]


def state_derivative(state: TrajState, potential):
    """dy/dt for the combined (q, p, M, S) system.

        dq/dt = p / m
        dp/dt = -grad V
        dMqq/dt = Mpq / m        dMqp/dt = Mpp / m
        dMpq/dt = -H Mqq         dMpp/dt = -H Mqp
        dS/dt = T - V

    (reference propagators.py:342-368)

    Returns (dstate, mean_energy) where mean_energy = <T + V> over the batch.
    """
    inv_m = 1.0 / potential.masses()                     # (d,)
    vpot, grad, hess = potential.local_expansion(state.q)

    tkin = 0.5 * jnp.sum(state.p**2 * inv_m[None, :], axis=1)

    inv_m_mono = inv_m.astype(state.Mqq.dtype)
    dstate = TrajState(
        q=state.p * inv_m[None, :],
        p=-grad.astype(state.p.dtype),
        Mqq=state.Mpq * inv_m_mono[None, :, None],
        Mqp=state.Mpp * inv_m_mono[None, :, None],
        Mpq=-hess.matmul(state.Mqq),
        Mpp=-hess.matmul(state.Mqp),
        S=tkin - vpot,
    )
    mean_energy = jnp.mean(tkin + vpot)
    return dstate, mean_energy


def rk4_step(state: TrajState, potential, dt):
    """One classic 4th-order Runge-Kutta step.

    Returns (new_state, mean_energy_at_step_start). The returned energy is
    evaluated at the k1 stage (the exact state at time t), which is the
    quantity whose step-to-step drift the conservation guard monitors.
    """
    # the step size may be a traced f64 scalar while monodromy leaves are
    # f32 (mixed mode) — cast per leaf so dtypes are preserved in the carry
    axpy = lambda y, a, k: jax.tree.map(
        lambda yi, ki: yi + jnp.asarray(a).astype(yi.dtype) * ki, y, k)

    # sequential accumulation: at most 4 state-sized trees are live at any
    # point (y, acc, stage point, current k) instead of y + k1..k4 — the
    # monodromy blocks dominate device memory at large trajectory batches
    k, en = state_derivative(state, potential)
    acc = axpy(state, dt / 6.0, k)            # y + dt/6 k1
    k, _ = state_derivative(axpy(state, 0.5 * dt, k), potential)
    acc = axpy(acc, dt / 3.0, k)              # + dt/3 k2
    k, _ = state_derivative(axpy(state, 0.5 * dt, k), potential)
    acc = axpy(acc, dt / 3.0, k)              # + dt/3 k3
    k, _ = state_derivative(axpy(state, dt, k), potential)
    new_state = axpy(acc, dt / 6.0, k)        # + dt/6 k4
    return new_state, en
