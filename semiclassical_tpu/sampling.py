# coding: utf-8
"""Monte-Carlo sampling of initial phase-space conditions.

The probability for sampling the phase-space point (qi, pi) is proportional
to |<qi,pi,Gamma_i|q0,p0,Gamma_0>|^2. The singular covariance is factorised
through eigendecompositions of Gamma_i + Gamma_0 (momentum block) and
Gamma_i [Gamma_i+Gamma_0]^{-1} Gamma_0 (position block); zero-frequency modes
are excluded from sampling and all determinants are pseudo-determinants over
the non-zero subspace. Capability parity with reference
propagators.py:445-578, with two TPU-native changes:

* the factorisation runs once on the host (ranks are static);
* randomness uses explicit `jax.random` keys threaded per batch instead of a
  global torch seed, so independent ensemble shards draw independent streams
  by construction.
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp

from semiclassical_tpu import linalg
from semiclassical_tpu.pytree import pytree_dataclass

logger = logging.getLogger(__name__)

__all__ = ["SamplingParams", "sample_initial_conditions"]


@pytree_dataclass(meta=("dim", "rank"))
class SamplingParams:
    """Host-precomputed factorisation of the sampling distribution.

    The inverse of the (possibly singular) covariance matrix is
    cov^{-1} = Lz Lz^T with Lz = blockdiag(Lq, Lp); sampling transforms
    standard normals x via z = z0 + (Lz^{-1})^T x
    (reference propagators.py:493-555).
    """

    z0: jnp.ndarray       # (2 d,)   phase-space center (q0, p0)
    iLz: jnp.ndarray      # (2 rank, 2 d)  pseudo-inverse Lz^{-1}
    log_detLz: jnp.ndarray  # () f64  log pseudo-determinant of Lz
    U: jnp.ndarray        # (d, rank) non-zero subspace of Gamma_i + Gamma_0
    iGi0: jnp.ndarray     # (d, d)   pseudo-inverse of Gamma_i + Gamma_0
    dim: int
    rank: int

    @staticmethod
    def create(q0, p0, Gamma_0, Gamma_i, dtype=jnp.float64):
        q0 = np.asarray(q0, dtype=np.float64)
        p0 = np.asarray(p0, dtype=np.float64)
        G0 = np.asarray(Gamma_0, dtype=np.float64)
        Gi = np.asarray(Gamma_i, dtype=np.float64)
        assert G0.shape == Gi.shape, (
            "width parameter matrix Gamma_0 has wrong dimensions"
        )
        assert linalg.is_symmetric_non_negative(G0), (
            "Gamma_0 has to be symmetric and positive semi-definite."
        )
        d = q0.shape[0]

        Gi0 = G0 + Gi
        wp, Vp = linalg.sym_eigh(Gi0)
        nzp = wp > linalg.ZERO
        U = Vp[:, nzp]
        iGi0 = np.einsum("ij,j,kj->ik", Vp[:, nzp], 1.0 / wp[nzp], Vp[:, nzp])
        # 2 [Gi+G0]^{-1} = Lp Lp^T; pseudo-inverse Lp^{-1}
        iLp = np.einsum("i,ji->ij", np.sqrt(wp[nzp] / 2.0), Vp[:, nzp])

        # 2 Gi [Gi+G0]^{-1} G0 = Lq Lq^T; pseudo-inverse Lq^{-1}
        wq, Vq = linalg.sym_eigh(Gi @ iGi0 @ G0)
        nzq = wq > linalg.ZERO
        iLq = np.einsum("i,ji->ij", 1.0 / np.sqrt(2.0 * wq[nzq]), Vq[:, nzq])

        assert np.count_nonzero(nzp) == np.count_nonzero(nzq), (
            "number of non-zero modes for sampling of positions and momenta "
            "have to be the same"
        )
        rank = int(np.count_nonzero(nzp))

        # blockdiag pseudo-inverse and log pseudo-determinant of Lz — kept
        # in log space: the product of per-mode ratios under/overflows the
        # trajectory dtype for Gamma_i != Gamma_0 in many dimensions
        iLz = np.zeros((2 * rank, 2 * d))
        iLz[:rank, :d] = iLq
        iLz[rank:, d:] = iLp
        log_detLz = float(np.sum(
            np.log(2.0) + 0.5 * (np.log(wq[nzq]) - np.log(wp[nzp]))))

        return SamplingParams(
            z0=jnp.asarray(np.concatenate([q0, p0]), dtype=dtype),
            iLz=jnp.asarray(iLz, dtype=dtype),
            log_detLz=jnp.asarray(log_detLz, dtype=jnp.float64),
            U=jnp.asarray(U, dtype=dtype),
            iGi0=jnp.asarray(iGi0, dtype=dtype),
            dim=d,
            rank=rank,
        )


def sample_initial_conditions(params: SamplingParams, key, ntraj: int):
    """Draw `ntraj` initial phase-space points and their sampling densities.

    Returns
    -------
    q : (ntraj, d) initial positions
    p : (ntraj, d) initial momenta
    log_prob : (ntraj,) f64  log of the sampling density log P(qi, pi)

    The density keeps the reference's 1/(2 pi)^dim convention (full dim, not
    rank) because the same factor appears in the phase-space volume element
    of every observable and cancels (reference propagators.py:552-566).

    The density is returned in *log* space: in many dimensions P spans
    hundreds of orders of magnitude (the reference's linear-scale P,
    propagators.py:555, silently under/overflows beyond ~150 dimensions,
    and TPU float64 cannot be trusted at extreme ranges), while log P stays
    O(100) in every precision.
    """
    d = params.dim
    x = jax.random.normal(key, (ntraj, 2 * params.rank),
                          dtype=params.iLz.dtype)
    z = params.z0[None, :] + x @ params.iLz                 # (n, 2 d)
    q, p = z[:, :d], z[:, d:]
    x64 = x.astype(jnp.float64)
    log_prob = (params.log_detLz
                - d * np.log(2.0 * np.pi)
                - 0.5 * jnp.sum(x64 * x64, axis=1))
    return q, p, log_prob
