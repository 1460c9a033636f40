# coding: utf-8
"""Pure-JAX sGDML force field with analytic batched Hessians.

Kernel-ridge regression with a Matern-5/2 kernel over inverse-distance
descriptors, symmetry permutations baked into expanded training tensors.
Capability parity with reference gdml_predictor.py:35-250 (energy, analytic
gradient, analytic Hessian with order-0/1/2 early exit), redesigned for TPU:

* no torch, no nn.Module — the model is an immutable pytree (`GDMLParams`)
  that can be closed over or passed into jit;
* the reference assembles the descriptor-curvature part of the Hessian with
  `index_put_(accumulate=True)` scatters into (B, 3N, 3N)
  (reference gdml_predictor.py:220-246). Scatters serialise badly on TPU;
  here the same accumulation is expressed as a dense contraction with the
  constant pair-incidence tensor W[d] = u_d u_d^T, u_d = e_{k(d)} - e_{l(d)}
  (a (D, N, N) einsum that lowers to MXU matmuls);
* the descriptor Jacobian is only materialised for order=2; the gradient
  path contracts it away analytically.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from semiclassical_tpu.pytree import pytree_dataclass

__all__ = ["GDMLParams", "gdml_forward"]


@pytree_dataclass(meta=("n_atoms", "eg_mode"))
class GDMLParams:
    """Trained sGDML model, permutation-expanded.

    Shapes: M = n_train * n_perms, D = N (N - 1) / 2 descriptor entries.

    `eg_mode` selects the arithmetic of the energy/gradient KRR
    contractions (which REQUIRE f64-level accuracy — the expanded alphas
    are ~1e11 and the M-sums cancel 1e5-1e7x, BASELINE.md):

    * "f64"   — plain f64 matmuls (XLA emulates them on the TPU VPU);
    * "ozaki" — error-free-sliced products on the native bf16 MXU
      (ops/ozaki.py): the constant operands are sliced once here
      (`eg_sl`), activations per call. Same ~1e-15 relative accuracy,
      MXU rate instead of the emulated-f64 path.
    """

    xs_train: jnp.ndarray    # (M, D)  training descriptors (expanded)
    Jx_alphas: jnp.ndarray   # (M, D)  regression coefficients (expanded)
    pair_k: jnp.ndarray      # (D,) int32  first atom of each descriptor pair
    pair_l: jnp.ndarray      # (D,) int32  second atom (k > l)
    incidence: jnp.ndarray   # (D, N)  u_d = e_k - e_l
    pair_outer: jnp.ndarray  # (D, N, N)  W_d = u_d u_d^T
    sig: jnp.ndarray         # () kernel length scale
    c: jnp.ndarray           # () energy offset
    std: jnp.ndarray         # () energy scale
    # host-presliced constant operands for eg_mode="ozaki":
    # ((xs_train.T parts, scale), (A.T parts, scale), (A parts, scale),
    #  (xs_train parts, scale)) — see gdml_forward
    eg_sl: tuple | None
    n_atoms: int
    eg_mode: str = "f64"

    @staticmethod
    def from_npz(model, dtype=jnp.float64, eg_mode="f64"):
        """Build from a trained sGDML model mapping (as saved by sgdml.train).

        Expects the same fields as the reference loader
        (gdml_predictor.py:57-84): 'sig', 'c', optional 'std', 'z', 'perms',
        'tril_perms_lin', 'R_desc' (D, n_train), 'R_d_desc_alpha'.
        """
        model = dict(model)
        sig = float(model["sig"])
        c = float(model["c"])
        std = float(model.get("std", 1.0))
        n_atoms = int(model["z"].shape[0])

        R_desc = np.asarray(model["R_desc"], dtype=np.float64)       # (D, M0)
        R_d_desc_alpha = np.asarray(
            np.array(model["R_d_desc_alpha"]), dtype=np.float64
        )                                                            # (M0, D)
        desc_siz = R_desc.shape[0]
        n_perms = int(model["perms"].shape[0])
        # tril_perms_lin holds, for each permutation, the linearised
        # permutation of descriptor entries
        perm_idxs = (
            np.asarray(model["tril_perms_lin"]).reshape(-1, n_perms).T
        )                                                            # (P, D*?)

        def expand(xs):  # (M0, D) -> (M0 * P, D)
            tiled = np.tile(xs, (1, n_perms))[:, perm_idxs.ravel()]
            return tiled.reshape(-1, desc_siz)

        xs_train = expand(R_desc.T)
        Jx_alphas = expand(R_d_desc_alpha)

        k, l = np.tril_indices(n_atoms, k=-1)
        incidence = np.zeros((desc_siz, n_atoms))
        incidence[np.arange(desc_siz), k] = 1.0
        incidence[np.arange(desc_siz), l] = -1.0
        pair_outer = incidence[:, :, None] * incidence[:, None, :]

        eg_sl = None
        if eg_mode == "ozaki":
            from semiclassical_tpu.ops.ozaki import TBITS, slice_f64_host
            M, D = xs_train.shape
            for K in (M, D):
                assert 2 * TBITS + int(np.ceil(np.log2(K))) + 2 <= 24, (
                    f"eg_mode='ozaki' needs contraction lengths <= 256 for "
                    f"exact f32 in-pass accumulation (got {K}); use "
                    "eg_mode='f64' or block the contraction")
            eg_sl = (slice_f64_host(xs_train.T, axis=0),   # gram: (D, M)
                     slice_f64_host(Jx_alphas.T, axis=0),  # XA:   (D, M)
                     slice_f64_host(Jx_alphas, axis=0),    # grad: (M, D)
                     slice_f64_host(xs_train, axis=0))     # grad: (M, D)

        return GDMLParams(
            xs_train=jnp.asarray(xs_train, dtype=dtype),
            Jx_alphas=jnp.asarray(Jx_alphas, dtype=dtype),
            pair_k=jnp.asarray(k, dtype=jnp.int32),
            pair_l=jnp.asarray(l, dtype=jnp.int32),
            incidence=jnp.asarray(incidence, dtype=dtype),
            pair_outer=jnp.asarray(pair_outer, dtype=dtype),
            sig=jnp.asarray(sig, dtype=dtype),
            c=jnp.asarray(c, dtype=dtype),
            std=jnp.asarray(std, dtype=dtype),
            eg_sl=eg_sl,
            n_atoms=n_atoms,
            eg_mode=eg_mode,
        )


def gdml_forward(params: GDMLParams, r: jnp.ndarray, order: int = 2,
                 hess_dtype=None):
    """Energy / gradient / Hessian for a batch of geometries.

    Parameters
    ----------
    params : GDMLParams
    r : (B, 3N) cartesian coordinates in bohr
    order : int (static)
        0 -> energy, 1 -> (energy, grad), 2 -> (energy, grad, hess)
    hess_dtype : optional dtype (static)
        precision of the second-derivative contractions (the O(B (3N)^2)
        dominant cost). The TPU mixed mode uses f64 energies/gradients —
        absolute energies are O(1e2) Ha and feed the action phase, where
        f32 cancellation is catastrophic — with an f32 Hessian, which only
        drives the f32 monodromy blocks and whose f32 error (~1e-4) sits
        well under the sGDML model error (~1e-3). f64 Hessians are ~137x
        slower on TPU (emulated f64, BASELINE.md).

    Returns
    -------
    energy (B,), grad (B, 3N), hess (B, 3N, 3N) in atomic units.
    """
    N = params.n_atoms
    B = r.shape[0]
    D = params.xs_train.shape[1]
    # compute at the parameter pack's precision: without the cast, f64
    # trajectory coordinates silently promote an f32 pack to the TPU's
    # emulated-f64 path
    r = r.astype(params.xs_train.dtype)
    r3 = r.reshape(B, N, 3)

    q = jnp.sqrt(5.0) / params.sig

    # pairwise differences only for the D lower-triangle pairs (the reference
    # builds the full (B, N, N, 3) tensor first, gdml_predictor.py:152-158)
    diffs = r3[:, params.pair_k, :] - r3[:, params.pair_l, :]   # (B, D, 3)
    dists = jnp.linalg.norm(diffs, axis=-1)                      # (B, D)
    xs = 1.0 / dists                                             # (B, D)

    # Everything linear in the descriptor differences xs - xs_train is
    # EXPANDED so no (B, M, D) tensor is ever materialised (the reference
    # carries one through the whole forward, gdml_predictor.py:159-197):
    # the kernel distances come from the Gram expansion
    # ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b and every contraction against
    # x_diffs splits into a (B, D) @ (D, M) matmul plus a constant — pure
    # MXU work with O(B M + B D) memory.
    A = params.Jx_alphas
    # "ozaki": the four cancellation-critical KRR contractions run as
    # error-free-sliced bf16 MXU passes (~1e-15 relative, ops/ozaki.py)
    # instead of VPU-emulated f64 matmuls; everything elementwise stays
    # f64. Only meaningful for an f64 parameter pack.
    ozaki = params.eg_mode == "ozaki" and params.eg_sl is not None \
        and params.xs_train.dtype == jnp.float64
    if ozaki:
        from semiclassical_tpu.ops.ozaki import matmul_sliced, slice_f64
        xs_parts, xs_scale = slice_f64(xs, axis=-1)

        def mm_xs(const_sl):                      # xs @ const, over D
            return matmul_sliced(xs_parts, xs_scale, *const_sl)

        def mm_M(a, const_sl):                    # a (B, M) @ const, over M
            a_parts, a_scale = slice_f64(a, axis=-1)
            return matmul_sliced(a_parts, a_scale, *const_sl)

    sq_b = jnp.sum(xs * xs, axis=1)                              # (B,)
    sq_t = jnp.sum(params.xs_train * params.xs_train, axis=1)    # (M,)
    if ozaki:
        gram = mm_xs(params.eg_sl[0])                            # (B, M)
    else:
        gram = xs @ params.xs_train.T                            # (B, M)
    # the floor keeps x_dists > 0 when the query IS a training geometry
    # (the kernel and its weights vanish there, but 1/x_dists appears in
    # the Hessian weights and sqrt'(0) would poison autodiff); 1e-10 is
    # ~9 orders below any physical descriptor distance
    x_dists = jnp.sqrt(jnp.maximum(
        sq_b[:, None] + sq_t[None, :] - 2.0 * gram,
        jnp.asarray(1e-20, dtype=gram.dtype)))                   # (B, M)

    tA = jnp.sum(params.xs_train * A, axis=1)                    # (M,) const
    if ozaki:
        XA = mm_xs(params.eg_sl[1]) - tA[None, :]                # (B, M)
    else:
        XA = xs @ A.T - tA[None, :]                              # (B, M)

    exp_fac = (1.0 / 3.0) * q**4 * jnp.exp(-q * x_dists)         # (B, M)
    mat52_base = exp_fac * (1.0 + q * x_dists) / q**2            # (B, M)

    energy = jnp.einsum("bm,bm->b", mat52_base, XA)
    energy = energy * params.std + params.c

    if order == 0:
        return energy

    # gradient in descriptor space: the x_diffs contraction expands into
    # a row-sum rescale of xs minus a (B, M) @ (M, D) matmul
    w = exp_fac * XA                                             # (B, M)
    if ozaki:
        grad_x = mm_M(mat52_base, params.eg_sl[2])
        grad_x = grad_x - (jnp.sum(w, axis=1)[:, None] * xs
                           - mm_M(w, params.eg_sl[3]))           # (B, D)
    else:
        grad_x = jnp.einsum("bm,md->bd", mat52_base, A)
        grad_x = grad_x - (jnp.sum(w, axis=1)[:, None] * xs
                           - w @ params.xs_train)                # (B, D)

    xs3 = xs**3
    # cartesian gradient without materialising the Jacobian:
    # jac[b, d, a, :] = -xs^3 diffs[b, d, :] U[d, a]
    g_pair = (grad_x * xs3)[:, :, None] * diffs                  # (B, D, 3)
    grad = -jnp.einsum("bdc,da->bac", g_pair, params.incidence)  # (B, N, 3)
    grad = grad.reshape(B, 3 * N) * params.std

    if order == 1:
        return energy, grad

    # second derivatives, optionally at reduced precision (see docstring):
    # every input of the O(B M (3N)) / O(B (3N)^2) contractions below is a
    # smooth O(1-1e2) quantity, so the cast loses nothing that the model
    # error has not already lost
    ht = jnp.dtype(hess_dtype) if hess_dtype is not None else r.dtype
    cast = lambda a: a.astype(ht)
    xs_h, xs3_h, diffs_h = cast(xs), cast(xs3), cast(diffs)
    A_h = cast(A)
    exp_fac_h, XA_h, grad_x_h = cast(exp_fac), cast(XA), cast(grad_x)
    incidence_h = cast(params.incidence)
    pair_outer_h = cast(params.pair_outer)

    # dense descriptor Jacobian (B, D, 3N), needed for second derivatives
    jac = -(xs3_h[:, :, None, None] * diffs_h[:, :, None, :]
            * incidence_h[None, :, :, None])                     # (B, D, N, 3)
    jac = jac.reshape(B, D, 3 * N)

    # The Hessian weights divide by x_dists and contract the descriptor
    # differences against themselves: the q/x_dists weights are
    # near-singular close to training geometries and amplify cancellation
    # noise, so this block materialises the explicit differences at the
    # Hessian dtype — the O(B M D) build is negligible next to the
    # O(B M D 3N) contractions below, and the energy/gradient path above
    # stays matmul-only. (An expanded form XJ = xs.jac - xs_train @ jac
    # that avoids the (B, M, D) tensor was MEASURED to breach the 1e-4
    # mixed-Hessian gate — its f32 cancellation noise on XJ reaches
    # ~1e-4 relative; don't retry without a compensation scheme.)
    x_diffs_h = xs_h[:, None, :] - cast(params.xs_train)[None]   # (B, M, D)
    if params.xs_train.dtype == jnp.float64 and ht != jnp.float64:
        # mixed mode: the f64 Gram-expansion kernel distances computed for
        # the energy path are strictly MORE accurate than an explicit-
        # difference norm taken at ht — reuse them (same 1e-10 floor)
        x_dists_h = cast(x_dists)                                # (B, M)
    else:
        # a query exactly ON a training geometry has XJ = 0, and 0/0
        # would poison the whole row — keep the 1e-10 floor
        x_dists_h = jnp.maximum(jnp.linalg.norm(x_diffs_h, axis=-1),
                                jnp.asarray(1e-10, dtype=ht))    # (B, M)

    XJ = jnp.einsum("bmd,bdx->bmx", x_diffs_h, jac)              # (B, M, 3N)
    AJ = jnp.einsum("md,bdx->bmx", A_h, jac)                     # (B, M, 3N)
    JJ = jnp.einsum("bdx,bdy->bxy", jac, jac)                    # (B, 3N, 3N)

    w1 = exp_fac_h * XA_h * (cast(q) / x_dists_h)
    hess = jnp.einsum("bm,bmx,bmy->bxy", w1, XJ, XJ)
    hess = hess - jnp.sum(exp_fac_h * XA_h, axis=1)[:, None, None] * JJ
    cross = jnp.einsum("bm,bmx,bmy->bxy", exp_fac_h, AJ, XJ)
    hess = hess - cross - jnp.swapaxes(cross, 1, 2)

    # descriptor-curvature corrections, scatter-free:
    #   h1[b, d, u, v] contributes with sign pattern W_d = u_d u_d^T
    #   (replaces index_put_(accumulate=True), gdml_predictor.py:220-246)
    h1 = (3.0 * (grad_x_h * xs_h**5)[:, :, None, None]
          * diffs_h[:, :, :, None] * diffs_h[:, :, None, :])      # (B, D, 3, 3)
    h2 = -grad_x_h * xs3_h                                        # (B, D)

    corr1 = jnp.einsum("bduv,dac->baucv", h1, pair_outer_h)       # (B,N,3,N,3)
    corr2 = jnp.einsum("bd,dac->bac", h2, pair_outer_h)           # (B, N, N)
    corr = corr1 + corr2[:, :, None, :, None] * jnp.eye(3, dtype=ht)[None, None, :, None, :]

    hess = hess + corr.reshape(B, 3 * N, 3 * N)
    hess = hess * cast(params.std)

    return energy, grad, hess


gdml_forward_jit = jax.jit(gdml_forward,
                           static_argnames=("order", "hess_dtype"))
