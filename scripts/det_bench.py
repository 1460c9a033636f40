# coding: utf-8
"""Micro-benchmark + cross-check of batched complex determinant backends on
the (n, r, r) shapes of the HK prefactor hot loop.

    python scripts/det_bench.py --impl schur|lu|pallas --ntraj 32768 --r 60

Times `iters` back-to-back determinant evaluations of a realistic,
well-conditioned complex batch (identity + smooth perturbation — the
prefactor matrix is the identity at t = 0) and checks the result against a
float64 LAPACK evaluation on the host.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(n, r, seed=0):
    """Well-conditioned complex batch resembling the evolving prefactor
    matrix: I + 0.3 * (smooth complex perturbation)."""
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((n, r, r)) + 1j * rng.standard_normal((n, r, r)))
    A = np.eye(r)[None] + 0.3 * A / np.sqrt(r)
    return A.astype(np.complex128)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="schur",
                    choices=["schur", "lu", "pallas", "lanes", "xla", "peel",
                             "peel8", "peel15", "peel20"])
    ap.add_argument("--ntraj", type=int, default=32768)
    ap.add_argument("--r", type=int, default=60)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from semiclassical_tpu import linalg

    A_host = make_batch(args.ntraj, args.r)
    det_ref = np.linalg.det(A_host[:256])

    Are = jnp.asarray(A_host.real, jnp.float32)
    Aim = jnp.asarray(A_host.imag, jnp.float32)

    if args.impl == "schur":
        fn = lambda re, im: linalg._det_schur(jax.lax.complex(re, im))
    elif args.impl == "lu":
        fn = lambda re, im: linalg._det_jax(jax.lax.complex(re, im))
    elif args.impl == "xla":
        fn = lambda re, im: jnp.linalg.det(jax.lax.complex(re, im))
    elif args.impl == "lanes":
        from semiclassical_tpu.ops import pallas_batched_det_lanes
        fn = lambda re, im: pallas_batched_det_lanes(jax.lax.complex(re, im))
    elif args.impl.startswith("peel"):
        b = int(args.impl[4:]) if args.impl != "peel" else 12
        fn = lambda re, im: linalg._det_peel(jax.lax.complex(re, im), b=b)
    else:
        from semiclassical_tpu.ops import pallas_batched_det
        fn = lambda re, im: pallas_batched_det(jax.lax.complex(re, im))

    @jax.jit
    def many(re, im):
        # data-dependent chain so the loop can't be hoisted/deduped
        def body(k, carry):
            re_, im_, acc = carry
            d = fn(re_, im_)
            scale = (jnp.abs(d[0]) * 1e-20).astype(jnp.float32)
            return re_ + scale, im_, acc + d
        re_, im_, acc = jax.lax.fori_loop(
            0, args.iters, body,
            (re, im, jnp.zeros(re.shape[0], jnp.complex64)))
        return acc

    t0 = time.time()
    acc = jax.block_until_ready(many(Are, Aim))
    compile_s = time.time() - t0
    t0 = time.time()
    acc = jax.block_until_ready(many(Are, Aim))
    wall = time.time() - t0

    @jax.jit
    def fn_planes(re, im):
        d = fn(re, im)
        return jnp.real(d), jnp.imag(d)

    d_re, d_im = jax.block_until_ready(fn_planes(Are[:256], Aim[:256]))
    det1 = np.asarray(d_re) + 1j * np.asarray(d_im)
    rel = np.abs(det1 - det_ref) / np.abs(det_ref)

    print(json.dumps({
        "impl": args.impl, "ntraj": args.ntraj, "r": args.r,
        "ms_per_det": round(1e3 * wall / args.iters, 2),
        "rel_err_median": float(np.median(rel)),
        "rel_err_max": float(rel.max()),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
