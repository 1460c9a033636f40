# coding: utf-8
"""Standalone TPU timing of the fused det+inv paths.

    python scripts/detinv_bench.py --n 8192 --m 120 --impl lanes
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--m", type=int, default=120)
    ap.add_argument("--impl", default="lanes")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_enable_x64", True)

    from semiclassical_tpu import linalg
    linalg.set_linalg_impl(args.impl)

    rng = np.random.default_rng(0)
    n, m = args.n, args.m
    A = (np.eye(m) + 0.3 * (rng.standard_normal((n, m, m))
                            + 1j * rng.standard_normal((n, m, m)))
         / np.sqrt(m)).astype(np.complex64)
    Ar = jnp.asarray(A.real)
    Ai = jnp.asarray(A.imag)

    @jax.jit
    def run(Ar, Ai):
        det, inv = linalg.batched_det_inv(jax.lax.complex(Ar, Ai))
        return det.real, jnp.sum(inv.real)

    t0 = time.time()
    d, s = run(Ar, Ai)
    _ = np.asarray(d)
    compile_s = time.time() - t0

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        d, s = run(Ar, Ai)
        _ = np.asarray(d), np.asarray(s)
        times.append(time.time() - t0)

    # accuracy spot check on a slice
    dn = np.linalg.det(A[:64].astype(np.complex128))
    err = np.abs(np.asarray(d[:64]) - dn.real).max() / np.abs(dn).max()

    print(json.dumps({
        "bench": "det_inv", "n": n, "m": m, "impl": args.impl,
        "ms": round(1e3 * min(times), 2), "compile_s": round(compile_s, 1),
        "det_rel_err_re": float(err),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
