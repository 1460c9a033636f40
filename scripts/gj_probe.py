# coding: utf-8
"""Drill-down timing: GJ fused kernel vs det-only kernel vs unpack cost."""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_enable_x64", True)

from semiclassical_tpu.ops import (pallas_batched_det_inv_lanes,
                                   pallas_batched_det_lanes)

n, m = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (8192, 60)
rng = np.random.default_rng(0)
A = (np.eye(m) + 0.3 * (rng.standard_normal((n, m, m))
                        + 1j * rng.standard_normal((n, m, m)))
     / np.sqrt(m)).astype(np.complex64)
Ar, Ai = jnp.asarray(A.real), jnp.asarray(A.imag)


def timeit(f, *a):
    r = f(*a)
    _ = [np.asarray(x) for x in jax.tree.leaves(r)][0]
    ts = []
    for _i in range(3):
        t0 = time.time()
        r = f(*a)
        _ = [np.asarray(jnp.ravel(x)[0]) for x in jax.tree.leaves(r)]
        ts.append(time.time() - t0)
    return min(ts)


@jax.jit
def det_only(Ar, Ai):
    return pallas_batched_det_lanes(jax.lax.complex(Ar, Ai)).real


@jax.jit
def fused_det_consumed(Ar, Ai):
    det, inv = pallas_batched_det_inv_lanes(jax.lax.complex(Ar, Ai))
    return det.real


@jax.jit
def fused_all_consumed(Ar, Ai):
    det, inv = pallas_batched_det_inv_lanes(jax.lax.complex(Ar, Ai))
    return det.real, jnp.sum(inv.real), jnp.sum(inv.imag)


print(json.dumps({
    "n": n, "m": m,
    "det_only_ms": round(1e3 * timeit(det_only, Ar, Ai), 2),
    "fused_det_ms": round(1e3 * timeit(fused_det_consumed, Ar, Ai), 2),
    "fused_all_ms": round(1e3 * timeit(fused_all_consumed, Ar, Ai), 2),
}))
