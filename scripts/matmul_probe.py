# coding: utf-8
"""Probe: batched small matmuls on TPU — complex vs re/im-plane real forms.

The WM profile shows batched (n, 60, 60) complex matmuls running at
~1.5 TF/s. This times the same contraction as
  (a) native complex einsum
  (b) 4 real einsums on separate re/im planes
  (c) one real einsum on [re | im]-stacked operands (shared left operand)
  (d) same shapes in real f32 only (the ceiling)
inside a single jitted scan (per-call tunnel dispatch is ~25 ms).
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
    ap.add_argument("--m", type=int, default=60)
    ap.add_argument("--nt", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    n, m, nt = args.n, args.m, args.nt
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((n, m, m)), dtype=jnp.float32)
    xi = jnp.asarray(rng.standard_normal((n, m, m)), dtype=jnp.float32)
    yr = jnp.asarray(rng.standard_normal((n, m, m)), dtype=jnp.float32)
    yi = jnp.asarray(rng.standard_normal((n, m, m)), dtype=jnp.float32)

    flops_c = 8.0 * n * m * m * m * nt   # complex matmul = 4 real mm
    flops_r = 2.0 * n * m * m * m * nt

    def timeit(name, fn, ops, flops):
        run = jax.jit(fn)
        out = run(*ops)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _i in range(args.reps):
            t0 = time.time()
            out = run(*ops)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.time() - t0)
        dt = min(ts)
        print(json.dumps({"case": name, "ms": round(1e3 * dt / nt, 2),
                          "tflops": round(flops / dt / 1e12, 2)}), flush=True)

    def scan(body):
        def fn(*ops):
            def step(c, _):
                o = body(*[x + c for x in ops])
                return c + jnp.float32(1e-6), jnp.sum(o).astype(jnp.float32)
            _, outs = lax.scan(step, jnp.float32(0.0), None, length=nt)
            return jnp.sum(outs)
        return fn

    # (a) native complex — operands assembled ON DEVICE (complex
    # host->device transfers are banned by the TPU contract); the scan
    # perturbation `x + c` keeps working since c broadcasts into complex
    def cplx(ar, ai, br, bi):
        x = lax.complex(ar, ai)
        y = lax.complex(br, bi)
        z = jnp.einsum("nab,nbc->nac", x, y)
        return jnp.abs(z)

    timeit("complex_einsum", scan(cplx), (xr, xi, yr, yi), flops_c)

    # (b) 4 real einsums
    def planes(a, b, c, d):
        rr = jnp.einsum("nab,nbc->nac", a, c)
        ii = jnp.einsum("nab,nbc->nac", b, d)
        ri = jnp.einsum("nab,nbc->nac", a, d)
        ir = jnp.einsum("nab,nbc->nac", b, c)
        return jnp.abs(rr - ii) + jnp.abs(ri + ir)

    timeit("four_real_einsums", scan(planes), (xr, xi, yr, yi), flops_c)

    # (c) stacked: [xr xi] as (n, 2m, m) @ y planes as (n, m, 2m)
    xs = jnp.concatenate([xr, xi], axis=1)          # (n, 2m, m)
    ys = jnp.concatenate([yr, yi], axis=2)          # (n, m, 2m)

    def stacked(xs_, ys_):
        z = jnp.einsum("nab,nbc->nac", xs_, ys_)    # (n, 2m, 2m): all 4 prods
        rr = z[:, :m, :m]
        ii = z[:, m:, m:]
        ri = z[:, :m, m:]
        ir = z[:, m:, :m]
        return jnp.abs(rr - ii) + jnp.abs(ri + ir)

    timeit("stacked_real_einsum", scan(stacked), (xs, ys), flops_c)

    # (d) single real einsum — the ceiling
    def real1(x, y):
        return jnp.abs(jnp.einsum("nab,nbc->nac", x, y))

    timeit("one_real_einsum", scan(real1), (xr, yr), flops_r)

    # (d2) Gram form nia,nib->nab — the WM T-block / sym_blk shape
    def gram(x, y):
        return jnp.abs(jnp.einsum("nia,nib->nab", x, y))

    timeit("gram_real_einsum", scan(gram), (xr, yr), flops_r)

    # (e) big constant-weight matmul of the same total flops for reference
    W = jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.float32)

    def constw(x, W_):
        return jnp.abs(jnp.einsum("nab,bc->nac", x, W_))

    timeit("const_weight_real", scan(lambda x: constw(x, W)), (xr,), flops_r)

    # precision variants on the winner shapes
    for prec in ("default", "high"):
        def with_p(x, y, _p=prec):
            with jax.default_matmul_precision(_p):
                return real1(x, y)
        timeit(f"one_real_einsum@{prec}", scan(with_p), (xr, yr), flops_r)


if __name__ == "__main__":
    main()
