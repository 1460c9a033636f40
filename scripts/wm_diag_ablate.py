# coding: utf-8
"""Phase-level TPU timing of the WM diag (per-mode 2x2) fast path.

    python scripts/wm_diag_ablate.py --ntraj 524288 --nt 20

Same methodology as wm_ablate.py: each phase runs nt times inside one
jitted lax.scan on the genuinely rk4-evolved state (static states let XLA
hoist everything); phase cost = row minus previous row.
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
    ap.add_argument("--ntraj", type=int, default=524288)
    ap.add_argument("--nt", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--traj", default="float64",
                    choices=["float64", "comp32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from semiclassical_tpu.potentials import MorsePotential
    from semiclassical_tpu.propagation import WaltonManolopoulosPropagator
    from semiclassical_tpu.propagation.eom import rk4_step
    from semiclassical_tpu.propagation.hk import hk_prefactor_det
    from semiclassical_tpu.propagation.wm import (_wm_diag_core,
                                                  wm_scan_derived,
                                                  wm_scan_observables)

    rng = np.random.default_rng(42)
    d = 60
    omega = rng.uniform(200.0, 3000.0, size=d) / 219474.63
    S = rng.uniform(0.01, 0.3, size=d)
    nac = rng.uniform(-1.0, 1.0, size=d)
    chi = np.full(d, 0.02)
    pot = MorsePotential.create(omega, chi, nac, dtype=jnp.float64)
    # match the CLI's mixed-mode cast (f32 PES transcendentals)
    pot = jax.tree.map(lambda x: x.astype(jnp.float32), pot)
    dQ = np.sqrt(2.0 * S / omega)
    Gamma = np.diag(omega)

    traj_dtype = jnp.float64 if args.traj == "float64" else "comp32"
    prop = WaltonManolopoulosPropagator(Gamma, Gamma, 10000.0, 10000.0,
                                        dtype=jnp.float32,
                                        traj_dtype=traj_dtype)
    prop.initial_conditions(dQ, np.zeros(d), Gamma, ntraj=args.ntraj, key=0,
                            potential=pot)
    params, bc, state0 = prop.params, prop._bc, prop.state
    assert params.scan_diag and state0.diag_monodromy
    nt = args.nt

    def scan_time(name, body, base_ms=0.0):
        @jax.jit
        def run(params, bc, state):
            def step(carry, i):
                st, acc = carry
                out = jnp.sum(body(params, bc, st))
                st, _en = rk4_step(st, pot, 0.25)
                return (st, acc + out), None
            (st, acc), _ = lax.scan(
                step, (state, jnp.float32(0.0)),
                jnp.arange(nt, dtype=state.q.dtype))
            return acc

        acc = run(params, bc, state0)
        _ = np.asarray(acc)
        ts = []
        for _i in range(args.reps):
            t0 = time.time()
            acc = run(params, bc, state0)
            _ = np.asarray(acc)
            ts.append(time.time() - t0)
        ms = 1e3 * min(ts) / nt - base_ms
        print(json.dumps({"phase": name, "ms_per_step": round(ms, 2)}),
              flush=True)
        return ms

    def core_body(p, b, s):
        detA, detM, y1, y2, iM = _wm_diag_core(p, s)
        return (jnp.abs(detA) + jnp.abs(detM)
                + jnp.abs(jnp.sum(y1 + y2 + iM, axis=1))).astype(jnp.float32)

    def derived_body(p, b, s):
        sd = wm_scan_derived(p, b, s, pot)
        return (jnp.abs(sd.detA) + jnp.abs(sd.gamma)
                + jnp.abs(sd.kfac)).astype(jnp.float32)

    def full_body(p, b, s):
        sd = wm_scan_derived(p, b, s, pot)
        ones = jnp.ones(s.q.shape[0], dtype=p.hk.cdtype)
        sg = jnp.ones(s.q.shape[0], dtype=p.Gt.dtype)
        ca, ki = wm_scan_observables(p, b, s, sd, ones, sg, sg)
        return jnp.abs(ca).astype(jnp.float32)

    base = scan_time("rk4", lambda p, b, s: jnp.float32(0.0))
    scan_time("hk_prefactor_det", lambda p, b, s: jnp.sum(
        jnp.abs(hk_prefactor_det(p.hk, s)).astype(jnp.float32)), base)
    scan_time("diag_core", core_body, base)
    scan_time("derived", derived_body, base)
    scan_time("derived+obs", full_body, base)


if __name__ == "__main__":
    main()
