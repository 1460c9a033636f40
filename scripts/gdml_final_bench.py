# coding: utf-8
"""GDML dynamics throughput matrix in ONE process (setup amortised).

    python scripts/gdml_final_bench.py

The per-invocation setup of gdml_dynamics_bench (minimize's host loop of
tunnel dispatches + IC compiles) costs minutes on the axon backend; this
script pays it once and then times the production scan for each
(ntraj, hessian_eval, taylor_every) combination. Prints one JSON line per
measurement.
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

REF_DATA = "/root/reference/tests/DATA"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=100)
    ap.add_argument("--configs", default=(
        "2048:taylor:1,2048:taylor:8,8192:taylor:1,8192:taylor:8,"
        "8192:taylor:16,512:taylor:8,2048:step:1"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from semiclassical_tpu.io.fchk import FormattedCheckpointFile
    from semiclassical_tpu.potentials import MolecularGDMLPotential, minimize
    from semiclassical_tpu.propagation import HermanKlukPropagator
    from semiclassical_tpu.propagation.hk import (_hk_scan_jit,
                                                  _hk_scan_micro_jit)
    from semiclassical_tpu.pytree import replace

    t_setup = time.time()
    model = np.load(os.path.join(
        REF_DATA, "GDML",
        "coumarin_forces_au-wB97XD_def2SVP-train200-sym1.npz"),
        allow_pickle=True)
    with open(os.path.join(REF_DATA, "Gaussian16", "coumarin_s1.fchk")) as f:
        exc = FormattedCheckpointFile(f)
    base_pot = MolecularGDMLPotential.create(
        model, exc, hess_dtype=jnp.float32, hessian_eval="taylor")
    x0, Gamma0, zpe = exc.vibrational_groundstate()
    base_pot = minimize(base_pot, jnp.asarray(x0))
    print(json.dumps({"setup_s": round(time.time() - t_setup, 1)}),
          flush=True)

    props = {}

    def get_prop(ntraj):
        if ntraj not in props:
            prop = HermanKlukPropagator(Gamma0, Gamma0, dtype=jnp.float32,
                                        traj_dtype=jnp.float64)
            prop.initial_conditions(x0, np.zeros_like(x0), Gamma0,
                                    ntraj=ntraj, key=0, potential=base_pot)
            props[ntraj] = prop
        return props[ntraj]

    for spec in args.configs.split(","):
        parts = spec.split(":")
        ntraj_s, mode, every_s = parts[:3]
        micro = int(parts[3]) if len(parts) > 3 else 0
        ntraj, every = int(ntraj_s), int(every_s)
        pot = replace(base_pot, hessian_eval=mode,
                      taylor_every=every if mode == "taylor" else 1)
        prop = get_prop(ntraj)

        if micro and ntraj % micro == 0 and ntraj > micro:
            k = ntraj // micro
            run = lambda: _hk_scan_micro_jit(
                prop.params, prop._bc, pot, prop.state,
                prop.trackers["prefactorC"],
                jnp.float64(0.0), jnp.float64(0.1), args.nt, k)
        else:
            run = lambda: _hk_scan_jit(
                prop.params, prop._bc, pot, prop.state,
                prop.trackers["prefactorC"],
                jnp.float64(0.0), jnp.float64(0.1), args.nt)

        t0 = time.time()
        carry, (cauto, kic, en) = run()
        c_host = np.asarray(jax.device_get(cauto.real))
        compile_s = time.time() - t0
        t0 = time.time()
        carry, (cauto, kic, en) = run()
        c_host = np.asarray(jax.device_get(cauto.real))
        wall = time.time() - t0
        assert np.isfinite(c_host).all()

        print(json.dumps({
            "bench": "gdml_hk_step", "ntraj": ntraj, "nt": args.nt,
            "hessian_eval": mode, "taylor_every": every, "micro": micro,
            "ms_per_step": round(1e3 * wall / args.nt, 2),
            "traj_steps_per_s": round(ntraj * args.nt / wall, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
