# coding: utf-8
"""Measure the Ozaki bf16-MXU path for the sGDML f64 E/grad contractions
(VERDICT r4 next #1) against the emulated-f64 baseline, one process.

    python scripts/gdml_ozaki_bench.py --ntraj 2048 --nt 50

Times (each inside one lax.scan = one tunnel dispatch):
  * order-1 E+grad eval, eg_mode in {f64, ozaki}
  * order-2 mixed eval (f32 Hessian), both modes
  * full HK dynamics step for hessian_eval in {stage, taylor} x both modes
plus the on-device accuracy twin (max |dE| between modes). Prints one
JSON line per measurement.
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


def fixture_dir():
    for c in ("/root/reference/tests/DATA",
              os.path.join(os.path.dirname(os.path.dirname(
                  os.path.abspath(__file__))), "tests", "data", "refdata")):
        if os.path.isdir(os.path.join(c, "GDML")):
            return c
    raise SystemExit("no GDML fixtures")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntraj", type=int, default=2048)
    ap.add_argument("--nt", type=int, default=50)
    ap.add_argument("--dyn", default="stage,taylor")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from semiclassical_tpu.gdml import GDMLParams, gdml_forward
    from semiclassical_tpu.io.fchk import FormattedCheckpointFile
    from semiclassical_tpu.potentials import MolecularGDMLPotential, minimize
    from semiclassical_tpu.propagation import HermanKlukPropagator
    from semiclassical_tpu.propagation.hk import _hk_scan_jit

    data = fixture_dir()
    model = np.load(os.path.join(
        data, "GDML",
        "coumarin_forces_au-wB97XD_def2SVP-train200-sym1.npz"),
        allow_pickle=True)
    with open(os.path.join(data, "Gaussian16", "coumarin_s1.fchk")) as f:
        exc = FormattedCheckpointFile(f)
    x0 = np.asarray(exc["Current cartesian coordinates"], dtype=np.float64)

    packs = {"f64": GDMLParams.from_npz(model),
             "ozaki": GDMLParams.from_npz(model, eg_mode="ozaki")}

    rng = np.random.default_rng(0)
    r0 = jnp.asarray(x0[None, :] + 0.02 * rng.standard_normal(
        (args.ntraj, x0.shape[0])), jnp.float64)

    out = {"bench": "gdml_ozaki", "ntraj": args.ntraj, "nt": args.nt,
           "device": None}

    def timed_scan(name, body, init, pack):
        # the pack flows as a jit ARGUMENT (closure-captured device
        # constants embed in the jaxpr — axon transfer limits + 100 s
        # MLIR conversions, CLAUDE.md)
        @jax.jit
        def run(c0, pk):
            c, _ = jax.lax.scan(lambda c, _: (body(c, pk), None), c0,
                                None, length=args.nt)
            return c

        c = run(init, pack)
        np.asarray(jax.tree_util.tree_leaves(c)[0])
        t0 = time.time()
        c = run(init, pack)
        np.asarray(jax.tree_util.tree_leaves(c)[0])
        out[name + "_ms"] = round(1e3 * (time.time() - t0) / args.nt, 3)

    # accuracy twin on device (packs as jit ARGS — closure-captured device
    # constants embed in the jaxpr and have hit axon transfer limits)
    e0 = jax.jit(gdml_forward, static_argnames=("order",))
    e = {mode: np.asarray(e0(p, r0[:64], order=0))
         for mode, p in packs.items()}
    out["max_dE_Ha"] = float(np.max(np.abs(e["ozaki"] - e["f64"])))

    def eval1(r, pk):
        v, g = gdml_forward(pk, r, order=1)
        return r + 1.0e-9 * g + 1.0e-12 * v[:, None]

    def eval2(r, pk):
        v, g, h = gdml_forward(pk, r, order=2, hess_dtype=jnp.float32)
        return (r + 1.0e-9 * g + 1.0e-12 * v[:, None]
                + 1.0e-12 * jnp.sum(h, axis=2).astype(r.dtype))

    for mode, p in packs.items():
        timed_scan(f"order1_{mode}", eval1, r0, p)
        timed_scan(f"order2_{mode}", eval2, r0, p)

    print(json.dumps(out), flush=True)

    # full dynamics twins
    x0j, Gamma0, zpe = exc.vibrational_groundstate()
    for hmode in args.dyn.split(","):
        row = {"bench": "gdml_ozaki_dyn", "hessian_eval": hmode,
               "ntraj": args.ntraj, "nt": args.nt}
        cs = {}
        for mode in ("f64", "ozaki"):
            pot = MolecularGDMLPotential.create(
                model, exc, hess_dtype=jnp.float32, hessian_eval=hmode,
                eg_mode=mode)
            pot = minimize(pot, jnp.asarray(x0j))
            prop = HermanKlukPropagator(Gamma0, Gamma0, dtype=jnp.float32,
                                        traj_dtype=jnp.float64)
            prop.initial_conditions(x0j, np.zeros_like(x0j), Gamma0,
                                    ntraj=args.ntraj, key=0, potential=pot)
            run = lambda: _hk_scan_jit(
                prop.params, prop._bc, pot, prop.state,
                prop.trackers["prefactorC"],
                jnp.float64(0.0), jnp.float64(0.1), args.nt)
            from semiclassical_tpu.linalg import from_device
            carry, (cauto, kic, en) = run()
            np.asarray(jax.device_get(cauto.real))
            t0 = time.time()
            carry, (cauto, kic, en) = run()
            c_host = from_device(cauto)   # complex fetch via real planes
            wall = time.time() - t0
            assert np.isfinite(c_host.real).all()
            cs[mode] = c_host
            row[f"{mode}_ms"] = round(1e3 * wall / args.nt, 3)
            row[f"{mode}_tsps"] = round(args.ntraj * args.nt / wall, 1)
        row["max_dC"] = float(np.max(np.abs(cs["ozaki"] - cs["f64"])))
        row["speedup"] = round(row["f64_ms"] / row["ozaki_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
