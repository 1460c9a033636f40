# coding: utf-8
"""Driver benchmark: three production throughput metrics in ONE process.

Prints one JSON line per metric, each shaped
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}
in the order: WM flagship, GDML frontier, HK flagship (the headline metric
prints LAST so a last-line parser records it).

1. `wm_as60`  — Walton-Manolopoulos propagator, 60-mode anharmonic AS,
   comp32 trajectories, device-side micro-batching (the production WM
   configuration, BASELINE.md round-4 table).
2. `gdml_coumarin` — sGDML-driven HK dynamics on the coumarin model
   (51 cartesians), mixed precision (f64 E/grad + f32 Hessian),
   `hessian_eval="taylor"` windows with the per-window monodromy map —
   the round-4 frontier configuration. Skipped (with a JSON notice) when
   neither the reference checkout nor the vendored fixture tree provides
   the trained model.
3. `hk_as60`  — Herman-Kluk propagator, 60-mode anharmonic AS, comp32,
   at the 1M-trajectory single-chip optimum. The headline metric: one
   unit = advancing one trajectory (with its monodromy) through one RK4
   step AND accumulating both observables C(t), k~ic(t) — exactly the
   per-step work of the reference's dynamics loop (reference
   cli.py:401-436).

Baselines:
* torch reference on this machine's 1-core CPU at the identical 60-mode
  config: 213.4 traj-steps/s (BASELINE.md; the reference publishes no
  numbers of its own). Used for hk_as60 and — conservatively, the
  reference's WM step is strictly MORE work than its HK step — for
  wm_as60.
* the reference's only published perf claim: ~10,000 molecules/s for
  batched sGDML E+grad+Hessian "on a GPU" (reference
  gdml_predictor.py:51-54). At 4 PES evaluations per dynamics step that
  bounds its dynamics loop at ~2,500 traj-steps/s; used for
  gdml_coumarin.
"""

import gc
import json
import os
import sys

import numpy as np

TORCH_CPU_BASELINE = 213.4    # traj-steps/s, torch reference, 1-core CPU
GDML_GPU_BASELINE = 2500.0    # traj-steps/s bound implied by the
                              # reference's 10k molecules/s GPU headline

REPO = os.path.dirname(os.path.abspath(__file__))


def _gdml_fixture_dir():
    """Directory holding GDML/ and Gaussian16/ fixtures, or None."""
    cands = [os.environ.get("SEMI_REF_DATA"),
             "/root/reference/tests/DATA",
             os.path.join(REPO, "tests", "data", "refdata")]
    model_rel = os.path.join(
        "GDML", "coumarin_forces_au-wB97XD_def2SVP-train200-sym1.npz")
    for c in cands:
        if c and os.path.exists(os.path.join(c, model_rel)):
            return c
    return None


def _result(metric, value, unit, baseline, config, timer):
    return {
        "metric": metric,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(value / baseline, 2),
        "config": config,
        "phases": {k: round(v, 3) for k, v in timer.summary().items()},
    }


def wait_for_hbm(jax, gb=12, tries=8, wait_s=150):
    """Block until ~gb GB of device memory is allocatable (or give up).

    The remote device releases a finished process's allocations LAZILY
    (minutes) and holds leaked memory from crashed processes for longer
    (observed: ~1-2 h after repeated OOMs) — and every further OOM digs
    the hole deeper, so the worst possible strategy is to hammer it with
    retries. This gate costs one small program per probe and waits
    between probes; heavy benches only start once the device is healthy.
    """
    import time

    import jax.numpy as jnp

    for i in range(tries):
        try:
            a = jnp.zeros((gb * (1 << 28),), jnp.float32) + 1.0
            np.asarray(a[:1])
            del a
            gc.collect()
            return True
        except Exception:
            gc.collect()
            if i + 1 < tries:
                time.sleep(wait_s)
    return False


def _retry_hbm(jax, requested, floor, fn):
    """Run `fn(ntraj)` with at most ONE half-size fallback (see
    wait_for_hbm: repeated OOM retries make the device sicker, so the
    resilience lives in the pre-flight gate, not in hammering)."""
    import time

    try:
        return fn(requested)
    except Exception as exc:
        if "RESOURCE_EXHAUSTED" not in repr(exc) or requested // 2 < floor:
            raise
        gc.collect()
        jax.clear_caches()
        gc.collect()
        time.sleep(150)
        out = fn(requested // 2)
        out["config"]["requested_ntraj"] = requested
        out["config"]["note"] = ("batch halved: device HBM constrained "
                                 "(lazy release / leaked allocations)")
        return out


def bench_wm(jax, jnp, on_tpu):
    requested = int(os.environ.get("BENCH_WM_NTRAJ",
                                   "524288" if on_tpu else "2048"))
    return _retry_hbm(jax, requested, 65536,
                      lambda n: _bench_wm_at(jax, jnp, on_tpu, n))


def _bench_wm_at(jax, jnp, on_tpu, ntraj):
    from semiclassical_tpu.potentials import MorsePotential
    from semiclassical_tpu.profiling import PhaseTimer
    from semiclassical_tpu.propagation import WaltonManolopoulosPropagator

    timer = PhaseTimer()
    nt = int(os.environ.get("BENCH_WM_NT", "500" if on_tpu else "50"))
    micro = 8192 if on_tpu and ntraj > 8192 else None

    with timer.phase("sample"):
        rng = np.random.default_rng(42)
        d = 60
        omega = rng.uniform(200.0, 3000.0, size=d) / 219474.63
        S = rng.uniform(0.01, 0.3, size=d)
        nac = rng.uniform(-1.0, 1.0, size=d)
        chi = np.full(d, 0.02)
        if on_tpu:
            # algebra-dtype PES pack (the CLI does the same): the Morse
            # transcendentals must run native f32, not emulated f64
            pot = MorsePotential.create(omega, chi, nac, dtype=jnp.float32)
            prop = WaltonManolopoulosPropagator(
                np.diag(omega), np.diag(omega), 1e4, 1e4,
                dtype=jnp.float32, traj_dtype="comp32")
        else:
            pot = MorsePotential.create(omega, chi, nac)
            prop = WaltonManolopoulosPropagator(
                np.diag(omega), np.diag(omega), 1e4, 1e4)
        dQ = np.sqrt(2.0 * S / omega)
        prop.initial_conditions(dQ, np.zeros(d), np.diag(omega),
                                ntraj=ntraj, key=0, potential=pot)
    en0 = float(np.sum(0.5 * omega))
    dt = 0.25

    import copy
    snapshot = (prop.state, copy.copy(prop.trackers), prop.t)
    with timer.phase("compile"):
        prop.propagate(pot, dt, nt, energy0_es=en0, check_energy=False,
                       micro_batch=micro)
    prop.state, prop.trackers, prop.t = snapshot

    with timer.phase("scan"):
        cauto, kic = prop.propagate(pot, dt, nt, energy0_es=en0,
                                    check_energy=False, micro_batch=micro)
    with timer.phase("reduce"):
        assert np.isfinite(cauto).all() and np.isfinite(kic).all()

    value = timer.throughput(ntraj, nt, 1)
    return _result("wm_as60_traj_steps_per_sec_per_chip", value,
                   "traj-steps/s/chip", TORCH_CPU_BASELINE, {
              "ntraj": ntraj, "nt": nt, "dim": 60,
              "dtype": "comp32" if on_tpu else "float64",
              "micro_batch": micro,
              "device": str(jax.devices()[0]),
              "wall_s": round(timer.phases["scan"], 3),
              "baseline": "torch reference HK step rate on this CPU "
                          "(conservative: the reference WM step is heavier)",
          }, timer)


def bench_gdml(jax, jnp, on_tpu):
    data = _gdml_fixture_dir()
    if data is None:
        return {"metric": "gdml_coumarin_traj_steps_per_sec_per_chip",
                "skipped": "no sGDML fixture available"}

    from semiclassical_tpu.io.fchk import FormattedCheckpointFile
    from semiclassical_tpu.potentials import (MolecularGDMLPotential,
                                              minimize)
    from semiclassical_tpu.profiling import PhaseTimer
    from semiclassical_tpu.propagation import HermanKlukPropagator
    from semiclassical_tpu.pytree import replace

    timer = PhaseTimer()
    # round-4 frontier: taylor_every=32 windows + per-window monodromy map,
    # micro-batch 256 (BASELINE.md GDML table)
    ntraj = int(os.environ.get("BENCH_GDML_NTRAJ",
                               "32768" if on_tpu else "256"))
    nt = int(os.environ.get("BENCH_GDML_NT", "100" if on_tpu else "8"))
    every = 32
    micro = 256 if ntraj > 256 else None

    with timer.phase("sample"):
        model = np.load(os.path.join(
            data, "GDML",
            "coumarin_forces_au-wB97XD_def2SVP-train200-sym1.npz"),
            allow_pickle=True)
        with open(os.path.join(data, "Gaussian16", "coumarin_s1.fchk")) as f:
            exc = FormattedCheckpointFile(f)
        pot = MolecularGDMLPotential.create(
            model, exc, hess_dtype=jnp.float32, hessian_eval="taylor")
        pot = replace(pot, taylor_every=every)
        x0, Gamma0, zpe = exc.vibrational_groundstate()
        pot = minimize(pot, jnp.asarray(x0))
        prop = HermanKlukPropagator(Gamma0, Gamma0, dtype=jnp.float32,
                                    traj_dtype=jnp.float64)
        prop.initial_conditions(x0, np.zeros_like(x0), Gamma0,
                                ntraj=ntraj, key=0, potential=pot)
    dt = 0.1

    import copy
    snapshot = (prop.state, copy.copy(prop.trackers), prop.t)
    with timer.phase("compile"):
        prop.propagate(pot, dt, nt, energy0_es=0.0, check_energy=False,
                       micro_batch=micro)
    prop.state, prop.trackers, prop.t = snapshot

    with timer.phase("scan"):
        cauto, kic = prop.propagate(pot, dt, nt, energy0_es=0.0,
                                    check_energy=False, micro_batch=micro)
    with timer.phase("reduce"):
        assert np.isfinite(cauto).all() and np.isfinite(kic).all()

    value = timer.throughput(ntraj, nt, 1)
    return _result("gdml_coumarin_traj_steps_per_sec_per_chip", value,
                   "traj-steps/s/chip", GDML_GPU_BASELINE, {
              "ntraj": ntraj, "nt": nt, "n_cartesian": 51,
              "hessian_eval": "taylor", "taylor_every": every,
              "micro_batch": micro, "hess_dtype": "float32",
              "device": str(jax.devices()[0]),
              "wall_s": round(timer.phases["scan"], 3),
              "fixtures": data,
              "baseline": "reference's published ~10k molecules/s GPU "
                          "headline / 4 PES evals per step",
          }, timer)


def bench_hk(jax, jnp, on_tpu):
    # 1,048,576 trajectories is the measured single-chip throughput
    # optimum (2M exceeds the 16G HBM); see _retry_hbm for why failures
    # wait-and-retry before halving — the 524k/262k fallback rates are
    # within ~10-20% of the optimum and the config records the shape.
    requested = int(os.environ.get("BENCH_NTRAJ",
                                   "1048576" if on_tpu else "2048"))
    return _retry_hbm(jax, requested, 131072,
                      lambda n: _bench_hk_at(jax, jnp, on_tpu, n))


def _bench_hk_at(jax, jnp, on_tpu, ntraj):
    sys.path.insert(0, REPO)
    from __graft_entry__ import _as60_setup
    from semiclassical_tpu.profiling import PhaseTimer

    timer = PhaseTimer()
    # "comp32" = compensated-f32 trajectories (Neumaier residuals) — the
    # production TPU mode for HK on model potentials: tracks the mixed
    # mode (f64 trajectories) to 5e-7 over the full 2000-step horizon at
    # ~2x the speed (tests/test_comp32.py, BASELINE.md). BENCH_DTYPE
    # overrides ("mixed" = the f64-trajectory ablation).
    dtype_name = os.environ.get("BENCH_DTYPE",
                                "comp32" if on_tpu else "float64")
    # nt=500 in ONE ~7.5 s scan stays under the ~60 s tunnel watchdog
    # while amortizing the ~45 ms host round-trips
    nt = int(os.environ.get("BENCH_NT", "500" if on_tpu else "100"))

    with timer.phase("sample"):
        if dtype_name == "mixed":
            prop, pot = _as60_setup(ntraj=ntraj, dtype=jnp.float32,
                                    traj_dtype=jnp.float64)
        elif dtype_name == "comp32":
            prop, pot = _as60_setup(ntraj=ntraj, dtype=jnp.float32,
                                    traj_dtype="comp32")
        else:
            dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
            prop, pot = _as60_setup(ntraj=ntraj, dtype=dtype)
    en0 = 0.0
    dt = 0.25  # a.u.; stable for the stiffest 3000 cm^-1 mode

    import copy
    snapshot = (prop.state, copy.copy(prop.trackers), prop.t)
    with timer.phase("compile"):
        prop.propagate(pot, dt, nt, energy0_es=en0, check_energy=False)
    prop.state, prop.trackers, prop.t = snapshot

    with timer.phase("scan"):
        cauto, kic = prop.propagate(pot, dt, nt, energy0_es=en0,
                                    check_energy=False)
    with timer.phase("reduce"):
        assert np.isfinite(cauto).all() and np.isfinite(kic).all()

    value = timer.throughput(ntraj, nt, 1)
    return _result("hk_as60_traj_steps_per_sec_per_chip", value,
                   "traj-steps/s/chip", TORCH_CPU_BASELINE, {
              "ntraj": ntraj, "nt": nt, "dim": 60, "dtype": dtype_name,
              "device": str(jax.devices()[0]),
              "wall_s": round(timer.phases["scan"], 3),
              "compile_s": round(timer.phases["compile"], 1),
          }, timer)


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: remote TPU compiles cost 30-300 s each
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu and not wait_for_hbm(jax):
        print(json.dumps({"metric": "device_hbm_gate",
                          "warning": "device HBM still constrained after "
                                     "the pre-flight wait; benches may "
                                     "fall back to smaller batches"}),
              flush=True)

    only = os.environ.get("BENCH_ONLY", "")
    benches = {"wm": bench_wm, "gdml": bench_gdml, "hk": bench_hk}
    # EXECUTION order: the 1M-trajectory HK bench runs FIRST — it is the
    # memory-hungriest and even fully-freed WM/GDML leftovers (allocator
    # residue on the remote device) tipped it over HBM when it ran last.
    # PRINT order keeps the headline hk line LAST for last-line parsers.
    exec_order = ["hk", "wm", "gdml"]
    print_order = ["wm", "gdml", "hk"]
    results = {}
    for name in exec_order:
        if only and name != only:
            continue
        try:
            results[name] = benches[name](jax, jnp, on_tpu)
        except Exception as exc:
            results[name] = {"metric": f"{name}_bench_error",
                             "error": repr(exc)}
        # free every device buffer the bench left behind for the next one;
        # the persistent disk cache makes dropped executables cheap to
        # reload
        gc.collect()
        jax.clear_caches()
        gc.collect()
    for name in print_order:
        if results.get(name) is not None:
            print(json.dumps(results[name]), flush=True)
    if "error" in results.get("hk", {}):
        sys.exit(1)              # the headline metric must not fail quietly


if __name__ == "__main__":
    main()
