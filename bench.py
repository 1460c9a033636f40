# coding: utf-8
"""Benchmark: HK trajectory-step throughput on the 60-mode anharmonic AS model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The metric is trajectory-steps/sec/chip — one unit = advancing one
trajectory (with its 60x60 monodromy blocks) through one RK4 step *and*
accumulating both observables C(t), k~ic(t) for that step, i.e. exactly the
per-step work of the reference's dynamics loop (reference cli.py:401-436).

Baseline: the torch reference implementation run on this machine's CPU at
the identical configuration (d=60 Morse chi=0.02, HK, observables every
step) measures 213.4 trajectory-steps/sec (measured 2026-08-16 with
/tmp-style driver: ntraj=2000, nt=10, torch 2.x CPU with symeig/solve
shims; see BASELINE.md). The reference has no GPU available here and
publishes no numbers of its own (BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

TORCH_CPU_BASELINE = 213.4  # traj-steps/sec, reference implementation, CPU


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: remote TPU compiles cost 30-300 s each
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    # complex128 is not supported on TPU backends (the prefactor
    # determinants are complex) -> default to float32/complex64 on TPU,
    # float64 elsewhere; override with BENCH_DTYPE.
    on_tpu = jax.devices()[0].platform != "cpu"
    # "comp32" = compensated-f32 trajectories (Neumaier residuals) — the
    # production TPU mode for HK on model potentials: tracks the mixed
    # mode (f64 trajectories) to 5e-7 over the full 2000-step horizon at
    # ~2x the speed (tests/test_comp32.py, BASELINE.md). "mixed" remains
    # available via BENCH_DTYPE for the f64-trajectory ablation.
    dtype_name = os.environ.get("BENCH_DTYPE",
                                "comp32" if on_tpu else "float64")
    # 1,048,576 trajectories is the measured single-chip throughput optimum
    # in the comp32 mode (all-f32 state; 2M exceeds the 16G HBM by 9G)
    ntraj = int(os.environ.get("BENCH_NTRAJ",
                               "1048576" if on_tpu else "2048"))
    # 500 steps in ONE scan: a single ~7.5 s XLA execution (safely under
    # the ~60 s tunnel watchdog) that amortizes the ~45 ms-per-fetch
    # host round-trips of the axon backend — nt=100 leaves ~1.3 ms/step
    # (~9%) of tunnel overhead in the measurement
    nt = int(os.environ.get("BENCH_NT", "500" if on_tpu else "100"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _as60_setup
    from semiclassical_tpu.profiling import PhaseTimer

    # per-phase wall-clock accounting (SURVEY §5 tracing/profiling): the
    # phases block of the emitted JSON is machine-produced by PhaseTimer,
    # and the headline metric comes from its scan phase
    timer = PhaseTimer()

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
    dt = 0.25  # a.u.; stable for the stiffest 3000 cm^-1 mode (dt*w ~ 0.003)

    # warmup + compile with the SAME scan length (nt is a static argument —
    # warming up with a different nt would leave the real compile inside the
    # measured window)
    import copy
    snapshot = (prop.state, copy.copy(prop.trackers), prop.t)
    with timer.phase("compile"):
        cauto, kic = prop.propagate(pot, dt, nt, energy0_es=en0,
                                    check_energy=False)
    prop.state, prop.trackers, prop.t = snapshot

    with timer.phase("scan"):
        cauto, kic = prop.propagate(pot, dt, nt, energy0_es=en0,
                                    check_energy=False)

    with timer.phase("reduce"):
        assert np.isfinite(cauto).all() and np.isfinite(kic).all()

    nchips = 1  # single-chip benchmark
    value = timer.throughput(ntraj, nt, nchips)
    result = {
        "metric": "hk_as60_traj_steps_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "traj-steps/s/chip",
        "vs_baseline": round(value / TORCH_CPU_BASELINE, 2),
        "config": {
            "ntraj": ntraj, "nt": nt, "dim": 60, "dtype": dtype_name,
            "device": str(jax.devices()[0]),
            "wall_s": round(timer.phases["scan"], 3),
            "compile_s": round(timer.phases["compile"], 1),
        },
        "phases": {k: round(v, 3) for k, v in timer.summary().items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
