"""Single-chip throughput ceiling: batch-width sweep of the bench config.

VERDICT r3 #2: per-profile cost was flat from B=64 to B=256 (step cost
~linear in B), so batch width converts into throughput "up to HBM
limits" — an untested claim. This script locates the ceiling: for each
B it runs the production bench sweep (1095 rxns / 73 species variable-T
ramp, continuous-rate chunkwise async) twice (compile + timed), and
records profiles/sec/chip, ms/step and device memory stats.

Usage: python scripts/bench_bsweep.py [B ...]   (default 64..1024)
Appends one JSON line per B to scripts/bsweep_results.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RESULTS = os.path.join(REPO, "scripts", "bsweep_results.jsonl")

N_CARBONS = int(os.environ.get("KINETICA_BENCH_NC", "24"))
RTOL, ATOL = 1e-8, 1e-10


def build(batch):
    from kinetica_tpu.calculators.builtin import (
        PrecalculatedArrheniusCalculator)
    from kinetica_tpu.conditions.condition_set import ConditionSet
    from kinetica_tpu.conditions.profiles import LinearGradientProfile
    from kinetica_tpu.solving.params import ODESimulationParams
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

    sd, rd, Ea, A = synthetic_pyrolysis_network(N_CARBONS)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    tf = 14.0
    rates = np.linspace(40.0, 60.0, batch)
    conditions_list = [
        ConditionSet({"T": LinearGradientProfile(
            rate=float(r), X_start=500.0, X_end=500.0 + float(r) * tf)})
        for r in rates]
    pars = ODESimulationParams(
        tspan=(0.0, tf), u0={f"C{N_CARBONS}": 1.0},
        solve_chunks=True, solve_chunkstep=0.5,
        low_k_cutoff="none", abstol=ATOL, reltol=RTOL,
        linsolve=os.environ.get("KINETICA_BENCH_LINSOLVE", "auto"),
        lu_drift_tol=float(os.environ.get("KINETICA_BENCH_LU_DRIFT",
                                          "0.3")))
    return sd, rd, calc, conditions_list, pars


def mem_stats():
    import jax
    try:
        s = jax.local_devices()[0].memory_stats()
        return {"bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit")}
    except Exception:
        return {}


def run_batch(batch):
    import jax
    from kinetica_tpu.parallel.batching import EnsembleProblem
    from kinetica_tpu.solving.methods import VariableODESolve

    sd, rd, calc, conditions_list, pars = build(batch)
    method = VariableODESolve(pars, conditions_list[0], calc)
    problem = EnsembleProblem(
        method, sd, rd, rate_mode="continuous",
        chunk_mode=os.environ.get("KINETICA_BENCH_CHUNK_MODE", "auto"))
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conditions_list)
    compile_and_run = time.perf_counter() - t0
    assert ens.success, f"B={batch} sweep failed: {ens.retcodes[:4]}"
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conditions_list)
    sweep_dt = time.perf_counter() - t0
    steps = np.asarray(ens.stats.get("n_steps", []))
    steps_max = int(steps.max()) if steps.size else None
    rec = {
        "batch": batch,
        "crn": f"{rd.nr}rxn/{sd.n}sp",
        "platform": jax.devices()[0].platform,
        "sweep_s": round(sweep_dt, 3),
        "compile_s": round(compile_and_run - sweep_dt, 1),
        "per_profile_ms": round(sweep_dt * 1e3 / batch, 2),
        "profiles_per_sec": round(batch / sweep_dt, 1),
        "ms_per_step": round(sweep_dt * 1e3 / steps_max, 3) if steps_max
        else None,
        "steps_max": steps_max,
        "steps_median": int(np.median(steps)) if steps.size else None,
        "mem": mem_stats(),
        "linsolve": pars.linsolve,
        "chunk_mode": problem.chunk_mode,
    }
    with open(RESULTS, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512, 1024]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import kinetica_tpu  # noqa: F401  (x64)
    for b in batches:
        try:
            run_batch(b)
        except Exception as exc:
            rec = {"batch": b, "error": f"{type(exc).__name__}: {exc}"}
            with open(RESULTS, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
