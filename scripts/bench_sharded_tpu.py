"""Compile + run the model-sharded shard_map program on the REAL chip.

VERDICT r3 #3: all model-axis evidence so far ran on the virtual CPU
mesh with Pallas in interpret mode; Mosaic-vs-interpret divergence is a
documented hazard (ops/dd.py pair-guard, ops/pallas_linalg i64-capture
constraints). This script runs the sharded ensemble program on the
physical chip with a (batch=1, model=1) mesh — degenerate in layout but
NOT in code path: the shard_map wrapping, per-shard Pallas kernel
calls, reaction-block padding and psum contractions all lower through
the hardware (Mosaic) compiler — and asserts equality with the
unsharded solve on the same chip.

Also reachable through the driver bench: KINETICA_BENCH_SHARDED=1
python bench.py adds the same check to the device phase.

Usage: python scripts/bench_sharded_tpu.py  (runs on whatever backend
jax initialises; pass --cpu to force the CPU interpret path for a
sanity run). Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(tf=3.0, B=8):
    import jax

    from kinetica_tpu.calculators.builtin import (
        PrecalculatedArrheniusCalculator)
    from kinetica_tpu.conditions.condition_set import ConditionSet
    from kinetica_tpu.conditions.profiles import LinearGradientProfile
    from kinetica_tpu.parallel.batching import EnsembleProblem
    from kinetica_tpu.parallel.sharding import make_mesh
    from kinetica_tpu.solving.methods import VariableODESolve
    from kinetica_tpu.solving.params import ODESimulationParams
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

    platform = jax.devices()[0].platform
    sd, rd, Ea, A = synthetic_pyrolysis_network(8)
    mkcalc = lambda: PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    rates = np.linspace(50.0, 70.0, B)
    conds = [ConditionSet({"T": LinearGradientProfile(
        rate=float(r), X_start=500.0, X_end=500.0 + float(r) * tf)},
        ts_update=0.5) for r in rates]
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"C8": 1.0},
                               solve_chunks=True, solve_chunkstep=1.0,
                               low_k_cutoff="none", rhs_contraction="fused")

    mesh = make_mesh(1, axis_names=("batch", "model"), shape=(1, 1))
    t0 = time.perf_counter()
    prob_s = EnsembleProblem(VariableODESolve(pars, conds[0], mkcalc()),
                             sd, rd, mesh=mesh)
    ens_s = prob_s.solve(conditions_list=conds, sharding=mesh)
    sharded_dt = time.perf_counter() - t0

    prob_p = EnsembleProblem(VariableODESolve(pars, conds[0], mkcalc()),
                             sd, rd)
    ens_p = prob_p.solve(conditions_list=conds)
    assert ens_s.success and ens_p.success, (
        ens_s.retcodes[:4], ens_p.retcodes[:4])
    diff = float(np.max(np.abs(np.asarray(ens_s.u) - np.asarray(ens_p.u))))
    rec = {
        "platform": platform,
        "crn": f"{rd.nr}rxn/{sd.n}sp",
        "batch": B,
        "mesh": "(batch=1, model=1) shard_map + Mosaic Pallas",
        "sharded_compile_and_run_s": round(sharded_dt, 1),
        "max_abs_diff_vs_unsharded": diff,
        "ok": bool(diff < 1e-4),
    }
    print(json.dumps(rec), flush=True)
    assert rec["ok"], f"sharded-vs-unsharded diff too large: {diff}"
    return rec


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import kinetica_tpu  # noqa: F401  (x64)
    run()
