"""Step-cost attribution for the PRODUCTION bench path (continuous-rate
chunkwise ensemble sweep, nc=24 -> 1095 rxns / B=64).

The torture-config attribution (attrib_step_cost.py) measures the raw
vmapped BDF step at ~2.2 ms/step; the production bench runs ~6.4 ms/step.
This script decomposes the gap by re-running the ACTUAL EnsembleProblem
program under controlled variants: chunk dispatch mode, rate formalism,
save density, and linear-solve flavour.

Run on TPU: python scripts/attrib_production.py [variant ...]
(no args = all variants; each variant is timed on its 2nd run, after the
program is compiled and cached in /root/repo/.jax_cache).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

import kinetica_tpu  # noqa: F401  (enables x64)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.parallel.batching import EnsembleProblem
from kinetica_tpu.solving.methods import VariableODESolve
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

NC = int(os.environ.get("KINETICA_BENCH_NC", "24"))
B = int(os.environ.get("KINETICA_BENCH_BATCH", "64"))
TF = 14.0


def run(name, chunk_mode="host", rate_mode="continuous", chunkstep=0.5,
        save_interval=None, linsolve="auto", ts_update=0.02,
        chunks_per_dispatch=None, jac_policy="lazy"):
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    rates = np.linspace(40.0, 60.0, B)
    conditions_list = [
        ConditionSet({"T": LinearGradientProfile(
            rate=float(r), X_start=500.0, X_end=500.0 + float(r) * TF)},
            **({"ts_update": ts_update} if rate_mode == "discrete" else {}))
        for r in rates]
    pars = ODESimulationParams(
        tspan=(0.0, TF), u0={f"C{NC}": 1.0},
        solve_chunks=True, solve_chunkstep=chunkstep,
        low_k_cutoff="none", abstol=1e-10, reltol=1e-8,
        linsolve=linsolve, progress=False, jac_policy=jac_policy,
        **({"save_interval": save_interval} if save_interval else {}),
        **({"chunks_per_dispatch": chunks_per_dispatch}
           if chunks_per_dispatch else {}))
    method = VariableODESolve(pars, conditions_list[0], calc)
    problem = EnsembleProblem(method, sd, rd, rate_mode=rate_mode,
                              chunk_mode=chunk_mode)
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conditions_list)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conditions_list)
    dt = time.perf_counter() - t0
    ok = ens.success
    steps = np.asarray(ens.stats.get("n_steps", [0]))
    smax, smed = int(steps.max()), int(np.median(steps))
    print(f"{name:42s} {dt/B*1e3:7.1f} ms/profile  total={dt:6.2f}s "
          f"steps max={smax:5d} med={smed:5d}  ms/step={dt*1e3/smax:5.2f} "
          f"ok={ok} (warm+compile {warm:.0f}s)", flush=True)
    return ens


VARIANTS = {
    "production(host,cont,0.5)": dict(),
    "group(cpd=7)": dict(chunk_mode="group", chunks_per_dispatch=7),
    "group(cpd=28)": dict(chunk_mode="group", chunks_per_dispatch=28),
    "scan": dict(chunk_mode="scan"),
    "discrete(ts=0.02)": dict(rate_mode="discrete"),
    # k held per-chunk (28 stops): step count lands close to continuous,
    # so the ms/step delta vs group(cpd=28) isolates the per-attempt
    # continuous Arrhenius evaluation (emulated-f64 exp over nr)
    "discrete(ts=0.5,group)": dict(rate_mode="discrete", ts_update=0.5,
                                   chunk_mode="group",
                                   chunks_per_dispatch=28),
    "chunkstep=1.0": dict(chunkstep=1.0, save_interval=1.0),
    "chunkstep=2.0": dict(chunkstep=2.0, save_interval=2.0),
    "inv_fused": dict(linsolve="inv_fused"),
    # whole horizon in ONE while_loop with per-lane chunk transitions:
    # pays max_lane(total steps) sync iterations instead of
    # sum_chunks(max_lane steps) — the 1.49x straggler rotation measured
    # by attrib_sync_steps.py
    "async": dict(chunk_mode="async"),
    # at B=64 the lazy gates fire nearly every iteration collectively
    # (any-lane probability ~1), so "always" may cost ~nothing while
    # avoiding stale-J Newton retries
    "async(jac=always)": dict(chunk_mode="async", jac_policy="always"),
    "async(chunkstep=2.0)": dict(chunk_mode="async", chunkstep=2.0,
                                 save_interval=2.0),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            run(name, **VARIANTS[name])
        except Exception as exc:
            print(f"{name:42s} FAILED: {type(exc).__name__}: {exc}",
                  flush=True)


if __name__ == "__main__":
    main()
