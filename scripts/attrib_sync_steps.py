"""Straggler attribution: synchronous iteration count of the batched sweep.

A vmapped ``while_loop`` steps every lane until the SLOWEST lane of that
chunk finishes, so the device executes sum_chunks(max_lane steps) step
iterations — which can exceed max_lane(sum_chunks steps) whenever the
slowest lane rotates between chunks. This script measures both for the
production bench config, i.e. how much of the apparent ms/step gap vs the
single-chunk torture config is straggler rotation rather than per-step cost.

Run (CPU is fine — step counts are platform-independent):
    python scripts/attrib_sync_steps.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import kinetica_tpu  # noqa: F401  (enables x64)
import jax

if os.environ.get("KINETICA_ATTRIB_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
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


def main():
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    rates = np.linspace(40.0, 60.0, B)
    conditions_list = [
        ConditionSet({"T": LinearGradientProfile(
            rate=float(r), X_start=500.0, X_end=500.0 + float(r) * TF)})
        for r in rates]
    pars = ODESimulationParams(
        tspan=(0.0, TF), u0={f"C{NC}": 1.0},
        solve_chunks=True, solve_chunkstep=0.5,
        low_k_cutoff="none", abstol=1e-10, reltol=1e-8, progress=False)
    method = VariableODESolve(pars, conditions_list[0], calc)
    # host mode dispatches one call per chunk -> per-chunk step counts
    problem = EnsembleProblem(method, sd, rd, rate_mode="continuous",
                              chunk_mode="host")

    per_chunk = []  # (n_chunks, B) accepted+rejected step counts
    orig = problem._chunk_fn

    def spy(*a, **kw):
        out = orig(*a, **kw)
        per_chunk.append(np.asarray(out[5]))
        return out

    problem._chunk_fn = spy
    ens = problem.solve(conditions_list=conditions_list)
    assert ens.success
    steps = np.stack(per_chunk)          # (n_chunks, B)
    per_lane_total = steps.sum(axis=0)   # (B,)
    sync_iters = int(steps.max(axis=1).sum())
    print(f"lanes: max total={per_lane_total.max()} "
          f"median total={int(np.median(per_lane_total))}")
    print(f"synchronous iterations (sum of per-chunk max): {sync_iters}")
    print(f"straggler inflation vs max-lane total: "
          f"{sync_iters / per_lane_total.max():.3f}x")
    print(f"straggler inflation vs median lane: "
          f"{sync_iters / np.median(per_lane_total):.3f}x")


if __name__ == "__main__":
    main()
