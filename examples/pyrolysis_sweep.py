#!/usr/bin/env python
"""Batched condition sweep of a ~10^3-reaction pyrolysis CRN on one chip.

BASELINE.md configs 3+4: long-timescale stiff solves of a synthetic
radical-chain cracking network under a family of temperature ramps,
executed as ONE vmapped chunkwise BDF program (the capability the
reference leaves to the user, docs/src/tutorials/ode-solution.md:190).

    python examples/pyrolysis_sweep.py [batch]
"""
import os
import sys

# Allow running straight from a source checkout ("python examples/...").
# The checkout is deliberately PREPENDED so it wins over any installed
# copy; existing PYTHONPATH entries (e.g. environment sitecustomize
# paths) are preserved, with no empty entries introduced.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_repo] + [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
               if p])
import time

import numpy as np

import kinetica_tpu  # noqa: F401
from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.parallel.batching import EnsembleProblem
from kinetica_tpu.solving.methods import VariableODESolve
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network


def main(batch: int = 32):
    sd, rd, Ea, A = synthetic_pyrolysis_network(16)
    print(f"CRN: {sd.n} species, {rd.nr} reactions; sweep of {batch} ramps")
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)

    tf = 14.0
    rates = np.linspace(40.0, 60.0, batch)
    conditions_list = [
        ConditionSet({"T": LinearGradientProfile(
            rate=float(r), X_start=500.0, X_end=500.0 + float(r) * tf)},
            ts_update=0.25)
        for r in rates]
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"C16": 1.0},
                               solve_chunks=True, solve_chunkstep=0.5,
                               low_k_cutoff="none")

    problem = EnsembleProblem(VariableODESolve(pars, conditions_list[0], calc),
                              sd, rd)
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conditions_list)
    print(f"first solve (incl. compile): {time.perf_counter() - t0:.1f}s; "
          f"success: {ens.success}")
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conditions_list)
    dt = time.perf_counter() - t0
    print(f"steady-state sweep: {dt:.2f}s total, {dt / batch * 1e3:.1f} ms "
          f"per profile")

    c16 = ens.u[:, -1, sd.toInt["C16"]]
    print("final C16 vs heating rate:")
    for r, c in zip(rates[:: max(1, batch // 8)], c16[:: max(1, batch // 8)]):
        print(f"  rate {r:5.1f} K/s -> {c:.4e} mol dm^-3")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
