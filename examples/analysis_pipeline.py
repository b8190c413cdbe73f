#!/usr/bin/env python
"""The production analysis pipeline on one CRN, end to end.

Screen -> quantify -> reduce -> inspect: the workflow the library's
analysis layer is built around, on a 108-reaction synthetic cracking
network (all stages batch on the ensemble solver, so each "sweep" is
one device dispatch):

  1. Morris elementary-effects screening — which of the 108 rate
     constants does the ethene yield respond to at all?
  2. Sobol indices on the Morris survivors — how much variance does
     each explain, alone (S1) and with interactions (ST)?
  3. DRGEP skeletal reduction — the smallest sub-mechanism that
     reproduces the target profiles within tolerance, validated by
     re-solves.
  4. Reaction-flux analysis of the full solution — where the ethene
     actually comes from.

The reference has none of this machinery (its analysis layer is
plotting + graph export, /root/reference/src/analysis/); every stage
here is a TPU-native extra documented in docs/tutorials/.

    python examples/analysis_pipeline.py
"""
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np

from kinetica_tpu import (ConditionSet, ODESimulationParams,
                          PrecalculatedArrheniusCalculator, StaticODESolve,
                          morris_screening, reduce_network_drg,
                          sobol_sensitivity, solve_network)
from kinetica_tpu.analysis.flux import reaction_fluxes
from kinetica_tpu.core.network import format_rxn
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

TARGET = "C2e"          # ethene yield is the observable throughout


def main():
    sd, rd, Ea, A = synthetic_pyrolysis_network(6)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    pars = ODESimulationParams(tspan=(0.0, 2.0), u0={"C6": 1.0},
                               solve_chunks=True, solve_chunkstep=0.5,
                               save_interval=0.01)
    method = StaticODESolve(pars, ConditionSet({"T": 1100.0}), calc)
    print(f"CRN: {rd.nr} reactions / {sd.n} species, objective = "
          f"final [{TARGET}] at 1100 K")

    # 0. the full reference solution (reused by every later stage)
    full = solve_network(method, sd, rd)
    u = np.asarray(full.sol.u)
    print(f"full solve: final [{TARGET}] = {u[-1, sd.toInt[TARGET]]:.4f}\n")

    # 1. Morris screen over every rate constant (one batched sweep)
    scr = morris_screening(method, sd, rd, objective=TARGET,
                           n_trajectories=4, span_decades=1.0, seed=7)
    print(scr.summarise(sd, rd, top=8))
    survivors = scr.ranking()[:6]
    print(f"-> carrying the top {len(survivors)} into Sobol\n")

    # 2. Sobol indices on the survivors (one batched sweep)
    sob = sobol_sensitivity(method, sd, rd, rids=survivors,
                            objective=TARGET, n_samples=32,
                            span_decades=1.0, seed=7)
    print(sob.summarise(sd, rd))
    print()

    # 3. DRGEP skeletal reduction, error-controlled by re-solves
    red = reduce_network_drg(method, sd, rd, targets=[TARGET],
                             tol=1e-3, method="drgep", full_output=full,
                             eps_ladder=np.geomspace(0.3, 0.12, 8))
    print(red.summary())
    print()

    # 4. flux decomposition. The saturated feed conversion is a
    # sub-grid ignition burst, so the plain trapezoid attribution
    # REFUSES (its extents would be grid artifacts):
    try:
        reaction_fluxes(full, calc=calc)
    except ValueError as exc:
        print(f"trapezoid flux attribution correctly refused:\n  {exc}\n")
    # ... the projected attribution reconstructs every save interval's
    # NET species change exactly, so extents stay meaningful across
    # the burst:
    flux = reaction_fluxes(full, calc=calc, attribution="projected")
    print("top channels by net-consistent integrated extent:")
    for rid, extent in flux.top(4):
        print(f"  {extent:10.3e}  {format_rxn(sd, rd, int(rid))}")


if __name__ == "__main__":
    main()
