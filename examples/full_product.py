#!/usr/bin/env python
"""The full product loop in one command: explore -> solve -> analyse.

Mirrors the reference's README promise (/root/reference/README.md:5-9 —
automated exploration of chemical reaction networks plus kinetic
modelling under arbitrary conditions) and goes beyond it with the
TPU-native analysis layer:

  1. EXPLORE   — kinetics-gated iterative CRN exploration: the native
                 cde_lite sampler grows the mechanism level by level,
                 each level gated by ONE batched device solve of the
                 network-so-far over a ramp-rate sweep
                 (methods.jl:150-266; solve gate at :221).
  2. SOLVE     — batched condition sweep of the final network on the
                 accelerator (the reference leaves ensembles to the
                 user, ode-solution.md:190).
  3. SCREEN    — Morris elementary effects: which rate constants does
                 the observable respond to (one batched sweep)?
  4. REDUCE    — DRGEP skeletal reduction with re-solve validation:
                 the smallest sub-mechanism reproducing the target
                 profile within tolerance.

    python examples/full_product.py            # ~2-4 min on one chip

Smoke-tested in the slow tier (tests/test_full_product.py).
"""
import os
import sys
import tempfile
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_repo] + [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
               if p])

import numpy as np

import kinetica_tpu  # noqa: F401  (enables x64)
from kinetica_tpu import morris_screening
from kinetica_tpu.analysis.reduction import reduce_network_drgep
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.core.network import format_rxn
from kinetica_tpu.exploration import CDE, IterativeExplore, explore_network
from kinetica_tpu.exploration.cde_lite import (build_cde_lite,
                                               get_cde_lite_exec,
                                               write_minimal_template)
from kinetica_tpu.parallel.batching import EnsembleProblem
from kinetica_tpu.solving.methods import StaticODESolve, VariableODESolve
from kinetica_tpu.solving.params import ODESimulationParams

from iterative_exploration import UniformArrhenius  # noqa: E402


def main(n_sweep: int = 16, max_levels: int = 3, quiet: bool = False,
         reduce_tol: float = 1e-3):
    if build_cde_lite() is None:
        raise SystemExit("g++ unavailable: cannot build the native sampler")
    say = (lambda *a: None) if quiet else print
    workdir = tempfile.mkdtemp(prefix="kinetica_full_product_")
    template = write_minimal_template(os.path.join(workdir, "template"),
                                      nrxn_per_mech=2)

    # ---- 1. EXPLORE: kinetics-gated iterative mechanism growth ----
    tf = 10.0
    rates = np.linspace(40.0, 80.0, n_sweep)
    conditions_list = [
        ConditionSet({"T": LinearGradientProfile(
            rate=float(r), X_start=600.0, X_end=600.0 + float(r) * tf)})
        for r in rates]
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"CC": 1.0},
                               solve_chunks=True, solve_chunkstep=tf / 10,
                               low_k_cutoff="none")
    calc = UniformArrhenius()
    solvemethod = VariableODESolve(pars, conditions_list[0], calc)
    timings: list = []
    exploremethod = IterativeExplore(
        rdir_head=os.path.join(workdir, "crn"),
        reac_smiles=["CC"],
        rxn_convergence_threshold=2,
        seed_convergence_threshold=2,
        seed_conc=0.05,
        max_levels=max_levels,
        solve_conditions_list=conditions_list,
        timings=timings,
        cde=CDE(template_dir=template, cde_exec=get_cde_lite_exec(),
                sampling_seed=7, nrxn=4, radius=1))
    t0 = time.perf_counter()
    res = explore_network(exploremethod, solvemethod,
                          savedir=os.path.join(workdir, "out"))
    sd, rd = res.sd, res.rd
    say(f"[1/4] explored {len(timings)} levels -> {sd.n} species / "
        f"{rd.nr} reactions in {time.perf_counter() - t0:.1f}s "
        f"(per-level device solve "
        f"{[t['solve_s'] for t in timings]} s)")

    # observable: the most abundant non-feed product under the sweep
    u_final = np.asarray(res.sol.u)[-1]
    order = np.argsort(u_final)[::-1]
    target = next(sd.toStr[i] for i in order
                  if sd.toStr[i] != "CC" and u_final[i] > 1e-10)

    # ---- 2. SOLVE: batched sweep of the final network ----
    t0 = time.perf_counter()
    prob = EnsembleProblem(solvemethod, sd, rd)
    ens = prob.solve(conditions_list=conditions_list)
    assert ens.success
    say(f"[2/4] {n_sweep}-profile sweep of the final CRN in "
        f"{time.perf_counter() - t0:.1f}s "
        f"({(time.perf_counter() - t0) / n_sweep * 1e3:.0f} ms/profile); "
        f"observable {target!r}")

    # ---- 3. SCREEN: Morris elementary effects on the observable ----
    t0 = time.perf_counter()
    static = StaticODESolve(
        ODESimulationParams(tspan=(0.0, tf), u0={"CC": 1.0},
                            solve_chunks=True, solve_chunkstep=tf / 10,
                            low_k_cutoff="none"),
        ConditionSet({"T": 900.0}), calc)
    mres = morris_screening(static, sd, rd, objective=target,
                            n_trajectories=4)
    rank = np.argsort(mres.mu_star)[::-1]
    say(f"[3/4] Morris screening ({time.perf_counter() - t0:.1f}s) — "
        "top channels:")
    for rid in rank[:3]:
        say(f"      mu*={mres.mu_star[rid]:.3g}  "
            f"{format_rxn(sd, rd, int(rid))}")

    # ---- 4. REDUCE: DRGEP + re-solve validation ----
    t0 = time.perf_counter()
    red = reduce_network_drgep(static, sd, rd, targets=[target],
                               tol=reduce_tol)
    keep = red.reduction
    say(f"[4/4] DRGEP ({time.perf_counter() - t0:.1f}s): "
        f"{rd.nr} -> {len(keep.keep_rids)} reactions / {sd.n} -> "
        f"{int(np.sum(keep.keep_species))} species at "
        f"eps={keep.eps:.3g}, validated max deviation "
        f"{red.error:.2e} <= {reduce_tol:g}")
    say(f"\nRun tree (restartable): {os.path.join(workdir, 'crn')}")
    return sd, rd, mres, red


if __name__ == "__main__":
    main()
