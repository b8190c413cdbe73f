"""Reproduce / bound / price the async-discrete large-batch worker fault.

Round-4 finding (design.md "Round-4 late III"): the async whole-horizon
chunk program with DISCRETE k tables kernel-faults the remote TPU
worker at B=436 (reproduced across linsolve and rhs_contraction
variants), is state-dependent at B=256, and is clean for CONTINUOUS
async to B=1024 — so discrete ensembles above B=128 are guarded to the
scan/group program (parallel/batching._run_batch).

This script does three things, each in a SEPARATE subprocess so a
worker fault (1-3 min recovery) cannot take the driver down:

  probe   — run the UNGUARDED async-discrete program at a given B
            (KINETICA_UNSAFE_ASYNC_DISCRETE=1) and report pass/fault.
  bisect  — strip the program down: (a) full solve, (b) solve with the
            discrete stops ROW machinery but a constant k table,
            (c) continuous-rate async control at the same B. Which
            variants fault localises the trigger.
  price   — measure scan (guarded) vs async (unguarded) wall at B=256
            discrete, so the guard's throughput cost is known.

Usage:
  python scripts/repro_async_discrete_fault.py probe 436
  python scripts/repro_async_discrete_fault.py bisect 436
  python scripts/repro_async_discrete_fault.py price
Results append to scripts/fault_repro_results.jsonl.

WARNING: 'probe'/'bisect' intentionally crash the remote worker when
the fault reproduces. Run AFTER any benchmarking session.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "scripts", "fault_repro_results.jsonl")

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import kinetica_tpu  # x64
from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.parallel.batching import EnsembleProblem
from kinetica_tpu.solving.methods import VariableODESolve
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

B = {B}
variant = {variant!r}
rate_mode = "continuous" if variant == "continuous" else "discrete"
# "coarse" keeps the discrete machinery but shrinks the stops table
# ~14x: if it passes where "full" faults, the table size is implicated
ts_update = (None if rate_mode == "continuous"
             else 3.5 if variant == "coarse" else 0.25)

sd, rd, Ea, A = synthetic_pyrolysis_network(24)
calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
tf = 14.0
conds = []
for r in np.linspace(40.0, 60.0, B):
    cs = ConditionSet({{"T": LinearGradientProfile(
        rate=float(r), X_start=500.0, X_end=500.0 + float(r) * tf)}},
        **({{}} if ts_update is None else {{"ts_update": ts_update}}))
    conds.append(cs)
pars = ODESimulationParams(tspan=(0.0, tf), u0={{"C24": 1.0}},
                           solve_chunks=True, solve_chunkstep=0.5,
                           low_k_cutoff="none")
method = VariableODESolve(pars, conds[0], calc)
prob = EnsembleProblem(method, sd, rd, rate_mode=rate_mode,
                       chunk_mode={chunk_mode!r})
t0 = time.perf_counter()
ens = prob.solve(conditions_list=conds)
t1 = time.perf_counter()
ens2 = prob.solve(conditions_list=conds)
t2 = time.perf_counter()
print("RESULT", variant, B, "ok", round(t1 - t0, 2), round(t2 - t1, 2),
      bool(ens2.success))
"""


def run_child(B, variant, chunk_mode="async", unsafe=True, timeout=900):
    env = dict(os.environ)
    if unsafe:
        env["KINETICA_UNSAFE_ASYNC_DISCRETE"] = "1"
    code = CHILD.format(repo=REPO, B=B, variant=variant,
                        chunk_mode=chunk_mode)
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=timeout)
        ok = p.returncode == 0 and "RESULT" in p.stdout
        if ok:
            tail = next(l for l in p.stdout.splitlines()
                        if l.startswith("RESULT"))
        else:
            err_lines = [l for l in (p.stdout + p.stderr).splitlines()
                         if ("Error" in l or "INTERNAL" in l
                             or "error" in l)][-4:]
            tail = " | ".join(err_lines)[-900:] or (p.stdout
                                                    + p.stderr)[-400:]
    except subprocess.TimeoutExpired:
        ok, tail = False, "TIMEOUT"
    rec = {"B": B, "variant": variant, "chunk_mode": chunk_mode,
           "unsafe": unsafe, "ok": ok, "wall_s": round(time.time() - t0, 1),
           "tail": tail}
    print(json.dumps(rec)[:800])
    with open(RESULTS, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    return rec


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if mode == "probe":
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 436
        run_child(B, "full")
    elif mode == "bisect":
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 436
        for variant in ("continuous", "coarse", "full"):
            rec = run_child(B, variant)
            # give a faulted worker time to recover before the next probe
            if not rec["ok"]:
                print("   (waiting 180 s for worker recovery)")
                time.sleep(180)
    elif mode == "price":
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        run_child(B, "full", chunk_mode="scan", unsafe=False)
        run_child(B, "full", chunk_mode="async", unsafe=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
