"""Device-trace profile of the production ensemble sweep.

Runs the production continuous-rate async-chunk sweep (attrib_production's
baseline variant) once warm, then once under ``jax.profiler.start_trace``,
and aggregates the resulting XSpace device plane into a per-op table:
total device time, call count, and share of the traced window.  This is
the tool that localises the "unattributed" step cost the chained-kernel
attribution scripts cannot see (they time ops in isolation; the trace
shows the real in-situ schedule, including gaps).

Run on TPU:  python scripts/profile_trace.py [--nc 60] [--tf 2.0] [--top 40]
The xplane protobuf is parsed with tensorflow's bundled xplane_pb2 — no
tensorboard UI needed.
"""
import argparse
import glob
import os
import sys
from collections import defaultdict

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


def build_problem(nc, b, tf, linsolve="auto", jac_policy="lazy"):
    sd, rd, Ea, A = synthetic_pyrolysis_network(nc)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    rates = np.linspace(40.0, 60.0, b)
    conditions_list = [
        ConditionSet({"T": LinearGradientProfile(
            rate=float(r), X_start=500.0, X_end=500.0 + float(r) * tf)})
        for r in rates]
    pars = ODESimulationParams(
        tspan=(0.0, tf), u0={f"C{nc}": 1.0},
        solve_chunks=True, solve_chunkstep=0.5,
        low_k_cutoff="none", abstol=1e-10, reltol=1e-8,
        linsolve=linsolve, progress=False, jac_policy=jac_policy)
    method = VariableODESolve(pars, conditions_list[0], calc)
    problem = EnsembleProblem(method, sd, rd, rate_mode="continuous",
                              chunk_mode="async")
    return problem, conditions_list


def parse_xspace(logdir, top):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
        t_lo, t_hi = None, 0
        for line in plane.lines:
            # XLA Ops / XLA Modules lines both appear; use the op-level line
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
                start = line.timestamp_ns * 1000 + ev.offset_ps
                t_lo = start if t_lo is None else min(t_lo, start)
                t_hi = max(t_hi, start + ev.duration_ps)
        if not agg:
            continue
        window_ms = (t_hi - t_lo) / 1e9 if t_lo is not None else 0.0
        busy_ms = sum(v[0] for v in agg.values()) / 1e9
        print(f"\n== plane {plane.name}: traced window {window_ms:.1f} ms, "
              f"op busy {busy_ms:.1f} ms ({100*busy_ms/max(window_ms,1e-9):.0f}%), "
              f"{len(agg)} distinct ops ==")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
        for name, (ps, cnt) in rows:
            ms = ps / 1e9
            print(f"{ms:9.1f} ms {100*ms/max(busy_ms,1e-9):5.1f}% "
                  f"n={cnt:7d} avg={ms/max(cnt,1):8.4f} ms  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nc", type=int, default=int(os.environ.get("KINETICA_BENCH_NC", "60")))
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--tf", type=float, default=2.0)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--linsolve", default="auto")
    ap.add_argument("--jac-policy", default="lazy")
    ap.add_argument("--logdir", default="/tmp/ktpu_trace")
    args = ap.parse_args()

    problem, conds = build_problem(args.nc, args.b, args.tf,
                                   linsolve=args.linsolve,
                                   jac_policy=args.jac_policy)
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conds)
    print(f"warm run {time.perf_counter()-t0:.1f}s ok={ens.success}")
    steps = np.asarray(ens.stats.get("n_steps", [0]))
    print(f"steps max={steps.max()} med={np.median(steps):.0f}")

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conds)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced run {wall:.2f}s = {wall/args.b*1e3:.1f} ms/profile, "
          f"{wall*1e3/steps.max():.2f} ms/step")
    parse_xspace(args.logdir, args.top)


if __name__ == "__main__":
    main()
