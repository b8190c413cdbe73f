"""Benchmark: TPU chunkwise stiff CRN solve vs CPU BDF (CVODE stand-in).

Config 3+4 of BASELINE.md: a ~10^3-reaction synthetic pyrolysis CRN under a
variable temperature ramp, solved chunkwise with discrete rate updates at
reltol 1e-8 / abstol 1e-10, then the same solve batched over a sweep of
condition profiles on one chip. The CPU baseline is scipy's BDF (same
algorithm family as the reference's recommended CVODE_BDF; Sundials is not
installable in this image) on the identical mass-action system, analytic
Jacobian included.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value = per-profile wall-clock speedup of the batched TPU sweep over
the single-threaded CPU BDF solve, and vs_baseline is the same ratio
(baseline = 1.0 = CPU BDF).
"""
import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("KINETICA_BENCH_BATCH", "64"))
# default = the BASELINE north-star scale (~10^3 reactions: nc=24 ->
# 1095 rxns / 73 species); nc=16 (603 rxns) remains selectable via env
N_CARBONS = int(os.environ.get("KINETICA_BENCH_NC", "24"))
RTOL, ATOL = 1e-8, 1e-10


def build():
    from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
    from kinetica_tpu.conditions.condition_set import ConditionSet
    from kinetica_tpu.conditions.profiles import LinearGradientProfile
    from kinetica_tpu.solving.params import ODESimulationParams
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

    sd, rd, Ea, A = synthetic_pyrolysis_network(N_CARBONS)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    tf = 14.0
    rates = np.linspace(40.0, 60.0, BATCH)
    # continuous rate mode: k(T(t)) traced into the RHS (same formalism as
    # the scipy baseline below — no discretisation gap on either side)
    conditions_list = [
        ConditionSet({"T": LinearGradientProfile(
            rate=float(r), X_start=500.0, X_end=500.0 + float(r) * tf)})
        for r in rates]
    pars = ODESimulationParams(tspan=(0.0, tf), u0={f"C{N_CARBONS}": 1.0},
                               solve_chunks=True, solve_chunkstep=0.5,
                               low_k_cutoff="none", abstol=ATOL, reltol=RTOL)
    return sd, rd, calc, conditions_list, pars


def cpu_baseline_seconds(sd, rd, calc, conditions, pars):
    """scipy BDF on the identical system — pure numpy RHS/Jacobian (no
    device dispatch), the honest CPU-production baseline."""
    from scipy.integrate import solve_ivp

    from kinetica_tpu import constants
    from kinetica_tpu.solving.solve_utils import make_u0

    # numpy mass-action formulation (mirrors models/mass_action.py)
    ns, nr = sd.n, rd.nr
    arity = max(2, max(sum(s) for s in rd.stoic_reacs))
    slots = np.full((nr, arity), ns, dtype=np.int64)
    N = np.zeros((nr, ns))
    for j in range(nr):
        s = 0
        for sid, st in zip(rd.id_reacs[j], rd.stoic_reacs[j]):
            N[j, sid] -= st
            for _ in range(st):
                slots[j, s] = sid
                s += 1
        for sid, st in zip(rd.id_prods[j], rd.stoic_prods[j]):
            N[j, sid] += st
    E = np.zeros((arity, nr, ns))
    for s in range(arity):
        valid = slots[:, s] < ns
        E[s, np.flatnonzero(valid), slots[valid, s]] = 1.0

    prof = conditions.get_profile("T")
    Ea_np, A_np = np.asarray(calc.Ea), np.asarray(calc.A)
    k_max = calc.k_max

    def k_of_t(t):
        T = float(np.asarray(prof.value(t)))
        k = A_np * np.exp(-Ea_np / (constants.R * T)) * constants.N_A
        if k_max is not None:
            k = 1.0 / (1.0 / k_max + 1.0 / k)
        return k

    def rhs(t, y):
        u = np.append(y, 1.0)
        r = k_of_t(t) * u[slots].prod(axis=1)
        return r @ N

    def jac(t, y):
        u = np.append(y, 1.0)
        k = k_of_t(t)
        su = u[slots]
        G = np.zeros((nr, ns))
        for s in range(arity):
            others = np.prod(np.delete(su, s, axis=1), axis=1)
            G += (k * others)[:, None] * E[s]
        return N.T @ G

    u0 = make_u0(sd, pars)
    t0 = time.perf_counter()
    sol = solve_ivp(rhs, pars.tspan, u0, method="BDF", jac=jac,
                    rtol=RTOL, atol=ATOL)
    dt = time.perf_counter() - t0
    assert sol.success, "CPU baseline failed"
    return dt, sol.y[:, -1]


def main():
    import kinetica_tpu  # noqa: F401  (enables x64)
    import jax
    # Persistent compilation cache: TPU compiles of the batched chunk-scan
    # program take minutes; cached executables make reruns near-instant.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from kinetica_tpu.parallel.batching import EnsembleProblem
    from kinetica_tpu.solving.methods import VariableODESolve

    sd, rd, calc, conditions_list, pars = build()
    sys.stderr.write(f"bench: {sd.n} species, {rd.nr} reactions, "
                     f"batch {BATCH}, device {jax.devices()[0].platform}\n")

    # CPU baseline: one profile, single solve (the reference's workload unit)
    cpu_dt, cpu_final = cpu_baseline_seconds(sd, rd, calc, conditions_list[0],
                                             pars)
    sys.stderr.write(f"bench: CPU BDF single profile: {cpu_dt:.2f}s\n")

    # Device sweep: BATCH profiles at once (warm-up compile, then timed)
    method = VariableODESolve(pars, conditions_list[0], calc)
    problem = EnsembleProblem(method, sd, rd, rate_mode="continuous")
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conditions_list)
    compile_and_run = time.perf_counter() - t0
    assert ens.success, f"device sweep failed: {ens.retcodes[:4]}..."
    t0 = time.perf_counter()
    ens = problem.solve(conditions_list=conditions_list)
    sweep_dt = time.perf_counter() - t0
    per_profile = sweep_dt / BATCH
    sys.stderr.write(f"bench: device sweep: {sweep_dt:.2f}s total "
                     f"({per_profile * 1e3:.1f} ms/profile; first run incl. "
                     f"compile {compile_and_run:.1f}s)\n")

    # accuracy guard: member 0 final state vs CPU baseline (mole-fraction)
    err = np.max(np.abs(ens.u[0, -1] - cpu_final) / max(cpu_final.sum(), 1.0))
    sys.stderr.write(f"bench: max mole-fraction error vs CPU BDF: {err:.2e}\n")
    assert err < 1e-2, "accuracy gate failed"

    # per-step cost telemetry (VERDICT r1 #9): integrator step counts ride
    # in EnsembleSolution.stats, so round-over-round perf claims are
    # self-documenting
    steps = np.asarray(ens.stats.get("n_steps", []))
    ms_per_step = (sweep_dt * 1e3 / steps.max()) if steps.size else None
    if ms_per_step is not None:
        sys.stderr.write(
            f"bench: steps/profile max={int(steps.max())} "
            f"median={int(np.median(steps))}; device {ms_per_step:.2f} "
            "ms/step (batch-synchronous)\n")

    speedup = cpu_dt / per_profile
    print(json.dumps({
        "metric": "pyrolysis_crn_variable_T_solve_per_profile_speedup",
        "value": round(speedup, 3),
        "unit": "x_vs_cpu_bdf",
        "vs_baseline": round(speedup, 3),
        "extra": {
            "crn": f"{rd.nr}rxn/{sd.n}sp", "batch": BATCH,
            "per_profile_ms": round(per_profile * 1e3, 1),
            "cpu_baseline_s": round(cpu_dt, 2),
            "max_molefrac_err": float(err),
            "ms_per_step": (round(ms_per_step, 3)
                            if ms_per_step is not None else None),
        },
    }))


if __name__ == "__main__":
    main()
