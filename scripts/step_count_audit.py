"""Controller-quality audit: our BDF's step counts vs scipy BDF, per lane.

Batch-synchronous sweeps pay the MAX lane's step count, so controller
quality (initial h, order selection, growth limits) converts directly
into wall clock. This audit is hardware-independent: step counts are a
property of the adaptive controller, not the backend, so it runs on the
JAX CPU platform and compares the chunkwise solve's per-lane ``n_steps``
against scipy BDF integrating the *same* chunk sequence at the same
tolerances (the reference-formalism twin of our solve; cf.
/root/reference/src/solving/solve_utils.jl:376-424's tolerance story).

Usage:  python scripts/step_count_audit.py [lane_rate ...]
Defaults to the bench sweep's extreme + middle lanes (40, 50, 60 K/s).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

N_CARBONS = int(os.environ.get("KINETICA_BENCH_NC", "24"))
RTOL, ATOL = 1e-8, 1e-10
TF = 14.0
CHUNKSTEP = 0.5


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from scipy.integrate import solve_ivp

    from kinetica_tpu.calculators.builtin import (
        PrecalculatedArrheniusCalculator)
    from kinetica_tpu.conditions.condition_set import ConditionSet
    from kinetica_tpu.conditions.profiles import LinearGradientProfile
    from kinetica_tpu.solving.methods import VariableODESolve, solve_network
    from kinetica_tpu.solving.params import ODESimulationParams
    from kinetica_tpu.testing.cpu_reference import (
        arrhenius_k_of_t, build_numpy_mass_action)
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

    rates = [float(a) for a in sys.argv[1:]] or [40.0, 50.0, 60.0]
    sd, rd, Ea, A = synthetic_pyrolysis_network(N_CARBONS)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    n_chunks = int(round(TF / CHUNKSTEP))
    print(f"{rd.nr} rxns / {sd.n} species, tf={TF}, {n_chunks} chunks, "
          f"rtol={RTOL} atol={ATOL}")
    print(f"{'rate':>6} {'ours':>6} {'scipy':>6} {'ratio':>6}  "
          f"(accepted steps both sides, chunk-summed)")

    for r in rates:
        conds = ConditionSet({"T": LinearGradientProfile(
            rate=r, X_start=500.0, X_end=500.0 + r * TF)})
        pars = ODESimulationParams(
            tspan=(0.0, TF), u0={f"C{N_CARBONS}": 1.0},
            solve_chunks=True, solve_chunkstep=CHUNKSTEP,
            low_k_cutoff="none", abstol=ATOL, reltol=RTOL)
        res = solve_network(VariableODESolve(pars, conds, calc), sd, rd)
        # n_accepted, not n_steps: n_steps counts every ATTEMPT (rejected
        # steps included, bdf.py increments it unconditionally) while
        # scipy's sol.t.size-1 is accepted steps only — mixing them would
        # inflate our side of the ratio.
        ours = int(np.sum(np.asarray(res.sol.stats["n_accepted"])))
        rej = int(np.sum(np.asarray(res.sol.stats["n_rejected"])))

        # scipy on the identical chunk sequence (local-time formalism)
        rhs_f, jac_f, u0 = _scipy_problem(
            build_numpy_mass_action, arrhenius_k_of_t, sd, rd, calc, conds,
            pars)
        sp_steps = 0
        y = u0
        for nc in range(n_chunks):
            t_shift = nc * CHUNKSTEP
            sol = solve_ivp(
                lambda t, yv: rhs_f(t + t_shift, yv), (0.0, CHUNKSTEP), y,
                method="BDF", jac=lambda t, yv: jac_f(t + t_shift, yv),
                rtol=RTOL, atol=ATOL)
            assert sol.success, sol.message
            y = sol.y[:, -1]
            sp_steps += sol.t.size - 1
        print(f"{r:>6.1f} {ours:>6d} {sp_steps:>6d} {ours / sp_steps:>6.2f}"
              f"  (+{rej} rejected)")


def _scipy_problem(build_numpy_mass_action, arrhenius_k_of_t, sd, rd, calc,
                   conds, pars):
    from kinetica_tpu.solving.solve_utils import make_u0
    rhs_factory, jac_factory = build_numpy_mass_action(sd, rd)[:2]
    k_of_t = arrhenius_k_of_t(calc, conds.get_profile("T"))
    return rhs_factory(k_of_t), jac_factory(k_of_t), np.asarray(
        make_u0(sd, pars))


if __name__ == "__main__":
    main()
