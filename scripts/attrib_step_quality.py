"""Step-quality attribution: why does the TPU mixed-precision path take
more step attempts than the CPU f64 path on the production problem?

Runs ONE profile of the production bench config through solve_network
(continuous formalism) and prints the full integrator stat breakdown
(accepted / rejected / Newton evals / Jacobian refreshes / LU builds).
Run once on CPU (KINETICA_ATTRIB_PLATFORM=cpu, the f64 dense-dot path)
and once on TPU (=tpu, the pair-kernel + f32-factor path); the delta in
n_rejected/n_lu localises the step-count excess.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import kinetica_tpu  # noqa: F401
import jax

if os.environ.get("KINETICA_ATTRIB_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.solving.methods import VariableODESolve, solve_network
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

NC = int(os.environ.get("KINETICA_BENCH_NC", "24"))
RATE = float(os.environ.get("KINETICA_ATTRIB_RATE", "50.0"))
TF = 14.0


def main():
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    ts_update = os.environ.get("KINETICA_ATTRIB_TS_UPDATE")
    conditions = ConditionSet(
        {"T": LinearGradientProfile(
            rate=RATE, X_start=500.0, X_end=500.0 + RATE * TF)},
        **({"ts_update": float(ts_update)} if ts_update else {}))
    pars = ODESimulationParams(
        tspan=(0.0, TF), u0={f"C{NC}": 1.0},
        solve_chunks=True, solve_chunkstep=0.5,
        low_k_cutoff="none", abstol=1e-10, reltol=1e-8, progress=False,
        **({"jac_dtype": os.environ["KINETICA_ATTRIB_JAC_DTYPE"]}
           if "KINETICA_ATTRIB_JAC_DTYPE" in os.environ else {}),
        **({"rhs_contraction": os.environ["KINETICA_ATTRIB_CONTRACTION"]}
           if "KINETICA_ATTRIB_CONTRACTION" in os.environ else {}),
        **({"lu_precision": os.environ["KINETICA_ATTRIB_LU_PRECISION"]}
           if "KINETICA_ATTRIB_LU_PRECISION" in os.environ else {}),
        **({"linsolve": os.environ["KINETICA_ATTRIB_LINSOLVE"]}
           if "KINETICA_ATTRIB_LINSOLVE" in os.environ else {}))
    method = VariableODESolve(pars, conditions, calc)
    out = solve_network(method, sd, rd)
    s = out.sol.stats
    plat = jax.devices()[0].platform
    print(f"platform={plat} rate={RATE}")
    for k in ("n_steps", "n_accepted", "n_rejected", "n_fev", "n_jev",
              "n_lu", "attempts", "n_chunks"):
        print(f"  {k:12s} {s.get(k)}")
    na, nr = s.get("n_accepted", 0), s.get("n_rejected", 0)
    if na:
        print(f"  reject ratio  {nr / (na + nr):.3f}")
        print(f"  newton/step   {s.get('n_fev', 0) / s.get('n_steps', 1):.2f}")
    print(f"  final u[:3] = {np.asarray(out.sol.u[-1])[:3]}")


if __name__ == "__main__":
    main()
