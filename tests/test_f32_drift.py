"""f32-state-mode drift bounds (SURVEY §4 tier; VERDICT r1 #1).

``dtype="float32"`` solves at (abstol 1e-6, reltol 1e-4) are compared
against the f64 production configuration over increasing horizons on the
same stiff variable-T CRN. Measured characterisation (also recorded in
docs/design.md): max mole-fraction deviation ~1.2e-5, FLAT from 1e2 s to
1e5 s — chunkwise integration keeps each chunk's time local, so f32
round-off does not accumulate secularly across the horizon.
"""
import logging

import numpy as np
import pytest

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.solving.methods import VariableODESolve, solve_network
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

logging.disable(logging.INFO)


def solve_at(dtype, tf, rate, tols):
    sd, rd, Ea, A = synthetic_pyrolysis_network(8)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    conds = ConditionSet({"T": LinearGradientProfile(
        rate=rate, X_start=700.0, X_end=700.0 + rate * tf)},
        ts_update=tf / 40)
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"C8": 1.0},
                               solve_chunks=True, solve_chunkstep=tf / 100,
                               abstol=tols[0], reltol=tols[1],
                               low_k_cutoff="none", dtype=dtype)
    res = solve_network(VariableODESolve(pars, conds, calc), sd, rd,
                        copy_network=True)
    assert res.sol.success
    return np.asarray(res.sol.u)


@pytest.mark.parametrize("tf,rate", [(1e2, 4.0), (1e5, 0.004)])
def test_f32_drift_bounded_and_horizon_flat(tf, rate):
    u64 = solve_at("float64", tf, rate, (1e-10, 1e-8))
    u32 = solve_at("float32", tf, rate, (1e-6, 1e-4))
    drift = np.abs(u32 - u64).max()
    # measured ~1.2e-5 at BOTH horizons; 5e-5 bounds run-to-run noise.
    # A secular-drift regression (e.g. losing the local-time chunk
    # formulation) would blow past this at 1e5 s.
    assert drift < 5e-5, f"f32 drift {drift:.2e} at tf={tf:g}"
