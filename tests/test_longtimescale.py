"""Long-timescale chunkwise solves (BASELINE configs 2 and 3, scaled down).

The reference's headline capability: "long-timescale, high-rate
simulations ... unhindered by floating point underflow" via chunkwise time
(implementation-details.md:28). These tests run a 1e4 s double-ramp solve
and a sawtooth-profile solve of the synthetic pyrolysis CRN and check
success + exact element conservation.
"""
import numpy as np
import pytest

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import (DoubleRampGradientProfile,
                                              SawtoothDirectProfile)
from kinetica_tpu.solving.methods import VariableODESolve, solve_network
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network


def carbon_count(sd):
    def carbons(s):
        return 0 if s in ("Hr", "H2") else int(s[1:].rstrip("re"))
    return np.array([carbons(sd.toStr[i]) for i in range(sd.n)])


class TestLongTimescale:
    def test_double_ramp_1e4s(self):
        sd, rd, Ea, A = synthetic_pyrolysis_network(8)
        calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
        cs = ConditionSet({"T": DoubleRampGradientProfile(
            X_start=600.0, t_start_plateau=500.0, rate1=0.2, X_mid=1100.0,
            t_mid_plateau=2000.0, rate2=-0.2, X_end=600.0,
            t_end_plateau=2500.0)}, ts_update=50.0)
        tf = cs.get_t_final()
        assert tf == 1e4
        pars = ODESimulationParams(tspan=(0.0, tf), u0={"C8": 1.0},
                                   solve_chunks=True, solve_chunkstep=tf / 100,
                                   low_k_cutoff="auto")
        res = solve_network(VariableODESolve(pars, cs, calc), sd, rd)
        assert res.sol.success
        cvec = carbon_count(res.sd)
        np.testing.assert_allclose(res.sol.u[-1] @ cvec, 8.0, rtol=1e-9)
        # hot mid-plateau cracks the feed; final C8 far below initial
        assert res.sol.u[-1, res.sd.toInt["C8"]] < 0.2

    def test_sawtooth_profile_solve(self):
        sd, rd, Ea, A = synthetic_pyrolysis_network(8)
        calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
        cs = ConditionSet({"T": SawtoothDirectProfile(
            amplitude=200.0, period=5.0, X_mid=900.0, n_periods=4)},
            ts_update=0.25)
        tf = cs.get_t_final()
        pars = ODESimulationParams(tspan=(0.0, tf), u0={"C8": 1.0},
                                   solve_chunks=True, solve_chunkstep=1.0,
                                   low_k_cutoff="none")
        res = solve_network(VariableODESolve(pars, cs, calc), sd, rd)
        assert res.sol.success
        cvec = carbon_count(res.sd)
        np.testing.assert_allclose(res.sol.u[-1] @ cvec, 8.0, rtol=1e-9)
        # the sawtooth T trace is recorded with resets
        T = res.sol.vcs["T"]
        assert T.max() <= 1100.0 + 1e-6 and T.min() >= 700.0 - 1e-6
