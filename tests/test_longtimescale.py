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
        # nonnegativity projection (ops/bdf.py accept path) trades exact
        # linear-invariant conservation for positivity: drift is bounded by
        # ~atol per projected step (observed ~3e-8 relative over 1e4 s)
        np.testing.assert_allclose(res.sol.u[-1] @ cvec, 8.0, rtol=1e-6)
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
        # nonnegativity projection (ops/bdf.py accept path) trades exact
        # linear-invariant conservation for positivity: drift is bounded by
        # ~atol per projected step (observed ~3e-8 relative over 1e4 s)
        np.testing.assert_allclose(res.sol.u[-1] @ cvec, 8.0, rtol=1e-6)
        # the sawtooth T trace is recorded with resets
        T = res.sol.vcs["T"]
        assert T.max() <= 1100.0 + 1e-6 and T.min() >= 700.0 - 1e-6

    def test_1e5s_slow_ramp_ignition(self):
        """Regression: slow-ramp ignition death spiral (h-underflow).

        At ~0.00686 K/s the ignition front used to seed tolerance-level
        negative concentrations whose quadratic self-consumption is
        explosively unstable (du/dt = -k u^2 blows up in 1/(k|u|) s),
        driving h below the underflow floor. Fixed by evaluating rates on
        max(u, 0) (models/mass_action.py) plus accepted-step projection
        onto u >= 0 and the post-Newton-failure growth limiter (ops/bdf.py).
        """
        from kinetica_tpu.conditions.profiles import LinearGradientProfile

        tf = 1e5
        sd, rd, Ea, A = synthetic_pyrolysis_network(16)
        calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
        rate = float(np.linspace(0.006, 0.008, 8)[3])  # worst observed
        cs = ConditionSet({"T": LinearGradientProfile(
            rate=rate, X_start=500.0, X_end=500.0 + rate * tf)},
            ts_update=250.0)
        pars = ODESimulationParams(tspan=(0.0, tf), u0={"C16": 1.0},
                                   solve_chunks=True, solve_chunkstep=2500.0,
                                   low_k_cutoff="none", save_interval=2500.0)
        res = solve_network(VariableODESolve(pars, cs, calc), sd, rd)
        assert res.sol.success
        cvec = carbon_count(res.sd)
        np.testing.assert_allclose(res.sol.u[-1] @ cvec, 16.0, rtol=1e-6)
        assert res.sol.u[-1].min() > -1e-8
