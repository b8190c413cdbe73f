"""Pseudo-transient steady-state finder (solving/steady_state.py)."""
import numpy as np
import pytest

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.core.network import RxData, SpeciesData
from kinetica_tpu.solving.methods import StaticODESolve, VariableODESolve
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.solving.steady_state import find_steady_state
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network


def test_reversible_isomerisation_equilibrium():
    """A <=> B (both C4H6 isomers): u*_B / u*_A = k_f / k_r exactly."""
    sd = SpeciesData(["C=CC=C", "C#CCC"])
    rd = RxData.from_reactions(sd, [["C=CC=C"], ["C#CCC"]],
                               [["C#CCC"], ["C=CC=C"]])
    # temperature-independent rates: Ea = 0, k = A * N_A
    from kinetica_tpu import constants
    A = np.array([3.0, 1.0]) / constants.N_A
    calc = PrecalculatedArrheniusCalculator(np.zeros(2), A)
    pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C=CC=C": 1.0},
                               low_k_cutoff="none")
    method = StaticODESolve(pars, ConditionSet({"T": 500.0}), calc)
    res = find_steady_state(method, sd, rd, t_first=0.01)
    assert res.converged
    K = 3.0
    uA, uB = res.u[sd.toInt["C=CC=C"]], res.u[sd.toInt["C#CCC"]]
    np.testing.assert_allclose(uB / uA, K, rtol=1e-6)
    np.testing.assert_allclose(uA + uB, 1.0, rtol=1e-8)
    assert res.residual < 1.0       # weighted du/dt at u*


def test_pyrolysis_network_stationary():
    """The synthetic CRN reaches a genuinely stationary composition."""
    sd, rd, Ea, A = synthetic_pyrolysis_network(6)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e6)
    pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C6": 1.0},
                               low_k_cutoff="none")
    method = StaticODESolve(pars, ConditionSet({"T": 800.0}), calc)
    res = find_steady_state(method, sd, rd, t_first=0.1, max_epochs=16)
    assert res.converged
    # carbon conservation at the fixed point
    def carbons(s):
        return 0 if s in ("Hr", "H2") else int(s[1:].rstrip("re"))
    cvec = np.array([carbons(sd.toStr[i]) for i in range(sd.n)])
    np.testing.assert_allclose(res.u @ cvec, 6.0, rtol=1e-5)
    # re-continuing from u* moves nothing: it is a fixed point
    pars2 = ODESimulationParams(tspan=(0.0, 1.0),
                                u0={sd.toStr[i]: float(res.u[i])
                                    for i in range(sd.n) if res.u[i] > 0},
                                allow_short_u0=True, low_k_cutoff="none")
    method2 = StaticODESolve(pars2, ConditionSet({"T": 800.0}), calc)
    res2 = find_steady_state(method2, sd, rd, t_first=res.t_total / 10)
    np.testing.assert_allclose(res2.u, res.u, rtol=1e-4, atol=1e-12)


def test_rejects_variable_conditions():
    sd, rd, Ea, A = synthetic_pyrolysis_network(4)
    calc = PrecalculatedArrheniusCalculator(Ea, A)
    from kinetica_tpu.conditions.profiles import LinearGradientProfile
    cs = ConditionSet({"T": LinearGradientProfile(rate=10.0, X_start=500.0,
                                                  X_end=600.0)})
    pars = ODESimulationParams(tspan=(0.0, 10.0), u0={"C4": 1.0},
                               low_k_cutoff="none")
    with pytest.raises(TypeError, match="StaticODESolve"):
        find_steady_state(VariableODESolve(pars, cs, calc), sd, rd)


def test_ensemble_equilibrium_map():
    """Batched fixed points over a temperature sweep match per-member
    single solves, and the equilibrium shifts monotonically with T."""
    from kinetica_tpu.solving.steady_state import find_steady_state_ensemble

    sd, rd, Ea, A = synthetic_pyrolysis_network(6)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e6)
    pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C6": 1.0},
                               low_k_cutoff="none")
    Ts = [700.0, 800.0, 900.0, 1000.0]
    conds = [ConditionSet({"T": T}) for T in Ts]
    method = StaticODESolve(pars, conds[0], calc)
    ens = find_steady_state_ensemble(method, sd, rd, conds, t_first=0.1,
                                     max_epochs=16)
    assert ens.success
    assert ens.u.shape == (4, sd.n)
    # member 2 equals a single-solve fixed point
    single = find_steady_state(StaticODESolve(pars, conds[2], calc), sd, rd,
                               t_first=0.1, max_epochs=16)
    assert single.converged
    # atol sits two decades below the default abstol (1e-10): species at
    # ~1e-24 and below are sub-tolerance garbage whose exact values shift
    # with refactor timing (batched vs single step trajectories differ at
    # roundoff); asserting them any tighter pins solver noise.
    np.testing.assert_allclose(ens.u[2], single.u, rtol=1e-6, atol=1e-12)
    # the equilibrium genuinely shifts with temperature
    diffs = np.abs(np.diff(ens.u, axis=0)).max(axis=1)
    assert np.all(diffs > 1e-6)
    # per-lane residuals are small at the fixed points
    assert np.all(ens.residual < 1.0)


def test_ensemble_rejects_variable_members():
    from kinetica_tpu.conditions.profiles import LinearGradientProfile
    from kinetica_tpu.solving.steady_state import find_steady_state_ensemble

    sd, rd, Ea, A = synthetic_pyrolysis_network(4)
    calc = PrecalculatedArrheniusCalculator(Ea, A)
    pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C4": 1.0},
                               low_k_cutoff="none")
    method = StaticODESolve(pars, ConditionSet({"T": 700.0}), calc)
    bad = [ConditionSet({"T": LinearGradientProfile(rate=10.0, X_start=500.0,
                                                    X_end=600.0)})]
    with pytest.raises(TypeError, match="static"):
        find_steady_state_ensemble(method, sd, rd, bad)


class TestSteadyStateSensitivities:
    """Exact IFT sensitivities S = du*/d ln k (steady_state.py)."""

    def test_isomerisation_analytic(self):
        """A <=> B: u*_B = k_f/(k_f+k_r), so du*_B/d ln k_f =
        k_f k_r/(k_f+k_r)^2 analytically."""
        from kinetica_tpu import constants
        from kinetica_tpu.solving.steady_state import \
            steady_state_sensitivities
        sd = SpeciesData(["C=CC=C", "C#CCC"])
        rd = RxData.from_reactions(sd, [["C=CC=C"], ["C#CCC"]],
                                   [["C#CCC"], ["C=CC=C"]])
        kf, kr = 3.0, 1.0
        A = np.array([kf, kr]) / constants.N_A
        calc = PrecalculatedArrheniusCalculator(np.zeros(2), A)
        pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C=CC=C": 1.0},
                                   low_k_cutoff="none")
        method = StaticODESolve(pars, ConditionSet({"T": 500.0}), calc)
        S = steady_state_sensitivities(method, sd, rd)
        iA, iB = sd.toInt["C=CC=C"], sd.toInt["C#CCC"]
        expect = kf * kr / (kf + kr) ** 2          # = 3/16
        np.testing.assert_allclose(S[iB, 0], expect, rtol=1e-6)
        np.testing.assert_allclose(S[iA, 0], -expect, rtol=1e-6)
        np.testing.assert_allclose(S[iB, 1], -expect, rtol=1e-6)
        # conservation: sensitivities cannot move the conserved total
        np.testing.assert_allclose(S.sum(axis=0), 0.0, atol=1e-12)

    def test_interior_equilibrium_fd_validation(self):
        """FD cross-check on a nonlinear CRN with an INTERIOR fixed point
        (the synthetic pyrolysis CRN equilibrates at total decomposition,
        where du*/dk is genuinely ~0): three C4H6 isomers coupled by two
        reversible isomerisations plus a reversible bimolecular
        disproportionation 2B <=> A + C. Re-find the steady state with
        each rate scaled by e^h and compare the difference quotient."""
        from kinetica_tpu import constants
        from kinetica_tpu.solving.steady_state import (
            find_steady_state, steady_state_sensitivities)
        A_s, B_s, C_s = "C=CC=C", "C#CCC", "C1CC=1C"
        sd = SpeciesData([A_s, B_s, C_s])
        rd = RxData.from_reactions(
            sd,
            reacs=[[A_s], [B_s], [B_s], [C_s], [B_s, B_s], [A_s, C_s]],
            prods=[[B_s], [A_s], [C_s], [B_s], [A_s, C_s], [B_s, B_s]])
        A0 = np.array([2.0, 1.0, 1.5, 0.5, 0.8, 0.6]) / constants.N_A
        pars = ODESimulationParams(tspan=(0.0, 1.0), u0={A_s: 1.0},
                                   low_k_cutoff="none")
        conds = ConditionSet({"T": 500.0})

        def solve_with(A_vec):
            calc = PrecalculatedArrheniusCalculator(np.zeros(6), A_vec)
            method = StaticODESolve(pars, conds, calc)
            return method, find_steady_state(method, sd, rd, t_first=0.01,
                                             move_tol=1e-4)

        method0, res0 = solve_with(A0)
        assert res0.converged
        S = steady_state_sensitivities(method0, sd, rd, result=res0)
        assert S.shape == (sd.n, rd.nr)
        assert np.abs(S).max() > 1e-3          # genuinely sensitive
        # conservation: total C4H6 units cannot move
        np.testing.assert_allclose(S.sum(axis=0), 0.0, atol=1e-10)

        h = 1e-4
        for j in range(rd.nr):
            A2 = A0.copy()
            A2[j] *= np.exp(h)
            _, res2 = solve_with(A2)
            assert res2.converged
            fd = (res2.u - res0.u) / h
            np.testing.assert_allclose(
                S[:, j], fd, rtol=0.05,
                atol=5e-3 * max(np.abs(S[:, j]).max(), 1e-12),
                err_msg=f"reaction {j}")
