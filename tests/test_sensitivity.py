"""Forward-sensitivity solves: jacfwd through the chunkwise BDF program.

Validated against central finite differences of independent full solves —
the gold standard for discrete sensitivities.
"""
import numpy as np
import pytest

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.solving.methods import (StaticODESolve, VariableODESolve,
                                          solve_network)
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.solving.sensitivity import (SensitivityProblem,
                                              rank_reactions,
                                              solve_network_sensitivities)
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network


def make_problem(nc=6, variable=True):
    sd, rd, Ea, A = synthetic_pyrolysis_network(nc)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    if variable:
        conditions = ConditionSet(
            {"T": LinearGradientProfile(rate=100.0, X_start=700.0,
                                        X_end=1100.0)},
            ts_update=0.5)
        tf = conditions.get_t_final()
        pars = ODESimulationParams(tspan=(0.0, tf), u0={f"C{nc}": 1.0},
                                   solve_chunks=True, solve_chunkstep=tf / 8,
                                   low_k_cutoff="none")
        method = VariableODESolve(pars, conditions, calc)
    else:
        conditions = ConditionSet({"T": 900.0})
        pars = ODESimulationParams(tspan=(0.0, 2.0), u0={f"C{nc}": 1.0},
                                   solve_chunks=True, solve_chunkstep=0.25,
                                   low_k_cutoff="none")
        method = StaticODESolve(pars, conditions, calc)
    return sd, rd, calc, conditions, pars, method


class TestForwardSensitivity:
    @pytest.mark.parametrize("variable", [True, False])
    def test_matches_finite_differences(self, variable):
        import jax.numpy as jnp

        sd, rd, calc, conditions, pars, method = make_problem(variable=variable)
        rids = [0, 3, 7]
        prob = SensitivityProblem(method, sd, rd, rids=rids)
        sens = prob.solve()
        assert sens.u.shape[0] == sens.t.shape[0]
        assert sens.S.shape == sens.u.shape + (len(rids),)

        # central finite differences of the SAME theta-parameterised solve
        # (k_j -> k_j e^theta_j on the precomputed, k_max-capped table) —
        # isolates differentiation correctness from calculator details
        eps = 1e-4
        for col, rid in enumerate(rids):
            us = []
            for sign in (+1, -1):
                theta = np.zeros(len(rids))
                theta[col] = sign * eps
                ys, status = prob._solve_theta(jnp.asarray(theta),
                                               prob._ktab, prob._u0)
                assert int(status) == 1
                us.append(np.asarray(ys))
            fd = (us[0] - us[1]) / (2 * eps)
            scale = np.abs(sens.S[1:, :, col]).max() + 1e-12
            err = np.abs(sens.S[1:, :, col] - fd).max() / scale
            assert err < 5e-3, (rid, err)

    def test_rank_reactions(self):
        sd, rd, calc, conditions, pars, method = make_problem()
        sens = solve_network_sensitivities(method, sd, rd)
        ranked = rank_reactions(sens, sd, rd, top_n=5)
        assert len(ranked) == 5
        scores = [s for _, s in ranked]
        assert scores == sorted(scores, reverse=True)
        assert scores[0] > 0
        # restricting to the feed species still works
        ranked_sp = rank_reactions(sens, sd, rd, species="C6", top_n=3)
        assert len(ranked_sp) == 3

    def test_rid_validation(self):
        sd, rd, calc, conditions, pars, method = make_problem()
        with pytest.raises(ValueError, match="rids"):
            SensitivityProblem(method, sd, rd, rids=[rd.nr + 5])


def test_save_load_roundtrip(tmp_path):
    from kinetica_tpu.solving.sensitivity import (load_sensitivities,
                                                  save_sensitivities)
    sd, rd, calc, conditions, pars, method = make_problem()
    sens = solve_network_sensitivities(method, sd, rd, rids=[0, 2])
    path = str(tmp_path / "sens.npz")
    save_sensitivities(sens, path)
    back = load_sensitivities(path, rd=sens.rd)
    np.testing.assert_array_equal(back.S, sens.S)
    np.testing.assert_array_equal(back.rids, sens.rids)
    assert back.rd.nr == sens.rd.nr
    # mismatched network detected
    _, rd_small, _, _ = synthetic_pyrolysis_network(4)
    with pytest.raises(ValueError, match="reaction"):
        load_sensitivities(path, rd=rd_small)


def test_sensitivityplot_smoke(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from kinetica_tpu.analysis.plotting import sensitivityplot
    sd, rd, calc, conditions, pars, method = make_problem()
    sens = solve_network_sensitivities(method, sd, rd)
    ax = sensitivityplot(sens, sd, "C6", top_n=3)
    assert len(ax.lines) >= 3  # 3 traces + zero line
    import matplotlib.pyplot as plt
    plt.gcf().savefig(str(tmp_path / "sens.png"))


def test_auto_low_k_cutoff_variable_conditions():
    """Regression: low_k_cutoff="auto" on a fresh VariableODESolve.

    get_max_rates needs solved condition profiles, so SensitivityProblem
    must solve variable conditions BEFORE applying the cutoff (mirroring
    solve_network's ordering) — previously this raised RuntimeError.
    """
    sd, rd, Ea, A = synthetic_pyrolysis_network(5)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    conditions = ConditionSet(
        {"T": LinearGradientProfile(rate=100.0, X_start=700.0,
                                    X_end=1100.0)},
        ts_update=0.5)
    tf = conditions.get_t_final()
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"C5": 1.0},
                               solve_chunks=True, solve_chunkstep=tf / 4,
                               low_k_cutoff="auto")
    method = VariableODESolve(pars, conditions, calc)
    prob = SensitivityProblem(method, sd, rd, rids=[0, 1])
    sens = prob.solve()
    assert np.isfinite(sens.u).all() and np.isfinite(sens.S).all()
