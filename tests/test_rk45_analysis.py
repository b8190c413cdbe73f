"""RK45 solver, plotting recipes, and graph export tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from kinetica_tpu.analysis.graph import Graph, savegraph
from kinetica_tpu.calculators.builtin import DummyKineticCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.core.network import RxData, SpeciesData
from kinetica_tpu.ops.rk45 import DONE, rk45_solve
from kinetica_tpu.solving.methods import StaticODESolve, solve_network
from kinetica_tpu.solving.params import ODESimulationParams


class TestRK45:
    def test_exponential_decay(self):
        sv = jnp.linspace(0.1, 2.0, 20)
        res = rk45_solve(lambda t, y: -y, jnp.array([1.0]), 0.0, 2.0, sv,
                         rtol=1e-9, atol=1e-12)
        assert int(res.status) == DONE
        np.testing.assert_allclose(np.asarray(res.ys[:, 0]),
                                   np.exp(-np.asarray(sv)), rtol=1e-7)

    def test_van_der_pol_vs_scipy(self):
        from scipy.integrate import solve_ivp

        def vdp(t, y):
            return jnp.array([y[1], (1 - y[0] ** 2) * y[1] - y[0]])

        sv = jnp.linspace(0.5, 10.0, 20)
        res = rk45_solve(vdp, jnp.array([2.0, 0.0]), 0.0, 10.0, sv,
                         rtol=1e-9, atol=1e-12)
        sp = solve_ivp(lambda t, y: np.asarray(vdp(t, jnp.asarray(y))),
                       (0, 10), [2.0, 0.0], rtol=1e-11, atol=1e-13,
                       t_eval=np.asarray(sv), method="RK45")
        assert int(res.status) == DONE
        np.testing.assert_allclose(np.asarray(res.ys), sp.y.T,
                                   rtol=1e-5, atol=1e-7)

    def test_solve_network_rk45_matches_bdf(self):
        sd = SpeciesData(["A", "B", "C"])
        rd = RxData.from_reactions(sd, [["A"], ["B"], ["B", "B"]],
                                   [["B"], ["A"], ["C"]])
        outs = {}
        for solver in ["bdf", "rk45"]:
            pars = ODESimulationParams(
                tspan=(0.0, 10.0), u0={"A": 1.0}, solver=solver,
                solve_chunks=True, solve_chunkstep=1.0,
                reltol=1e-9, abstol=1e-12, low_k_cutoff="none")
            calc = DummyKineticCalculator(np.array([1.0, 0.5, 0.3]))
            res = solve_network(
                StaticODESolve(pars, ConditionSet({"T": 300.0}), calc), sd, rd)
            assert res.sol.success
            outs[solver] = res.sol.u
        assert np.max(np.abs(outs["bdf"] - outs["rk45"])) < 1e-7


def _small_result():
    sd = SpeciesData(["A", "B", "C"])
    rd = RxData.from_reactions(sd, [["A"], ["B", "B"]], [["B"], ["C"]],
                               dH=[1.0, -2.0])
    pars = ODESimulationParams(tspan=(0.0, 5.0), u0={"A": 1.0},
                               solve_chunks=False, save_interval=0.5,
                               low_k_cutoff="none")
    calc = DummyKineticCalculator(np.array([1.0, 0.4]))
    res = solve_network(StaticODESolve(pars, ConditionSet({"T": 300.0}), calc),
                        sd, rd)
    return res


class TestPlotting:
    def test_plot_recipes(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        from kinetica_tpu.analysis.plotting import (conditionsplot,
                                                    finalconcplot,
                                                    plot_solution)
        res = _small_result()
        ax = plot_solution(res, label_above=0.01)
        assert len(ax.lines) == 3
        ax2 = finalconcplot(res, n_top=3, mode="percent")
        assert len(ax2.patches) == 3
        with pytest.raises(ValueError):
            finalconcplot(res, mode="bogus")
        # conditionsplot requires a variable condition
        from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
        from kinetica_tpu.conditions.profiles import LinearGradientProfile
        from kinetica_tpu.solving.methods import VariableODESolve
        sd = SpeciesData(["A", "B"])
        rd = RxData.from_reactions(sd, [["A"]], [["B"]])
        cs = ConditionSet({"T": LinearGradientProfile(rate=10.0, X_start=300.0,
                                                      X_end=400.0)})
        pars = ODESimulationParams(tspan=(0.0, 10.0), u0={"A": 1.0},
                                   solve_chunks=False, low_k_cutoff="none")
        calc = PrecalculatedArrheniusCalculator(np.array([1e4]), np.array([1e-22]))
        vres = solve_network(VariableODESolve(pars, cs, calc), sd, rd)
        ax3 = conditionsplot(vres, "T")
        assert "Temperature" in ax3.get_ylabel()


class TestGraph:
    def test_dot_export(self, tmp_path):
        res = _small_result()
        g = Graph(res.sd, res.rd, use_smiles=True)
        dot = g.to_dot()
        assert dot.startswith("digraph G {")
        assert '"A" -> "R₁"' in dot
        assert 'label="2"' in dot  # stoichiometry 2 on B + B -> C
        assert 'level="1"' in dot
        path = savegraph(g, str(tmp_path / "crn.dot"))
        assert open(path).read() == dot

    def test_inactive_species_pruned(self):
        sd = SpeciesData(["A", "B", "Zombie"])
        rd = RxData.from_reactions(sd, [["A"]], [["B"]])
        g = Graph(sd, rd)
        assert len(g.active_species()) == 2
        g_all = Graph(sd, rd, remove_inactive_species=False)
        assert len(g_all.active_species()) == 3
