"""Morris elementary-effects screening (analysis/screening.py).

The reference has no global-sensitivity machinery (its analysis layer is
plotting/graph export only, /root/reference/src/analysis/); these tests
pin the first-party screening module: design validity, exact agreement
of an elementary effect with an independently-solved finite difference,
and the discriminating behaviour (rate-limiting step ranks first,
disconnected reaction scores exactly zero).
"""
import numpy as np
import pytest

from kinetica_tpu.analysis.screening import (MorrisResult, morris_design,
                                             morris_screening)
from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.core.network import RxData, SpeciesData
from kinetica_tpu.solving.methods import StaticODESolve, solve_network
from kinetica_tpu.solving.params import ODESimulationParams


def chain_network():
    """A -> B -> C chain (k1 rate-limiting) + a disconnected D -> E.

    With u0 = {A: 1}, final [C] depends strongly on k1, weakly on k2
    (k2 >> k1 already drains B), and not at all on the disconnected
    reaction (D never present).
    """
    sd = SpeciesData(["C", "CC", "CCC", "CCCC", "CCCCC"])  # A B C D E
    rd = RxData.from_reactions(
        sd,
        reacs=[["C"], ["CC"], ["CCCC"]],
        prods=[["CC"], ["CCC"], ["CCCCC"]],
        dH=[0.0, 0.0, 0.0])
    # the calculator applies k = A exp(-Ea/RT) * N_A (calculator.jl:223-232
    # convention); divide N_A back out and pick Ea = 0 so the effective
    # first-order rate constants are exactly [0.5, 50, 1] /s — k1 is
    # rate-limiting at the tf = 2 s horizon (partial conversion).
    from kinetica_tpu import constants
    Ea = np.zeros(3)
    A = np.array([0.5, 50.0, 1.0]) / constants.N_A
    calc = PrecalculatedArrheniusCalculator(Ea, A)
    return sd, rd, calc


def make_method(calc, tf=2.0):
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"C": 1.0},
                               solve_chunks=True, solve_chunkstep=1.0,
                               low_k_cutoff="none")
    return StaticODESolve(pars, ConditionSet({"T": 1000.0}), calc)


class TestMorrisDesign:
    def test_trajectories_are_one_at_a_time(self):
        pts, steps, orders, delta = morris_design(5, 7, n_levels=4, seed=3)
        assert pts.shape == (7, 6, 5)
        assert pts.min() >= 0.0 and pts.max() <= 1.0
        assert delta == pytest.approx(4 / 6)
        for t in range(7):
            # each consecutive pair differs in exactly one coordinate
            moved = set()
            for j in range(5):
                d = pts[t, j + 1] - pts[t, j]
                nz = np.flatnonzero(np.abs(d) > 1e-12)
                assert nz.size == 1
                i = int(nz[0])
                assert i == orders[t, j]
                assert d[i] == pytest.approx(steps[t, i])
                moved.add(i)
            assert moved == set(range(5))  # every coordinate moved once

    def test_odd_levels_rejected(self):
        with pytest.raises(ValueError, match="n_levels"):
            morris_design(3, 2, n_levels=5)


class TestMorrisScreening:
    def test_ranking_and_disconnected_zero(self):
        sd, rd, calc = chain_network()
        res = morris_screening(make_method(calc), sd, rd,
                               objective="CCC", n_trajectories=6,
                               span_decades=1.0, seed=11)
        assert res.failed_points == 0
        # k1 (A->B, rate-limiting) dominates final [C]
        assert res.ranking()[0] == 0
        assert res.mu_star[0] > 5 * res.mu_star[1]
        # increasing k1 increases [C]: positive mean effect
        assert res.mu[0] > 0
        # the disconnected D->E reaction has exactly zero effect
        assert res.mu_star[2] == 0.0
        assert res.sigma[2] == 0.0
        text = res.summarise(sd, rd)
        assert "CC" in text and "mu*" in text

    def test_elementary_effect_matches_independent_solves(self):
        """One EE from the batched sweep == the same finite difference
        computed by two independent solve_network runs with the rate
        constant scaled by hand."""
        sd, rd, calc = chain_network()
        res = morris_screening(make_method(calc), sd, rd, rids=[0, 1],
                               objective="CCC", n_trajectories=1,
                               n_levels=4, span_decades=1.0, seed=5)
        pts, steps, orders, delta = morris_design(2, 1, n_levels=4, seed=5)

        def solve_scaled(x):  # x: unit-hypercube point (2,)
            fac = 10.0 ** ((np.asarray(x) - 0.5) * 1.0)
            _, _, calc2 = chain_network()
            calc2.A = np.array(calc2.A, dtype=float)
            calc2.A[:2] *= fac
            res1 = solve_network(make_method(calc2), sd, rd,
                                 copy_network=True)
            assert res1.sol.success
            return float(np.asarray(res1.sol.u)[-1, sd.toInt["CCC"]])

        j = 0  # first step of the trajectory moves coordinate orders[0, 0]
        i = int(orders[0, j])
        f0 = solve_scaled(pts[0, j])
        f1 = solve_scaled(pts[0, j + 1])
        ee_ref = (f1 - f0) / steps[0, i] / 1.0  # span_decades = 1
        assert res.ee[0, i] == pytest.approx(ee_ref, rel=1e-6, abs=1e-12)

    def test_callable_objective_and_default(self):
        sd, rd, calc = chain_network()

        def selectivity(t, u):
            tot = u[-1, sd.toInt["CC"]] + u[-1, sd.toInt["CCC"]]
            return float(u[-1, sd.toInt["CCC"]] / max(tot, 1e-300))

        res = morris_screening(make_method(calc), sd, rd, rids=[0, 1],
                               objective=selectivity, n_trajectories=3,
                               seed=2)
        assert res.objective_name == "selectivity"
        assert np.all(np.isfinite(res.mu_star))
        # default objective resolves to the last pushed species
        res2 = morris_screening(make_method(calc), sd, rd, rids=[0],
                                n_trajectories=2, seed=2)
        assert "CCCCC" in res2.objective_name

    def test_top_level_export(self):
        import kinetica_tpu as kt
        assert kt.morris_screening is morris_screening
        assert kt.MorrisResult is MorrisResult

    def test_morrisplot(self):
        mpl = pytest.importorskip("matplotlib")
        mpl.use("Agg")
        sd, rd, calc = chain_network()
        res = morris_screening(make_method(calc), sd, rd,
                               objective="CCC", n_trajectories=3, seed=4)
        from kinetica_tpu.analysis.plotting import morrisplot
        ax = morrisplot(res, sd, rd)
        assert ax.get_xlabel().startswith("$\\mu")
        assert len(ax.collections) == 1
