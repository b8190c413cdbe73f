"""DRG skeletal mechanism reduction (analysis/reduction.py).

Constructs a pyrolysis core plus a deliberately-irrelevant side cluster
(trace isomerisation pair, weakly coupled through a catalytic channel)
and checks the error-controlled reduction drops the cluster while
reproducing the target profiles.
"""
import numpy as np
import pytest

from kinetica_tpu.analysis.reduction import (DRGReductionResult,
                                             drg_adjacency, drg_select,
                                             drgep_adjacency,
                                             drgep_coefficients,
                                             reduce_at_eps,
                                             reduce_at_eps_drgep,
                                             reduce_network_drg,
                                             reduce_network_drgep)
from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.core.network import RxData, SpeciesData
from kinetica_tpu.solving.methods import StaticODESolve, solve_network
from kinetica_tpu.solving.params import ODESimulationParams


def network_with_junk():
    """6-species pyrolysis core + 2-species trace isomer cluster."""
    sd = SpeciesData(["C", "[H]", "[CH3]", "[H][H]", "CC", "C=C",
                      "CCO", "COC"])
    reacs = [["C"], ["[CH3]", "[H]"], ["C", "[H]"], ["[CH3]", "[CH3]"],
             ["CC"], ["CC"],
             # junk: trace isomerisation + a catalytic coupling to CC
             ["CCO"], ["COC"], ["CC", "CCO"]]
    prods = [["[CH3]", "[H]"], ["C"], ["[CH3]", "[H][H]"], ["CC"],
             ["C=C", "[H][H]"], ["[CH3]", "[CH3]"],
             ["COC"], ["CCO"], ["CC", "COC"]]
    rd = RxData.from_reactions(sd, reacs, prods, dH=[0.0] * len(reacs))
    Ea = np.array([3.6e5, 0.0, 4.0e4, 0.0, 3.2e5, 3.5e5,
                   8.0e4, 8.0e4, 8.0e4])
    A = np.array([1e-8, 1e-12, 1e-13, 1e-12, 1e-7, 1e-8,
                  1e-16, 1e-16, 1e-18])
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    return sd, rd, calc


def solvemethod(calc):
    pars = ODESimulationParams(tspan=(0.0, 10.0), u0={"C": 1.0,
                                                      "CCO": 1e-6},
                               solve_chunks=False, save_interval=0.2)
    return StaticODESolve(pars, ConditionSet({"T": 900.0}), calc)


class TestDRGPieces:
    def test_adjacency_shape_and_range(self):
        sd, rd, calc = network_with_junk()
        out = solve_network(solvemethod(calc), sd, rd)
        r = drg_adjacency(out, calc=calc)
        assert r.shape == (sd.n, sd.n)
        assert np.all(r >= 0.0) and np.all(r <= 1.0 + 1e-12)
        assert np.all(np.diag(r) == 0.0)
        # methane's consumption is dominated by reactions involving [CH3]
        assert r[sd.toInt["C"], sd.toInt["[CH3]"]] > 0.5
        # methane couples to the trace cluster only below the junk level
        assert r[sd.toInt["C"], sd.toInt["CCO"]] < 1e-3

    def test_select_reachability(self):
        r = np.zeros((4, 4))
        r[0, 1] = 0.5            # 0 -> 1 strong
        r[1, 2] = 0.2            # 1 -> 2 medium
        r[2, 3] = 0.01           # 2 -> 3 weak
        keep = drg_select(r, [0], eps=0.1)
        assert keep.tolist() == [True, True, True, False]
        keep = drg_select(r, [0], eps=0.6)
        assert keep.tolist() == [True, False, False, False]

    def test_reduce_at_eps_drops_partial_reactions(self):
        sd, rd, calc = network_with_junk()
        out = solve_network(solvemethod(calc), sd, rd)
        r = drg_adjacency(out, calc=calc)
        red = reduce_at_eps(r, rd, [sd.toInt["CC"]], eps=1e-2)
        # every kept reaction's species are all kept
        for j in red.keep_rids:
            assert all(red.keep_species[s] for s in rd.id_reacs[j])
            assert all(red.keep_species[s] for s in rd.id_prods[j])


class TestReduceNetwork:
    def test_drops_junk_within_tolerance(self):
        sd, rd, calc = network_with_junk()
        res = reduce_network_drg(solvemethod(calc), sd, rd,
                                 targets=["CC", "C=C"], tol=1e-6)
        red = res.reduction
        assert isinstance(res, DRGReductionResult)
        assert res.error <= 1e-6
        # the trace isomer cluster is gone (junk reactions dropped);
        # the 6 core reactions survive
        assert red.n_reactions < rd.nr
        assert red.n_reactions >= 6
        kept_sp = {sd.toStr[i] for i in np.nonzero(red.keep_species)[0]}
        assert {"C", "[CH3]", "[H]", "CC"} <= kept_sp
        junk_rids = set(range(6, 9))
        assert not (set(red.keep_rids) & junk_rids)

    def test_apply_and_resolve_matches_full(self):
        sd, rd, calc = network_with_junk()
        res = reduce_network_drg(solvemethod(calc), sd, rd,
                                 targets=["CC"], tol=1e-6)
        rd2, calc2 = res.reduction.apply(rd, calc)
        assert rd2.nr == res.reduction.n_reactions
        assert calc2.Ea.shape[0] == rd2.nr
        out2 = solve_network(solvemethod(calc2), sd, rd2)
        u2 = np.asarray(out2.sol.u)
        u1 = np.asarray(res.full_output.sol.u)
        tid = sd.toInt["CC"]
        assert np.abs(u2[:, tid] - u1[:, tid]).max() <= 1e-6
        # original objects untouched
        assert rd.nr == 9 and calc.Ea.shape[0] == 9

    def test_compact_renumbers(self):
        sd, rd, calc = network_with_junk()
        res = reduce_network_drg(solvemethod(calc), sd, rd,
                                 targets=["CC"], tol=1e-6)
        sd2, rd2, smap = res.reduction.compact(sd, rd)
        assert sd2.n == res.reduction.n_species
        assert rd2.nr == res.reduction.n_reactions
        # id maps are consistent: each compacted reaction matches the
        # original through smap
        for new_j, old_j in enumerate(res.reduction.keep_rids):
            old_ids = sorted(smap[s] for s in rd.id_reacs[old_j])
            assert sorted(rd2.id_reacs[new_j]) == old_ids

    def test_unreachable_tolerance_raises(self):
        sd, rd, calc = network_with_junk()
        with pytest.raises(ValueError, match="could not meet"):
            reduce_network_drg(solvemethod(calc), sd, rd,
                               targets=["CC"], tol=1e-30,
                               eps_ladder=[0.5, 0.4])


class TestDRGEP:
    def test_adjacency_range_and_cancellation(self):
        sd, rd, calc = network_with_junk()
        out = solve_network(solvemethod(calc), sd, rd)
        r = drgep_adjacency(out, calc=calc)
        assert r.shape == (sd.n, sd.n)
        assert np.all(r >= 0.0) and np.all(r <= 1.0 + 1e-12)
        assert np.all(np.diag(r) == 0.0)
        # DRGEP's net-flux coefficient never exceeds DRG's gross one
        # by more than numerical noise on a per-edge basis is NOT
        # guaranteed in general (different denominators), but on this
        # network the dominant CH4<->CH3 coupling must survive
        assert r[sd.toInt["C"], sd.toInt["[CH3]"]] > 0.5

    def test_path_product_dijkstra(self):
        # chain 0 -> 1 -> 2 with a weak shortcut 0 -> 2: the max-product
        # path 0.8*0.5 = 0.4 beats the direct 0.3 edge
        r = np.zeros((3, 3))
        r[0, 1] = 0.8
        r[1, 2] = 0.5
        r[0, 2] = 0.3
        R = drgep_coefficients(r, [0])
        assert R[0] == 1.0
        assert np.isclose(R[1], 0.8)
        assert np.isclose(R[2], 0.4)

    def test_geometric_damping_vs_drg(self):
        # DRG keeps anything reachable through eps-strong edges; DRGEP
        # damps along the path: a chain of 0.3 edges dies after a few
        # hops at eps=0.01 where DRG at the same eps keeps it all
        n = 8
        r = np.zeros((n, n))
        for i in range(n - 1):
            r[i, i + 1] = 0.3
        keep_drg = drg_select(r, [0], eps=0.01)
        assert keep_drg.all()
        R = drgep_coefficients(r, [0])
        keep_ep = R >= 0.01
        # 0.3^4 = 8.1e-3 < eps: species 5+ are dropped
        assert keep_ep[:4].all() and not keep_ep[5:].any()

    def test_reduce_network_drgep_drops_junk(self):
        sd, rd, calc = network_with_junk()
        res = reduce_network_drgep(solvemethod(calc), sd, rd,
                                   targets=["CC", "C=C"], tol=1e-6)
        assert res.method == "drgep"
        assert res.error <= 1e-6
        assert res.reduction.n_reactions < rd.nr
        junk_rids = set(range(6, 9))
        assert not (set(res.reduction.keep_rids) & junk_rids)
        assert "DRGEP" in res.summary()

    def test_drgep_no_larger_than_drg(self):
        # on the junk network at equal tolerance, DRGEP's accepted
        # mechanism is never larger than DRG's
        sd, rd, calc = network_with_junk()
        res_drg = reduce_network_drg(solvemethod(calc), sd, rd,
                                     targets=["CC"], tol=1e-6)
        res_ep = reduce_network_drgep(solvemethod(calc), sd, rd,
                                      targets=["CC"], tol=1e-6,
                                      full_output=res_drg.full_output)
        assert res_ep.reduction.n_reactions <= res_drg.reduction.n_reactions

    def test_bad_method_raises(self):
        sd, rd, calc = network_with_junk()
        with pytest.raises(ValueError, match="method"):
            reduce_network_drg(solvemethod(calc), sd, rd, targets=["CC"],
                               method="cuteness")
