"""Reaction flux analysis (analysis/flux.py).

The load-bearing property is flux/production consistency: integrating
the per-reaction fluxes against the stoichiometry must reconstruct the
species change over the trajectory. Two regimes are pinned:

* resolved dynamics — the plain trapezoid attribution reconstructs du
  within save-grid error (and the projected attribution agrees with it,
  its corrections being negligible);
* sub-grid transients (the synthetic pyrolysis feed burns its entire
  startup inside one save interval at any practical grid) — the
  trapezoid guards REFUSE (round-3 regression: its extents silently
  overstated the burst channels by ~1e4-1e5x before the startup guard),
  while the projected attribution reconstructs every interval's net
  change exactly and keeps extents physically bounded.
"""
import numpy as np
import pytest

from kinetica_tpu.analysis.flux import (FluxResult, reaction_fluxes,
                                        species_flux_balance)
from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.core.network import RxData, SpeciesData
from kinetica_tpu.solving.methods import (StaticODESolve, VariableODESolve,
                                          solve_network)
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network
from kinetica_tpu import constants


def _setup(nc=6):
    sd, rd, Ea, A = synthetic_pyrolysis_network(nc)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    return sd, rd, calc


def _pars(tf=4.0, n_save=200):
    return ODESimulationParams(tspan=(0.0, tf), u0={"C6": 1.0},
                               solve_chunks=True, solve_chunkstep=tf / 4,
                               save_interval=tf / n_save,
                               low_k_cutoff="none")


def _resolved_setup():
    """A -> B -> C chain with O(1/s) rates: fully grid-resolvable."""
    sd = SpeciesData(["C", "CC", "CCC"])
    rd = RxData.from_reactions(sd, reacs=[["C"], ["CC"]],
                               prods=[["CC"], ["CCC"]], dH=[0.0, 0.0])
    calc = PrecalculatedArrheniusCalculator(
        np.zeros(2), np.array([0.5, 1.5]) / constants.N_A)
    pars = ODESimulationParams(tspan=(0.0, 2.0), u0={"C": 1.0},
                               solve_chunks=False, save_interval=0.01,
                               low_k_cutoff="none")
    return sd, rd, calc, StaticODESolve(pars, ConditionSet({"T": 500.0}),
                                        calc)


class TestResolvedDynamics:
    def test_trapezoid_identity_holds(self):
        sd, rd, calc, method = _resolved_setup()
        out = solve_network(method, sd, rd, copy_network=True)
        flux = reaction_fluxes(out, calc=calc)
        assert flux.rates.shape == (len(out.sol.t), rd.nr)
        assert flux.identity_error < 1e-4
        assert flux.startup_error < 1e-4
        u = np.asarray(out.sol.u)
        assert np.allclose(flux.net_production, u[-1] - u[0], atol=1e-4)
        # A's consumption is carried by reaction 0 alone
        top_rid, top_val = species_flux_balance(flux, out, "C", n=1)[0]
        assert top_rid == 0 and top_val < 0.0

    def test_projected_agrees_when_resolved(self):
        sd, rd, calc, method = _resolved_setup()
        out = solve_network(method, sd, rd, copy_network=True)
        f_trap = reaction_fluxes(out, calc=calc)
        f_proj = reaction_fluxes(out, calc=calc, attribution="projected")
        # projection is a no-op (to grid error) when the grid resolves
        assert np.allclose(f_proj.extent, f_trap.extent, rtol=1e-3,
                           atol=1e-6)
        # ... and exactly net-consistent
        u = np.asarray(out.sol.u)
        assert np.allclose(f_proj.net_production, u[-1] - u[0], atol=1e-12)


class TestSubGridBurst:
    def test_trapezoid_startup_guard_raises(self):
        # the saturated pyrolysis feed converts inside the first save
        # interval at any practical grid: extents would be artifacts
        sd, rd, calc = _setup()
        out = solve_network(StaticODESolve(_pars(), ConditionSet({"T": 550.0}),
                                           calc), sd, rd, copy_network=True)
        with pytest.raises(ValueError, match="startup"):
            reaction_fluxes(out, calc=calc)
        flux = reaction_fluxes(out, calc=calc, check=False)
        assert flux.startup_error > 0.5          # recorded diagnostic

    def test_projected_extents_bounded(self):
        sd, rd, calc = _setup()
        out = solve_network(StaticODESolve(_pars(), ConditionSet({"T": 550.0}),
                                           calc), sd, rd, copy_network=True)
        flux = reaction_fluxes(out, calc=calc, attribution="projected")
        u = np.asarray(out.sol.u)
        # net reconstruction incl. across the burst, exact up to the
        # solve's own conservation drift (du components outside
        # row-space(N) are unmatchable by any flux attribution)
        assert np.allclose(flux.net_production, u[-1] - u[0], atol=1e-8)
        # C6 fission extents total what the feed can supply (~1.0), not
        # the ~1e4-1e5x trapezoid artifact
        c6 = out.sd.toInt["C6"]
        fission = [j for j in range(out.rd.nr)
                   if c6 in out.rd.id_reacs[j]]
        total = sum(abs(flux.extent[j]) for j in fission)
        assert total < 10.0
        # trapezoid artifact really was that large (regression witness)
        f_bad = reaction_fluxes(out, calc=calc, check=False)
        assert sum(abs(f_bad.extent[j]) for j in fission) > 1e3

    def test_discrete_solve_stored_table(self):
        sd, rd, calc = _setup()
        cs = ConditionSet({"T": LinearGradientProfile(
            rate=10.0, X_start=520.0, X_end=560.0)}, ts_update=0.1)
        out = solve_network(VariableODESolve(_pars(), cs, calc), sd, rd,
                            copy_network=True)
        assert out.sol_k is not None
        flux = reaction_fluxes(out, attribution="projected")  # stored table
        u = np.asarray(out.sol.u)
        assert np.allclose(flux.net_production, u[-1] - u[0], atol=1e-8)

    def test_continuous_variable_k_reevaluated(self):
        sd, rd, calc = _setup()
        cs = ConditionSet({"T": LinearGradientProfile(
            rate=10.0, X_start=520.0, X_end=560.0)})
        out = solve_network(VariableODESolve(_pars(), cs, calc), sd, rd,
                            copy_network=True)
        assert out.sol_k is None             # continuous: no stored table
        with pytest.raises(ValueError, match="calculator"):
            reaction_fluxes(out)
        flux = reaction_fluxes(out, calc=calc, attribution="projected")
        assert isinstance(flux, FluxResult)
        # top() is |extent|-sorted
        tops = flux.top(5)
        vals = [abs(v) for _, v in tops]
        assert vals == sorted(vals, reverse=True)

    def test_coarse_grid_check_raises(self):
        # hot + saturated: the whole conversion lands inside one save
        # interval, which no grid-level integration can represent
        sd, rd, calc = _setup()
        out = solve_network(StaticODESolve(_pars(tf=1.0, n_save=4),
                                           ConditionSet({"T": 900.0}), calc),
                            sd, rd, copy_network=True)
        with pytest.raises(ValueError, match="save grid|startup"):
            reaction_fluxes(out, calc=calc)
        flux = reaction_fluxes(out, calc=calc, check=False)
        assert np.isfinite(flux.extent).all()

    def test_bad_attribution_rejected(self):
        sd, rd, calc, method = _resolved_setup()
        out = solve_network(method, sd, rd, copy_network=True)
        with pytest.raises(ValueError, match="attribution"):
            reaction_fluxes(out, calc=calc, attribution="magic")


class TestFluxPlot:
    def test_fluxplot_smoke(self):
        mpl = pytest.importorskip("matplotlib")
        mpl.use("Agg")
        sd, rd, calc = _setup()
        out = solve_network(StaticODESolve(_pars(), ConditionSet({"T": 550.0}),
                                           calc), sd, rd, copy_network=True)
        from kinetica_tpu.analysis.plotting import fluxplot
        ax = fluxplot(out, calc=calc, top_n=4, attribution="projected")
        assert len(ax.get_lines()) == 4
