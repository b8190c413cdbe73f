"""Reaction flux analysis (analysis/flux.py).

The load-bearing check is the flux/production identity: integrating the
per-reaction fluxes against the stoichiometry must reconstruct the
species change over the trajectory (past the first save interval, which
absorbs the sub-grid pre-equilibrium spike of any stiff startup), for
both the discrete formalism (k from the solve's own stored rate table)
and the continuous one (k re-evaluated from the calculator at the saved
condition traces).
"""
import numpy as np
import pytest

from kinetica_tpu.analysis.flux import (FluxResult, reaction_fluxes,
                                        species_flux_balance)
from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.solving.methods import (StaticODESolve, VariableODESolve,
                                          solve_network)
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network


def _setup(nc=6):
    sd, rd, Ea, A = synthetic_pyrolysis_network(nc)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    return sd, rd, calc


def _pars(tf=4.0, n_save=200):
    return ODESimulationParams(tspan=(0.0, tf), u0={"C6": 1.0},
                               solve_chunks=True, solve_chunkstep=tf / 4,
                               save_interval=tf / n_save,
                               low_k_cutoff="none")


class TestReactionFluxes:
    def test_static_solve_continuous_k(self):
        sd, rd, calc = _setup()
        out = solve_network(StaticODESolve(_pars(), ConditionSet({"T": 550.0}),
                                           calc), sd, rd, copy_network=True)
        flux = reaction_fluxes(out, calc=calc)
        assert flux.rates.shape == (len(out.sol.t), out.rd.nr)
        assert flux.identity_error < 1e-4
        # feed consumption must be dominated by C6-consuming reactions
        top_rid, top_val = species_flux_balance(flux, out, "C6", n=1)[0]
        assert top_val < 0.0
        assert out.sd.toInt["C6"] in out.rd.id_reacs[top_rid]

    def test_discrete_solve_stored_table(self):
        sd, rd, calc = _setup()
        cs = ConditionSet({"T": LinearGradientProfile(
            rate=10.0, X_start=520.0, X_end=560.0)}, ts_update=0.1)
        out = solve_network(VariableODESolve(_pars(), cs, calc), sd, rd,
                            copy_network=True)
        assert out.sol_k is not None
        flux = reaction_fluxes(out)          # no calc: uses the table
        assert flux.identity_error < 0.05

    def test_continuous_variable_k_reevaluated(self):
        sd, rd, calc = _setup()
        cs = ConditionSet({"T": LinearGradientProfile(
            rate=10.0, X_start=520.0, X_end=560.0)})
        out = solve_network(VariableODESolve(_pars(), cs, calc), sd, rd,
                            copy_network=True)
        assert out.sol_k is None             # continuous: no stored table
        with pytest.raises(ValueError, match="calculator"):
            reaction_fluxes(out)
        flux = reaction_fluxes(out, calc=calc)
        assert flux.identity_error < 1e-3
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
        with pytest.raises(ValueError, match="save grid"):
            reaction_fluxes(out, calc=calc)
        flux = reaction_fluxes(out, calc=calc, check=False)
        assert np.isfinite(flux.extent).all()

    def test_fluxplot_smoke(self):
        mpl = pytest.importorskip("matplotlib")
        mpl.use("Agg")
        sd, rd, calc = _setup()
        out = solve_network(StaticODESolve(_pars(), ConditionSet({"T": 550.0}),
                                           calc), sd, rd, copy_network=True)
        from kinetica_tpu.analysis.plotting import fluxplot
        ax = fluxplot(out, calc=calc, top_n=4)
        assert len(ax.get_lines()) == 4
