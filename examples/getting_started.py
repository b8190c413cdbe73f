#!/usr/bin/env python
"""Getting started: explore a CRN and simulate its kinetics.

The TPU-native counterpart of the reference's getting-started tutorial
(/root/reference/docs/src/getting-started.md): define conditions ->
simulation parameters -> exploration parameters -> calculator, then run
``explore_network`` and analyse the results.

Run from the repository root:
    python examples/getting_started.py

Uses the bundled mock CDE (examples/mock_cde.py) so no external Fortran/xTB
binaries are needed; swap ``cde_exec`` for a real CDE build to sample real
chemistry.
"""
import os
import sys

# Allow running straight from a source checkout ("python examples/...").
# The checkout is deliberately PREPENDED so it wins over any installed
# copy; existing PYTHONPATH entries (e.g. environment sitecustomize
# paths) are preserved, with no empty entries introduced.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_repo] + [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
               if p])
import tempfile

import numpy as np

import kinetica_tpu  # noqa: F401  (enables x64)
from kinetica_tpu.analysis.io import save_output
from kinetica_tpu.analysis.plotting import (conditionsplot, finalconcplot,
                                            plot_solution)
from kinetica_tpu.calculators.base import KineticCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.exploration import CDE, DirectExplore, explore_network
from kinetica_tpu.solving.methods import VariableODESolve
from kinetica_tpu.solving.params import ODESimulationParams


class UniformArrhenius(KineticCalculator):
    """Toy on-the-fly calculator: one shared (Ea, A) for every reaction.

    Real workflows use PrecalculatedArrheniusCalculator (with parameters
    from e.g. kinetica_tpu.analysis.bson_compat.load_arrhenius_params) or
    the ASE-NEB TST calculator.
    """
    allows_continuous = True

    def __init__(self, Ea=8e4, A=1e-13):
        self.Ea, self.A = Ea, A

    def setup_network(self, sd, rd):
        self.nr = rd.nr

    def splice(self, rids):
        pass

    def has_conditions(self, symbols):
        return all(s in ("T",) for s in symbols)

    def __call__(self, T, **_):
        import jax.numpy as jnp
        from kinetica_tpu import constants
        k = self.A * jnp.exp(-self.Ea / (constants.R * jnp.asarray(T)))
        return jnp.full((self.nr,), 1.0) * k * constants.N_A


def main():
    workdir = tempfile.mkdtemp(prefix="kinetica_getting_started_")
    print(f"Working in {workdir}")

    # 1. Conditions: 500 -> 1200 K linear ramp at 50 K/s
    conditions = ConditionSet({
        "T": LinearGradientProfile(rate=50.0, X_start=500.0, X_end=1200.0)})

    # 2. Simulation parameters
    pars = ODESimulationParams(
        tspan=(0.0, conditions.get_t_final()),
        u0={"CC": 1.0},
        solve_chunks=True, solve_chunkstep=0.5)

    # 3. Exploration parameters (mock CDE)
    mock = os.path.join(os.path.dirname(__file__), "mock_cde.py")
    template = os.path.join(workdir, "template")
    os.makedirs(template)
    with open(os.path.join(template, "input"), "w") as fh:
        fh.write("pestype mock\n")
    exploremethod = DirectExplore(
        rdir_head=os.path.join(workdir, "crn"),
        reac_smiles=["CC"],
        rxn_convergence_threshold=3,
        cde=CDE(template_dir=template, cde_exec=mock, sampling_seed=1))

    # 4. Calculator + solve method
    solvemethod = VariableODESolve(pars, conditions, UniformArrhenius())

    # 5. Explore + simulate
    res = explore_network(exploremethod, solvemethod,
                          savedir=os.path.join(workdir, "out"))

    # 6. Analysis
    print(f"\nCRN: {res.sd.n} species, {res.rd.nr} reactions")
    from kinetica_tpu.core.network import format_rxn
    for i in range(min(res.rd.nr, 8)):
        print("  ", format_rxn(res.sd, res.rd, i))
    print("final concentrations:",
          {res.sd.toStr[i]: round(float(res.sol.u[-1, i]), 4)
           for i in range(res.sd.n)})

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plot_solution(res, label_above=0.01)
        plt.savefig(os.path.join(workdir, "kinetics.png"), dpi=120)
        conditionsplot(res, "T")
        plt.savefig(os.path.join(workdir, "Tprofile.png"), dpi=120)
        finalconcplot(res, n_top=8)
        plt.savefig(os.path.join(workdir, "final_concs.png"), dpi=120)
        print(f"Plots written to {workdir}")
    except ImportError:
        pass

    save_output(res, os.path.join(workdir, "results.npz"))
    print(f"Results saved to {workdir}/results.npz")


if __name__ == "__main__":
    main()
