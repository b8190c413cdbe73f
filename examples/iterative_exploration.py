#!/usr/bin/env python
"""Kinetics-gated iterative CRN exploration with the native sampler.

BASELINE config 5 end-to-end: level-by-level mechanism growth where each
level's seed species are chosen from an on-device kinetic solve of the
network explored so far — the reference's flagship workflow
(/root/reference/src/exploration/methods.jl:150-266), driven here by the
first-party C++ reaction sampler (csrc/cde_lite.cpp, same file contract
as the external CDE Fortran binary) instead of CDE/xTB, and by batched
TPU BDF solves instead of CPU CVODE.

    python examples/iterative_exploration.py

Everything is restartable from the run directory tree (rcount counters,
isconv markers, per-level checkpoints) exactly as in the reference.
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
from kinetica_tpu.calculators.base import KineticCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.exploration import CDE, IterativeExplore, explore_network
from kinetica_tpu.exploration.cde_lite import (build_cde_lite,
                                               get_cde_lite_exec,
                                               write_minimal_template)
from kinetica_tpu.solving.methods import VariableODESolve
from kinetica_tpu.solving.params import ODESimulationParams


class UniformArrhenius(KineticCalculator):
    """Toy on-the-fly calculator: one shared (Ea, A) for every reaction.

    A is chosen so k stays physically moderate (the N_A convention makes
    bimolecular prefactors ~1e-13); an unphysically hot calculator makes
    the stiff solve grind at max_steps-scale step counts, which on a
    remote-attached TPU can exceed the worker's per-dispatch deadline.
    """
    allows_continuous = True

    def __init__(self, Ea=8.0e4, A=1.0e-13):
        self.Ea, self.A, self.nr = Ea, A, 0

    def setup_network(self, sd, rd):
        self.nr = rd.nr

    def splice(self, rids):
        pass

    def has_conditions(self, symbols):
        return all(s == "T" for s in symbols)

    def __call__(self, T, **_):
        import jax.numpy as jnp
        from kinetica_tpu import constants
        k = self.A * jnp.exp(-self.Ea / (constants.R * jnp.asarray(T)))
        # broadcast over array-valued T: condition sweeps evaluate the
        # calculator on a whole tstop grid at once -> (..., nr) tables
        return jnp.asarray(k)[..., None] * jnp.ones((self.nr,)) * constants.N_A


def main():
    if build_cde_lite() is None:
        raise SystemExit("g++ unavailable: cannot build the native sampler")
    workdir = tempfile.mkdtemp(prefix="kinetica_iterative_")
    template = write_minimal_template(os.path.join(workdir, "template"),
                                      nrxn_per_mech=2)

    # a SWEEP of ramp rates gates every level (BASELINE config 5): the
    # per-level kinetic simulation is one vmapped batched device solve and
    # next-level seeds are species that matter under ANY swept condition
    tf = 10.0
    conditions_list = [
        ConditionSet({"T": LinearGradientProfile(
            rate=r, X_start=600.0, X_end=600.0 + r * tf)})
        for r in (40.0, 60.0, 80.0)]
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"CC": 1.0},
                               solve_chunks=True, solve_chunkstep=tf / 10,
                               low_k_cutoff="none")
    solvemethod = VariableODESolve(pars, conditions_list[0],
                                   UniformArrhenius())

    exploremethod = IterativeExplore(
        rdir_head=os.path.join(workdir, "crn"),
        reac_smiles=["CC"],
        rxn_convergence_threshold=2,
        seed_convergence_threshold=2,
        seed_conc=0.05,
        max_levels=4,
        solve_conditions_list=conditions_list,
        cde=CDE(template_dir=template, cde_exec=get_cde_lite_exec(),
                sampling_seed=7, nrxn=4, radius=1))

    res = explore_network(exploremethod, solvemethod,
                          savedir=os.path.join(workdir, "out"))

    sd, rd = res.sd, res.rd
    print(f"\nExplored CRN: {sd.n} species, {rd.nr} reactions")
    u_final = np.asarray(res.sol.u)[-1]
    order = np.argsort(u_final)[::-1]
    print("Top species by final concentration:")
    for sid in order[:8]:
        if u_final[sid] > 1e-12:
            print(f"  {sd.toStr[sid]:24s} {u_final[sid]:.4g}")
    print(f"\nRun tree (restartable): {os.path.join(workdir, 'crn')}")


if __name__ == "__main__":
    main()
