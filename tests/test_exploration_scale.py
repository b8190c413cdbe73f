"""Exploration at scale with the native cde_lite sampler (VERDICT r2 #8).

A seeded, multi-level iterative exploration driven by the first-party C++
graph-move sampler (csrc/cde_lite.cpp), gated by BATCHED ensemble solves
(IterativeExplore.solve_conditions_list -> EnsembleProblem sweep, BASELINE
config 5), reaching a few hundred reactions over >= 2 levels — with the
per-level filesystem checkpoint/restart machinery actually interrupted
mid-run and resumed.

Mirrors the reference's flagship workflow
(/root/reference/src/exploration/methods.jl:150-266) at a scale the mock-CDE
tests (test_exploration.py) do not reach.
"""
import os

import numpy as np
import pytest

from kinetica_tpu import constants
from kinetica_tpu.calculators.base import KineticCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearGradientProfile
from kinetica_tpu.exploration import (CDE, IterativeExplore, explore_network,
                                      find_current_loc)
from kinetica_tpu.exploration.cde_lite import (build_cde_lite,
                                               get_cde_lite_exec,
                                               write_minimal_template)
from kinetica_tpu.solving.methods import VariableODESolve
from kinetica_tpu.solving.params import ODESimulationParams

pytestmark = pytest.mark.skipif(build_cde_lite() is None,
                                reason="g++ unavailable for cde_lite")


class UniformArrhenius(KineticCalculator):
    """One shared (Ea, A) for every reaction; broadcasts over array T so
    it is sweepable by build_condition_sweep."""
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
        k = self.A * jnp.exp(-self.Ea / (constants.R * jnp.asarray(T)))
        return jnp.asarray(k)[..., None] * jnp.ones((self.nr,)) * constants.N_A


def _setup(tmp_path):
    template = write_minimal_template(str(tmp_path / "template"),
                                      nrxn_per_mech=2)
    tf = 10.0
    conds = [ConditionSet({"T": LinearGradientProfile(
        rate=r, X_start=600.0, X_end=600.0 + r * tf)})
        for r in (40.0, 60.0)]
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"CCCCC": 1.0},
                               solve_chunks=True, solve_chunkstep=1.0,
                               low_k_cutoff="none")
    solvemethod = VariableODESolve(pars, conds[0], UniformArrhenius())
    exploremethod = IterativeExplore(
        rdir_head=str(tmp_path / "crn"), reac_smiles=["CCCCC"],
        rxn_convergence_threshold=3, seed_convergence_threshold=2,
        seed_conc=0.02, maxiters=200, max_levels=3,
        cde=CDE(template_dir=template, cde_exec=get_cde_lite_exec(),
                sampling_seed=11, nrxn=8, radius=1,
                parallel_runs=4, parallel_exes=4),
        solve_conditions_list=conds)
    return exploremethod, solvemethod


def test_scale_two_levels_ensemble_gated_with_interrupt_resume(tmp_path):
    exploremethod, solvemethod = _setup(tmp_path)
    savedir = str(tmp_path / "out")

    # --- phase 1: interrupt the run mid-level-2 ---------------------------
    # kill the 3rd sampler invocation INSIDE level 2: level 1 has converged
    # and been checkpointed, level 2 is mid-exploration
    calls = {"lvl2": 0}
    real_call = CDE.__call__

    class Interrupted(RuntimeError):
        pass

    def flaky_call(self, rcount):
        if "level_002" in self.rdir:
            calls["lvl2"] += 1
            if calls["lvl2"] == 3:
                raise Interrupted("simulated crash mid-exploration")
        return real_call(self, rcount)

    CDE.__call__ = flaky_call
    try:
        with pytest.raises(Interrupted):
            explore_network(exploremethod, solvemethod, savedir=savedir)
    finally:
        CDE.__call__ = real_call

    loc = find_current_loc(exploremethod.rdir_head)
    assert loc.level == 2, "interruption should land inside level 2"
    # level 1 converged and checkpointed before the crash
    assert os.path.isfile(os.path.join(
        exploremethod.rdir_head, "level_001", "subspace_001", "isconv"))
    assert os.path.isfile(os.path.join(savedir, "level_network_1-1.npz"))
    lvl1_rcount = os.path.join(
        exploremethod.rdir_head, "level_001", "subspace_001", "rcount")
    rcount_before = open(lvl1_rcount).read()

    # --- phase 2: resume from the filesystem ------------------------------
    res = explore_network(exploremethod, solvemethod, savedir=savedir)

    # resumed, not restarted: the converged level-1 subspace was untouched
    assert open(lvl1_rcount).read() == rcount_before
    loc = find_current_loc(exploremethod.rdir_head)
    assert loc.level == 3                      # ran to the level budget

    # scale: a few hundred reactions across >= 2 levels
    assert res.rd.nr >= 150, f"only {res.rd.nr} reactions explored"
    assert max(res.rd.level_found) >= 2
    assert res.sd.n >= 20

    # ensemble gating ran: per-level seed files + batched checkpoints exist
    assert os.path.isfile(os.path.join(savedir, "seeds_level1.out"))
    assert os.path.isfile(os.path.join(savedir, "level_network_1-3.npz"))
    # next-level seeds were selected from the SWEEP max concentration:
    # level-2 seeds must include the primary homolysis products of the
    # hottest member, not just the seed itself
    with open(os.path.join(savedir, "seeds_level1.out")) as fh:
        seeds_txt = fh.read()
    assert "CCCCC" in seeds_txt
    assert int(seeds_txt.splitlines()[0]) >= 2   # more than just the seed

    # the checkpointed level network round-trips
    from kinetica_tpu.analysis.io import load_output
    out = load_output(os.path.join(savedir, "level_network_1-3.npz"))
    assert out.rd.nr == res.rd.nr
    assert np.isfinite(np.asarray(out.sol.u)).all()
