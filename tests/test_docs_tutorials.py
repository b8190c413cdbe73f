"""Executable documentation: run every Python block in docs/tutorials/*.md.

The reference builds its tutorials as executed documentation
(/root/reference/docs/make.jl) so code drift is impossible; this is the
same guarantee for this repo's docs. Each tutorial's blocks run in order
inside one namespace seeded with the small objects the prose assumes
(network, calculator, conditions, a solved result), in a temp cwd.
"""
import os
import pathlib
import re

import matplotlib
import numpy as np
import pytest

matplotlib.use("Agg")

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs" / "tutorials"


def extract_blocks(path: pathlib.Path):
    return re.findall(r"```python\n(.*?)```", path.read_text(), re.S)


def small_crn():
    from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
    from kinetica_tpu.core.network import RxData, SpeciesData
    sd = SpeciesData(["C", "[H]", "[CH3]", "[H][H]", "CC", "C=C"])
    rd = RxData.from_reactions(
        sd,
        reacs=[["C"], ["[CH3]", "[H]"], ["C", "[H]"], ["[CH3]", "[CH3]"],
               ["CC"], ["CC"]],
        prods=[["[CH3]", "[H]"], ["C"], ["[CH3]", "[H][H]"], ["CC"],
               ["C=C", "[H][H]"], ["[CH3]", "[CH3]"]],
        dH=[4.5, -4.5, 0.1, -3.8, 1.5, 3.8])
    Ea = np.array([3.6e5, 0.0, 4.0e4, 0.0, 3.2e5, 3.5e5])
    A = np.array([1e-8, 1e-12, 1e-13, 1e-12, 1e-7, 1e-8])
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    return sd, rd, calc


def solved_namespace(tf=2.0, ts_update=0.5, chunkstep=0.5, u0_spec="CC"):
    """sd/rd/calc/cs/conditions/pars/method/res/t — what the prose assumes."""
    from kinetica_tpu.conditions.condition_set import ConditionSet
    from kinetica_tpu.conditions.profiles import LinearGradientProfile
    from kinetica_tpu.solving.methods import VariableODESolve, solve_network
    from kinetica_tpu.solving.params import ODESimulationParams

    sd, rd, calc = small_crn()
    cs = ConditionSet(
        {"T": LinearGradientProfile(rate=300.0, X_start=1100.0,
                                    X_end=1100.0 + 300.0 * tf)},
        ts_update=ts_update)
    pars = ODESimulationParams(tspan=(0.0, tf), u0={u0_spec: 1.0},
                               solve_chunks=True, solve_chunkstep=chunkstep,
                               low_k_cutoff="none")
    method = VariableODESolve(pars, cs, calc)
    res = solve_network(method, sd, rd)
    return dict(np=np, sd=sd, rd=rd, calc=calc, cs=cs, conditions=cs,
                tf=tf, pars=pars, method=method, res=res, t=tf / 2,
                VariableODESolve=VariableODESolve,
                solve_network=solve_network,
                ODESimulationParams=ODESimulationParams,
                ConditionSet=ConditionSet)


def ns_arbitrary_conditions():
    from kinetica_tpu.conditions.condition_set import ConditionSet
    from kinetica_tpu.conditions.profiles import DoubleRampGradientProfile
    return dict(ConditionSet=ConditionSet,
                DoubleRampGradientProfile=DoubleRampGradientProfile)


def ns_filtering():
    from kinetica_tpu.solving.filters import RxFilter
    ns = solved_namespace()
    ns["RxFilter"] = RxFilter
    return ns


def ns_iterative_exploration():
    from kinetica_tpu.conditions.condition_set import ConditionSet
    from kinetica_tpu.exploration.cde import CDE
    from kinetica_tpu.exploration.cde_lite import (get_cde_lite_exec,
                                                   write_minimal_template)
    from kinetica_tpu.exploration.methods import (IterativeExplore,
                                                  explore_network)
    from kinetica_tpu.solving.methods import StaticODESolve
    from kinetica_tpu.solving.params import ODESimulationParams
    write_minimal_template("template")
    pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"CC": 1.0},
                               solve_chunks=False, save_interval=0.1,
                               low_k_cutoff="none", allow_short_u0=True)

    from kinetica_tpu.calculators.builtin import DummyKineticCalculator

    class UniformCalc(DummyKineticCalculator):
        def __init__(self):
            pass

        allows_continuous = True

        def setup_network(self, sd, rd):
            self.nr = rd.nr

        def splice(self, rids):
            pass

        def has_conditions(self, symbols):
            return True

        def __call__(self, **_):
            import jax.numpy as jnp
            return jnp.full((self.nr,), 0.5)

    solve_method = StaticODESolve(pars, ConditionSet({"T": 500.0}),
                                  UniformCalc())
    return dict(CDE=CDE, get_cde_lite_exec=get_cde_lite_exec,
                IterativeExplore=IterativeExplore,
                explore_network=explore_network, solve_method=solve_method)


def ns_kinetic_calculators():
    from kinetica_tpu.calculators.base import KineticCalculator
    from kinetica_tpu.calculators.kpm import DESCRIPTOR_DIM
    ns = solved_namespace()
    ns["KineticCalculator"] = KineticCalculator
    rng = np.random.default_rng(0)
    arrs = {}
    for m in range(2):
        arrs[f"W{m}_0"] = rng.normal(size=(DESCRIPTOR_DIM, 8))
        arrs[f"b{m}_0"] = rng.normal(size=8)
        arrs[f"W{m}_1"] = rng.normal(size=(8, 1))
        arrs[f"b{m}_1"] = rng.normal(size=1)
    np.savez("kpm_model.npz", **arrs)
    return ns


def ns_logging():
    from kinetica_tpu.solving.methods import StaticODESolve
    ns = solved_namespace()
    return ns


def ns_ode_solution():
    ns = solved_namespace(tf=0.02, ts_update=5e-3, chunkstep=1e-3)
    ns["t"] = 0.01
    return ns


def ns_results_analysis():
    return solved_namespace()


def ns_saving_loading():
    from kinetica_tpu.analysis.io import load_output, save_output
    ns = solved_namespace()
    ns.update(save_output=save_output, load_output=load_output)
    return ns


def ns_sensitivity():
    from kinetica_tpu.core.network import print_rxn
    ns = solved_namespace()
    ns["print_rxn"] = print_rxn
    return ns


def ns_full_product():
    from kinetica_tpu.exploration.cde_lite import write_minimal_template
    write_minimal_template("template")
    return {}


NAMESPACES = {
    "arbitrary-conditions.md": ns_arbitrary_conditions,
    "full-product.md": ns_full_product,
    "filtering-crns.md": ns_filtering,
    "iterative-exploration.md": ns_iterative_exploration,
    "kinetic-calculators.md": ns_kinetic_calculators,
    "logging.md": ns_logging,
    "ode-solution.md": ns_ode_solution,
    "results-analysis.md": ns_results_analysis,
    "saving-loading.md": ns_saving_loading,
    "sensitivity-analysis.md": ns_sensitivity,
}


@pytest.mark.parametrize("name", sorted(NAMESPACES))
def test_tutorial_blocks_execute(name, tmp_path, monkeypatch):
    path = DOCS / name
    assert path.is_file(), f"tutorial {name} missing"
    blocks = extract_blocks(path)
    assert blocks, f"{name} has no python blocks"
    monkeypatch.chdir(tmp_path)
    ns = NAMESPACES[name]()
    ns.setdefault("np", np)
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{name}[block {i}]", "exec"), ns)
        except Exception as exc:  # pragma: no cover - diagnostic
            pytest.fail(f"{name} block {i} failed: {type(exc).__name__}: "
                        f"{exc}\n---\n{block}")


def test_all_tutorials_covered():
    """Every tutorial file must have an execution namespace registered."""
    files = {p.name for p in DOCS.glob("*.md")}
    assert files == set(NAMESPACES), (
        f"unregistered tutorials: {files ^ set(NAMESPACES)}")
