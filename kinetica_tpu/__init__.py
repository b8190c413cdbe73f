"""kinetica_tpu: TPU-native CRN exploration and stiff kinetic simulation.

Brand-new framework with the capabilities of Kinetica.jl (reference at
/root/reference), built on jax/XLA/Pallas. See SURVEY.md for the layer map.

Double precision is enabled at import (stiff integration at reltol 1e-8
over 1e5 s timescales requires it); set KINETICA_TPU_NO_X64=1 to opt out.
"""
import os as _os

import jax as _jax

if not _os.environ.get("KINETICA_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

# Public API shortcuts (lazy to keep import light)
def __getattr__(name):
    _API = {
        "SpeciesData": "kinetica_tpu.core.network",
        "RxData": "kinetica_tpu.core.network",
        "init_network": "kinetica_tpu.core.network",
        "format_rxn": "kinetica_tpu.core.network",
        "print_rxn": "kinetica_tpu.core.network",
        "ConditionSet": "kinetica_tpu.conditions.condition_set",
        "StaticConditionProfile": "kinetica_tpu.conditions.profiles",
        "NullDirectProfile": "kinetica_tpu.conditions.profiles",
        "LinearDirectProfile": "kinetica_tpu.conditions.profiles",
        "SawtoothDirectProfile": "kinetica_tpu.conditions.profiles",
        "NullGradientProfile": "kinetica_tpu.conditions.profiles",
        "LinearGradientProfile": "kinetica_tpu.conditions.profiles",
        "DoubleRampGradientProfile": "kinetica_tpu.conditions.profiles",
        "DummyKineticCalculator": "kinetica_tpu.calculators.builtin",
        "PrecalculatedArrheniusCalculator": "kinetica_tpu.calculators.builtin",
        "PrecalculatedLindemannCalculator": "kinetica_tpu.calculators.builtin",
        "TSTCalculator": "kinetica_tpu.calculators.tst",
        "ASENEBCalculator": "kinetica_tpu.ase.calculator",
        "ODESimulationParams": "kinetica_tpu.solving.params",
        "RxFilter": "kinetica_tpu.solving.filters",
        "StaticODESolve": "kinetica_tpu.solving.methods",
        "VariableODESolve": "kinetica_tpu.solving.methods",
        "solve_network": "kinetica_tpu.solving.methods",
        "CDE": "kinetica_tpu.exploration",
        "DirectExplore": "kinetica_tpu.exploration",
        "IterativeExplore": "kinetica_tpu.exploration",
        "explore_network": "kinetica_tpu.exploration",
        "KPMRun": "kinetica_tpu.calculators.kpm",
        "KPMBasicCalculator": "kinetica_tpu.calculators.kpm",
        "KPMCollisionCalculator": "kinetica_tpu.calculators.kpm",
        "KPMCollisionEntropyCalculator": "kinetica_tpu.calculators.kpm",
        "ODESolveOutput": "kinetica_tpu.analysis.io",
        "save_output": "kinetica_tpu.analysis.io",
        "load_output": "kinetica_tpu.analysis.io",
        "EnsembleProblem": "kinetica_tpu.parallel.batching",
        "SensitivityProblem": "kinetica_tpu.solving.sensitivity",
        "solve_network_sensitivities": "kinetica_tpu.solving.sensitivity",
        "rank_reactions": "kinetica_tpu.solving.sensitivity",
        "save_sensitivities": "kinetica_tpu.solving.sensitivity",
        "load_sensitivities": "kinetica_tpu.solving.sensitivity",
        "solve_network_ensemble": "kinetica_tpu.parallel.batching",
        "solve_adjoint_gradient": "kinetica_tpu.solving.adjoint",
        "morris_screening": "kinetica_tpu.analysis.screening",
        "MorrisResult": "kinetica_tpu.analysis.screening",
        "sobol_sensitivity": "kinetica_tpu.analysis.sobol",
        "SobolResult": "kinetica_tpu.analysis.sobol",
        "saltelli_design": "kinetica_tpu.analysis.sobol",
        "sobol_indices_from_values": "kinetica_tpu.analysis.sobol",
        "reduce_network_drg": "kinetica_tpu.analysis.reduction",
        "reduce_network_drgep": "kinetica_tpu.analysis.reduction",
        "drg_adjacency": "kinetica_tpu.analysis.reduction",
        "drgep_adjacency": "kinetica_tpu.analysis.reduction",
        "drgep_coefficients": "kinetica_tpu.analysis.reduction",
        "DRGReductionResult": "kinetica_tpu.analysis.reduction",
        "reaction_fluxes": "kinetica_tpu.analysis.flux",
        "find_steady_state": "kinetica_tpu.solving.steady_state",
        "find_steady_state_ensemble": "kinetica_tpu.solving.steady_state",
        "steady_state_sensitivities": "kinetica_tpu.solving.steady_state",
        "tconvert": "kinetica_tpu.utils",
        "create_savepoints": "kinetica_tpu.utils",
    }
    if name in _API:
        import importlib
        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module 'kinetica_tpu' has no attribute {name!r}")
