"""Adjoint (reverse-mode) objective gradients (solving/adjoint.py).

Validated against the forward-sensitivity module on the same objective:
two independent derivative implementations through the same solver (the
forward module is itself finite-difference-validated in
test_sensitivity.py; direct FD on the adjoint's scalar objective is
noise-limited — at solver tolerance 1e-8 a difference quotient with
h=1e-4 carries ~1e-4 absolute noise, above these gradients).
"""
import os

import numpy as np
import pytest

from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.solving.adjoint import solve_adjoint_gradient
from kinetica_tpu.solving.methods import StaticODESolve
from kinetica_tpu.solving.params import ODESimulationParams

BSON = "/root/reference/examples/getting_started/arrhenius_params.bson"


def _getting_started_static(tf):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_getting_started_parity import build_problem
    sd, rd, calc, _, _ = build_problem()
    pars = ODESimulationParams(tspan=(0.0, tf), u0={"C": 1.0},
                               solve_chunks=False, low_k_cutoff="none")
    return sd, rd, StaticODESolve(pars, ConditionSet({"T": 650.0}), calc)


@pytest.mark.skipif(not os.path.isfile(BSON),
                    reason="reference bson asset unavailable")
def test_adjoint_matches_forward_sensitivities():
    """d(u_CC(T))/d ln k over all 30 reactions of the getting-started CRN
    (mid-transient at 650 K): one backward solve must reproduce the 30
    forward tangent solves."""
    from kinetica_tpu.solving.sensitivity import solve_network_sensitivities
    sd, rd, method = _getting_started_static(tf=0.05)
    w = np.zeros(sd.n)
    w[sd.toInt["CC"]] = 1.0

    grad, g = solve_adjoint_gradient(method, sd, rd, w, n_nodes=513)
    assert grad.shape == (rd.nr,)
    assert 0.0 < g < 1.0
    assert np.abs(grad).max() > 1e-4          # genuinely sensitive channels

    sens = solve_network_sensitivities(method, sd, rd)
    fwd = w @ np.asarray(sens.S)[-1]          # (nr,) at t = T
    scale = np.abs(fwd).max()
    np.testing.assert_allclose(grad, fwd, rtol=0.02, atol=5e-3 * scale)


@pytest.mark.skipif(not os.path.isfile(BSON),
                    reason="reference bson asset unavailable")
def test_rejects_variable_conditions():
    from kinetica_tpu.calculators.builtin import \
        PrecalculatedArrheniusCalculator
    from kinetica_tpu.conditions.profiles import LinearGradientProfile
    from kinetica_tpu.solving.methods import VariableODESolve
    sd, rd, method = _getting_started_static(tf=0.05)
    calc = PrecalculatedArrheniusCalculator(np.zeros(rd.nr),
                                            np.ones(rd.nr) * 1e-13)
    pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C": 1.0},
                               low_k_cutoff="none")
    vmethod = VariableODESolve(
        pars, ConditionSet({"T": LinearGradientProfile(
            rate=50.0, X_start=500.0, X_end=550.0)}), calc)
    with pytest.raises(TypeError, match="StaticODESolve"):
        solve_adjoint_gradient(vmethod, sd, rd, np.zeros(sd.n))


@pytest.mark.skipif(not os.path.isfile(BSON),
                    reason="reference bson asset unavailable")
def test_rejects_tiny_grids():
    sd, rd, method = _getting_started_static(tf=0.05)
    with pytest.raises(ValueError, match="n_nodes"):
        solve_adjoint_gradient(method, sd, rd, np.zeros(sd.n), n_nodes=10)
