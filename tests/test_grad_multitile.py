"""Solve-level gradients through the multi-tile accelerator-default
factor path (VERDICT r4 next #8).

The advertised sensitivity/adjoint subsystems (solving/sensitivity.py,
solving/adjoint.py) differentiate THROUGH the BDF Newton loop; at
multi-tile width (ns > 128) the accelerator-default factor is the
block-Schur inverse (`pallas_linalg.schur_inverse`) reached through the
lane-compaction batch rule and the `_inv_factor_diff` custom JVP, and
the Jacobian refresh is wrapped by `ops.gating.lane_compacted`
(width-gated on at ns >= 128). If any of those custom rules regresses,
gradients would silently mis-differentiate — these tests pin the
agreement at the width where every multi-tile branch is live.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.solving.methods import StaticODESolve
from kinetica_tpu.solving.params import ODESimulationParams
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network


def _multitile_problem(linsolve):
    # ns = 181 (> LANE=128: schur splits 128 + 53) with a thinned
    # reaction set so the CPU interpret-mode factor stays tractable.
    # k_max=1e4 + a 2e-4 s horizon keeps the solve MID-TRANSIENT: at the
    # production k_max=1e12 the feed burns to zero within any horizon
    # and the backward adjoint ODE of the saturated terminal state hits
    # max-steps regardless of linsolve.
    sd, rd, Ea, A = synthetic_pyrolysis_network(60, target_reactions=300)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e4)
    pars = ODESimulationParams(tspan=(0.0, 2e-4), u0={"C60": 1.0},
                               solve_chunks=False, low_k_cutoff="none",
                               save_interval=1e-4, linsolve=linsolve)
    method = StaticODESolve(pars, ConditionSet({"T": 900.0}), calc)
    return sd, rd, method


class TestMultiTileFactorJVP:
    def test_inv_factor_jvp_multitile_compacted(self):
        """Vmapped gated-factor JVP at n=181 (schur primal) through the
        lane-compaction batch rule: tangents on needing lanes must match
        the analytic d(A^-1) = -A^-1 dA A^-1 built from the ungated
        factor; masked lanes must propagate exactly zero."""
        from kinetica_tpu.ops.linalg import _inv_factor_diff, _inv_factor_one
        B, n = 16, 181
        rng = np.random.default_rng(11)
        A = jnp.asarray(np.eye(n) + 0.3 / np.sqrt(n)
                        * rng.standard_normal((B, n, n)))
        dA = jnp.asarray(rng.standard_normal((B, n, n)))
        need = np.zeros(B, bool)
        need[[1, 4, 9]] = True

        gated = jax.vmap(_inv_factor_diff, in_axes=(0, 0))
        M, dM = jax.jvp(lambda a: gated(a, jnp.asarray(need)), (A,), (dA,))
        M_ref = jax.vmap(_inv_factor_one)(A)
        dM_ref = -(M_ref @ dA.astype(M_ref.dtype) @ M_ref)
        np.testing.assert_allclose(np.asarray(M)[need],
                                   np.asarray(M_ref)[need],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dM)[need],
                                   np.asarray(dM_ref)[need],
                                   rtol=1e-3, atol=1e-4)
        zero_lanes = np.abs(np.asarray(M)).reshape(B, -1).max(axis=1) == 0
        assert zero_lanes.any()
        assert np.all(np.asarray(dM)[zero_lanes] == 0.0)


class TestMultiTileSolveGradients:
    def test_adjoint_vs_forward_multitile_invgated(self, monkeypatch):
        """Adjoint-vs-forward agreement at ns=181 with the accelerator-
        default path forced (linsolve=inv_gated -> schur primal;
        KINETICA_JAC_GATE=on -> lane_compacted jac refresh in the BDF
        loop). Two independent derivative implementations through the
        same solver must agree on the sensitive channels."""
        monkeypatch.setenv("KINETICA_JAC_GATE", "on")
        from kinetica_tpu.solving.adjoint import solve_adjoint_gradient
        from kinetica_tpu.solving.sensitivity import \
            solve_network_sensitivities

        sd, rd, method = _multitile_problem("inv_gated")
        # observable: an alkene product with an O(0.1) terminal value
        # (the C60 feed itself burns to ~0 within the horizon — its
        # gradient is numerically zero and meaningless to compare)
        w = np.zeros(sd.n)
        w[sd.toInt["C16e"]] = 1.0

        grad, g = solve_adjoint_gradient(method, sd, rd, w, n_nodes=257)
        assert np.all(np.isfinite(grad))
        assert np.abs(grad).max() > 1e-6

        # forward tangents on the most-sensitive channels only (each rid
        # is one tangent solve; the full 300 would be minutes on CPU)
        rids = np.argsort(np.abs(grad))[::-1][:4]
        sens = solve_network_sensitivities(method, sd, rd,
                                           rids=[int(r) for r in rids])
        fwd = w @ np.asarray(sens.S)[-1]       # (len(rids),) at t = T
        scale = np.abs(fwd).max()
        assert scale > 0
        np.testing.assert_allclose(grad[rids], fwd, rtol=0.05,
                                   atol=5e-3 * scale)

    def test_forward_sensitivity_invgated_matches_lu(self, monkeypatch):
        """The same forward-sensitivity tangents through the default
        "lu" path and the forced accelerator path (inv_gated + gated
        jac) — any divergence localises to the custom factor/jac rules."""
        monkeypatch.setenv("KINETICA_JAC_GATE", "on")
        from kinetica_tpu.solving.sensitivity import \
            solve_network_sensitivities

        rids = [0, 7, 42]
        sd, rd, m_lu = _multitile_problem("lu")
        s_lu = solve_network_sensitivities(m_lu, sd, rd, rids=rids)
        sd2, rd2, m_inv = _multitile_problem("inv_gated")
        s_inv = solve_network_sensitivities(m_inv, sd2, rd2, rids=rids)
        scale = np.abs(np.asarray(s_lu.S)).max()
        np.testing.assert_allclose(np.asarray(s_inv.S),
                                   np.asarray(s_lu.S),
                                   rtol=0.02, atol=1e-4 * max(scale, 1e-30))
