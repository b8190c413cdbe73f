"""Stepper robustness on k_max-saturated networks (round-2 stress class).

The getting-started parameter set saturates mid-Ea channels at
k_max = 1e12, producing Newton matrices with cond ~ 1e7-1e9 and an RHS
rounding floor above newton_tol — the regime that originally trapped the
integrator in small-h rejection cycles (43k-100k steps per 0.5 s chunk,
or outright FAIL_MAX_STEPS; see docs/design.md "Robustness on
saturated-rate networks"). This test pins the fix: the full 16-chunk
horizon must COMPLETE within a global step budget.
"""
import logging

import numpy as np
import pytest

logging.disable(logging.INFO)


def test_full_saturated_horizon_completes():
    import jax.numpy as jnp
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    import test_getting_started_parity as P
    from kinetica_tpu import constants
    from kinetica_tpu.models.mass_action import build_mass_action
    from kinetica_tpu.ops import bdf

    sd, rd, calc, conditions, pars = P.build_problem()
    net = build_mass_action(rd, sd.n)
    EaJ = jnp.asarray(np.asarray(calc.Ea))
    Aj = jnp.asarray(np.asarray(calc.A))

    def kfn(t):
        T = 500.0 + 50.0 * t
        k = Aj * jnp.exp(-EaJ / (constants.R * T)) * constants.N_A
        return 1.0 / (1.0 / 1e12 + 1.0 / k)

    def rhs(t, u, a):
        return net.rhs(u, kfn(t + a))

    def jac(t, u, a):
        return net.jac(u, kfn(t + a))

    u0 = np.zeros(sd.n)
    u0[sd.toInt["C"]] = 1.0
    u = jnp.asarray(u0)
    h = float("nan")
    total = 0
    for c in range(16):
        res = bdf.bdf_solve(rhs, jac, u, 0.0, 0.5, jnp.asarray([0.5]),
                            rtol=1e-8, atol=1e-10, max_steps=100000,
                            nonnegative_project=True, first_step=h,
                            args=0.5 * c)
        assert int(res.status) == bdf.DONE, f"chunk {c} failed"
        total += int(res.n_steps)
        u = res.y_final
        h = float(res.h)
    # pre-fix behaviour: FAIL_MAX_STEPS by chunk 3. The budget is ~2x the
    # currently measured total (~550k) to absorb controller drift while
    # still catching a reintroduced rejection trap.
    assert total < 1_200_000, f"step budget blown: {total}"
    assert np.all(np.isfinite(np.asarray(u)))
