"""Steady-state finder via pseudo-transient continuation.

Finds u* with du/dt = 0 for a CRN under STATIC conditions by driving the
production BDF integrator over geometrically growing time horizons until
the state stops moving — the standard robust alternative to damped
Newton on f(u) = 0, which needs conservation-manifold pinning to avoid
the (always singular, by element conservation) mass-action Jacobian.
Reusing the integrator keeps every robustness device (adaptive order/
step, saturated-rate handling, nonnegativity projection) and the TPU
hot path; each epoch runs in LOCAL time [0, T] like chunkwise solves,
and all epochs reuse ONE compiled program (t0/tf are traced arguments).

No reference equivalent (Kinetica.jl integrates to a fixed tspan only).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..utils.logging import logger


@dataclass
class SteadyStateResult:
    u: np.ndarray              # (ns,) steady state (best iterate)
    residual: float            # weighted RMS of du/dt at u (1/s units)
    t_total: float             # pseudo-time integrated to reach it
    converged: bool
    epochs: int

    @property
    def success(self) -> bool:
        return self.converged


def find_steady_state(method, sd, rd, t_first: float = 1.0,
                      growth: float = 10.0, max_epochs: int = 14,
                      move_tol: float = 0.05, copy_network: bool = True):
    """Pseudo-transient continuation to steady state.

    ``method`` is a :class:`~kinetica_tpu.solving.methods.StaticODESolve`
    (steady states are defined for time-invariant conditions; pass the
    conditions of interest there). Epoch e integrates a horizon
    ``t_first * growth**e``; convergence is declared when one full epoch
    (a ``growth``-fold extension of the integrated time) moves the state
    by less than ``move_tol`` in tolerance-weighted RMS — i.e. the
    remaining drift is below ``move_tol`` error-units per decade of
    time. The result also reports the raw weighted RMS of du/dt.

    Oscillatory or drifting systems exhaust ``max_epochs`` and return
    ``converged=False`` with the last iterate.
    """
    from .methods import StaticODESolve, solve_network

    if not isinstance(method, StaticODESolve):
        raise TypeError(
            "find_steady_state requires a StaticODESolve (steady states "
            "are defined under time-invariant conditions)")

    integ = solve_network(method, sd, rd, copy_network=copy_network,
                          return_integrator=True)
    pars = method.pars
    rtol = jnp.asarray(pars.reltol, integ.u0.dtype)
    atol = jnp.asarray(pars.abstol, integ.u0.dtype)

    def wrms(x, u_ref):
        w = 1.0 / (atol + rtol * jnp.abs(u_ref))
        return float(jnp.sqrt(jnp.mean((x * w) ** 2)))

    u = integ.u0
    t_total = 0.0
    T = float(t_first)
    converged = False
    epoch = 0
    for epoch in range(1, max_epochs + 1):
        integ.u0 = u
        res = integ.solve_segment(0.0, T, saveat=jnp.asarray([T]))
        status = int(np.asarray(res.status))
        if status != 1:
            logger.info(" - steady-state epoch %d failed (status %d) at "
                        "T=%.3g; stopping", epoch, status, T)
            break
        u_new = res.y_final
        t_total += T
        move = wrms(u_new - u, u_new)
        u = u_new
        logger.info(" - steady-state epoch %d: T=%.3g move=%.3e", epoch, T,
                    move)
        if move < move_tol and epoch > 1:
            converged = True
            break
        T *= growth

    # residual du/dt at the final iterate, tolerance-weighted
    pre = integ.prepare(jnp.asarray(0.0), jnp.asarray(0.0), integ.args) \
        if integ.prepare is not None else integ.args
    f = integ.rhs(jnp.asarray(0.0), u, pre)
    return SteadyStateResult(u=np.asarray(u), residual=wrms(f, u),
                             t_total=t_total, converged=converged,
                             epochs=epoch)
