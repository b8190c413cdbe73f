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


@dataclass
class SteadyStateEnsemble:
    u: np.ndarray              # (B, ns) per-member steady states
    residual: np.ndarray       # (B,) weighted RMS of du/dt
    t_total: float
    converged: np.ndarray      # (B,) bool
    epochs: int

    @property
    def success(self) -> bool:
        return bool(np.all(self.converged))


def find_steady_state_ensemble(method, sd, rd, conditions_list,
                               t_first: float = 1.0, growth: float = 10.0,
                               max_epochs: int = 14, move_tol: float = 0.05,
                               copy_network: bool = True):
    """Batched steady states over a sweep of static conditions.

    One vmapped device program computes the fixed points of the SAME
    CRN under every member's (static) conditions simultaneously — an
    equilibrium map over a parameter sweep in one pseudo-transient
    continuation. Epoch scheduling is batch-synchronous: all lanes
    integrate every horizon (a lane already at its fixed point moves
    nothing and steps trivially), and the loop stops when every lane's
    last growth-factor extension moved less than ``move_tol`` weighted
    RMS. Per-lane convergence/residual is reported.
    """
    import jax

    from .methods import StaticODESolve, solve_network
    from .solve_utils import get_initial_rates

    if not isinstance(method, StaticODESolve):
        raise TypeError(
            "find_steady_state_ensemble requires a StaticODESolve")
    for cs in conditions_list:
        if any(not cs.get_profile(s).is_static for s in cs.symbols):
            raise TypeError("all ensemble members must have static "
                            "conditions (steady states are defined under "
                            "time-invariant conditions)")

    integ = solve_network(method, sd, rd, copy_network=copy_network,
                          return_integrator=True)
    pars = method.pars
    dtype = integ.u0.dtype
    # the calculator was setup_network'd on the (possibly spliced) active
    # network inside solve_network, so its k vectors align with integ.net
    k_b = jnp.asarray(np.stack([
        get_initial_rates(cs, method.calculator)
        for cs in conditions_list]), dtype=dtype)
    if k_b.shape[1] != integ.net.nr:
        raise RuntimeError("calculator rate-vector length does not match "
                           "the active network")
    B = k_b.shape[0]
    rtol = jnp.asarray(pars.reltol, dtype)
    atol = jnp.asarray(pars.abstol, dtype)

    from ..ops import bdf

    def solve_one(u0, k, T):
        return bdf.bdf_solve(
            integ.rhs, integ.jac, u0, 0.0, T, jnp.asarray([1.0]) * T,
            rtol=pars.reltol, atol=pars.abstol,
            max_steps=int(pars.maxiters),
            nonnegative=pars.ban_negatives,
            nonnegative_project=pars.project_negatives,
            lu_precision=pars.lu_precision,
            linsolve=getattr(pars, "linsolve", "auto"),
            lu_drift_tol=getattr(pars, "lu_drift_tol", 0.1),
            prepare=integ.prepare,
            args=(jnp.asarray(0.0, dtype), k))

    solve_b = jax.jit(jax.vmap(solve_one, in_axes=(0, 0, None)))

    u = jnp.broadcast_to(integ.u0, (B,) + integ.u0.shape)
    t_total = 0.0
    T = float(t_first)
    conv = np.zeros(B, dtype=bool)
    epoch = 0
    for epoch in range(1, max_epochs + 1):
        res = solve_b(u, k_b, T)
        status = np.asarray(res.status)
        if (status != 1).any():
            logger.info(" - steady-state ensemble epoch %d: %d lanes "
                        "failed (status min %d); stopping", epoch,
                        int((status != 1).sum()), int(status.min()))
            break
        u_new = res.y_final
        t_total += T
        w = 1.0 / (atol + rtol * jnp.abs(u_new))
        move = np.asarray(jnp.sqrt(jnp.mean(((u_new - u) * w) ** 2, axis=1)))
        u = u_new
        conv = (move < move_tol) & (epoch > 1)
        logger.info(" - steady-state ensemble epoch %d: T=%.3g "
                    "max move=%.3e (%d/%d lanes converged)", epoch, T,
                    float(move.max()), int(conv.sum()), B)
        if conv.all():
            break
        T *= growth

    def resid_one(uu, k):
        pre = (integ.prepare(jnp.asarray(0.0), jnp.asarray(0.0),
                             (jnp.asarray(0.0, dtype), k))
               if integ.prepare is not None else (jnp.asarray(0.0, dtype), k))
        f = integ.rhs(jnp.asarray(0.0), uu, pre)
        w = 1.0 / (atol + rtol * jnp.abs(uu))
        return jnp.sqrt(jnp.mean((f * w) ** 2))

    residual = np.asarray(jax.jit(jax.vmap(resid_one))(u, k_b))
    return SteadyStateEnsemble(u=np.asarray(u), residual=residual,
                               t_total=t_total, converged=conv,
                               epochs=epoch)


def steady_state_sensitivities(method, sd, rd, result=None,
                               copy_network: bool = True) -> np.ndarray:
    """EXACT parameter sensitivities of a steady state: S = du*/d ln k.

    At a fixed point f(u*, k) = 0 the implicit function theorem gives
    the sensitivity as one LINEAR solve — no time integration and no
    per-parameter resolves (the time-domain counterpart,
    :mod:`~kinetica_tpu.solving.sensitivity`, integrates nr tangent
    systems through the whole transient):

        J du*_j = -df/d(ln k_j) = -(N_j^T r_j),   constrained to the
        conservation manifold L du* = 0,

    where L spans the linear invariants (null(N): element conservation
    makes the mass-action Jacobian exactly singular along them, and a
    rate perturbation cannot move conserved totals). The constrained
    system is solved in f64 on the host by least squares over the
    stacked [J; L] operator — exact up to roundoff, validated against
    finite-difference re-solves in tests/test_steady_state.py.

    Returns ``S`` of shape (ns, nr): ``S[m, j] = du*_m / d ln k_j``.
    No reference equivalent (beyond-parity, like the finder itself).
    """
    from .methods import StaticODESolve, solve_network
    from .solve_utils import get_initial_rates

    if not isinstance(method, StaticODESolve):
        raise TypeError("steady_state_sensitivities requires a "
                        "StaticODESolve")
    if result is None:
        result = find_steady_state(method, sd, rd,
                                   copy_network=copy_network)
    if not result.converged:
        raise RuntimeError("steady state did not converge; sensitivities "
                           "at a moving state are not defined")

    integ = solve_network(method, sd, rd, copy_network=copy_network,
                          return_integrator=True)
    net = integ.net
    k = jnp.asarray(get_initial_rates(method.conditions, method.calculator),
                    jnp.float64)
    if k.shape[0] != net.nr:
        raise RuntimeError("calculator rate-vector length does not match "
                           "the active network")
    u = jnp.asarray(result.u, jnp.float64)

    # f64 Jacobian and rates straight from the numeric network model
    J = np.asarray(net.jac(u, k), dtype=np.float64)          # (ns, ns)
    r = np.asarray(net.rates(u, k), dtype=np.float64)        # (nr,)
    Nmat = np.asarray(net.N, dtype=np.float64)                # (nr, ns)
    B = (Nmat * r[:, None]).T                                 # (ns, nr)

    # linear invariants: c with N c = 0 (=> c . f == 0 for every rate)
    _, s, vt = np.linalg.svd(Nmat, full_matrices=True)
    rank = int((s > s.max() * max(Nmat.shape) * np.finfo(float).eps).sum()) \
        if s.size else 0
    L = vt[rank:]                                             # (n_inv, ns)

    alpha = max(1.0, float(np.linalg.norm(J)))
    A = np.vstack([J, alpha * L])
    rhs = np.vstack([-B, np.zeros((L.shape[0], B.shape[1]))])
    S, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    return S
