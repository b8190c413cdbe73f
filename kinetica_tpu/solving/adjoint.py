"""Reverse-mode (adjoint) objective gradients through the stiff solve.

Computes ``grad[j] = d( w . u(T) ) / d ln k_j`` with ONE backward stiff
solve, independent of the number of reactions — the reverse-mode
complement of :mod:`~kinetica_tpu.solving.sensitivity` (which integrates
one tangent system per reaction and scales O(nr)). For parameter
estimation / objective fitting over ~10^3-reaction CRNs the adjoint is
the only tractable gradient.

Method (continuous adjoint, CVODES-style):

1. Forward solve on a dense uniform grid; store ``u_i`` and ``f(u_i)``.
2. Reconstruct ``u(t)`` between nodes by cubic Hermite interpolation
   (C^1, O(h^4) — both value and slope are solver-accurate at nodes).
3. Integrate the adjoint ODE ``lambda' = -J(u(t))^T lambda`` backwards
   from ``lambda(T) = w`` with the SAME production BDF integrator (the
   adjoint system inherits the forward stiffness; in reversed time
   ``s = T - t`` it is ``mu' = +J^T mu``).
4. Accumulate ``grad_j = int_0^T lambda . (N_j r_j(u(t))) dt`` by
   composite Simpson over the shared grid (``df/d ln k_j = N_j^T r_j``
   for mass action).

Accuracy is set by the grid (interpolation + quadrature, both O(h^4))
on top of the solver tolerances; validated against finite-difference
re-solves in tests/test_adjoint.py. v1 scope: static conditions and a
single time segment (moderate horizons — chunkwise time is not needed
below ~1e3 s); no reference equivalent (Kinetica.jl has no derivatives
at all).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import logger


def _hermite_interpolant(grid, us, fs):
    """C^1 cubic Hermite u(t) over a UNIFORM grid from nodal values and
    slopes; traceable (used inside the backward RHS)."""
    h = grid[1] - grid[0]
    n = grid.shape[0]

    def u_of_t(t):
        x = (t - grid[0]) / h
        i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
        th = x - i.astype(x.dtype)
        h00 = (1.0 + 2.0 * th) * (1.0 - th) ** 2
        h10 = th * (1.0 - th) ** 2
        h01 = th ** 2 * (3.0 - 2.0 * th)
        h11 = th ** 2 * (th - 1.0)
        return (h00 * us[i] + (h * h10) * fs[i]
                + h01 * us[i + 1] + (h * h11) * fs[i + 1])

    return u_of_t


def _simpson(values, h):
    """Composite Simpson over axis 0 (odd node count, uniform spacing)."""
    n = values.shape[0]
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return (h / 3.0) * jnp.tensordot(jnp.asarray(w, values.dtype), values,
                                     axes=(0, 0))


def solve_adjoint_gradient(method, sd, rd, weights, n_nodes: int = 257,
                           copy_network: bool = True):
    """Gradient of ``g = weights . u(T)`` w.r.t. every ``ln k_j``.

    ``method`` must be a :class:`~kinetica_tpu.solving.methods
    .StaticODESolve` (v1 scope: time-invariant k). ``weights`` is the
    (ns,)-vector defining the scalar objective — e.g. a one-hot species
    selector for "final concentration of X". ``n_nodes`` (odd) sets the
    shared forward-storage / quadrature grid.

    Returns ``(grad, g)``: the (nr,) gradient in the ACTIVE (filtered)
    network's reaction order, and the objective value.
    """
    from .methods import StaticODESolve, solve_network
    from .solve_utils import get_initial_rates
    from ..ops import bdf

    if not isinstance(method, StaticODESolve):
        raise TypeError("solve_adjoint_gradient requires a StaticODESolve "
                        "(v1 supports time-invariant rate constants)")
    if n_nodes % 2 == 0 or n_nodes < 5:
        raise ValueError("n_nodes must be odd and >= 5 (composite Simpson)")

    integ = solve_network(method, sd, rd, copy_network=copy_network,
                          return_integrator=True)
    pars = method.pars
    net = integ.net
    k = jnp.asarray(get_initial_rates(method.conditions, method.calculator),
                    jnp.float64)
    if k.shape[0] != net.nr:
        raise RuntimeError("calculator rate-vector length does not match "
                           "the active network")
    w = jnp.asarray(weights, jnp.float64)
    if w.shape != (net.ns,):
        raise ValueError(f"weights must have shape ({net.ns},)")

    T = float(pars.tspan[1] - pars.tspan[0])
    grid = jnp.linspace(0.0, T, n_nodes)

    # ---- forward: dense storage on the grid (u exact at t=0) ----
    res_f = integ.solve_segment(0.0, T, saveat=grid[1:])
    if int(np.asarray(res_f.status)) != bdf.DONE:
        raise RuntimeError(f"forward solve failed "
                           f"(status {int(np.asarray(res_f.status))})")
    u0 = jnp.asarray(integ.u0, jnp.float64)
    us = jnp.concatenate([u0[None], res_f.ys.astype(jnp.float64)])
    fs = jax.vmap(lambda u: net.rhs(u, k))(us)
    u_of_t = _hermite_interpolant(grid, us, fs)
    g = float(w @ us[-1])

    # ---- backward: mu(s) = lambda(T - s), mu' = +J(u(T-s))^T mu ----
    def rhs_b(s, mu, kk):
        return net.jac(u_of_t(T - s), kk).T @ mu

    def jac_b(s, mu, kk):
        return net.jac(u_of_t(T - s), kk).T

    res_b = bdf.bdf_solve(
        rhs_b, jac_b, w, 0.0, T, grid[1:],
        rtol=pars.reltol, atol=pars.abstol,
        max_steps=int(pars.maxiters),
        nonnegative=False, nonnegative_project=False,
        lu_precision=pars.lu_precision,
        linsolve=getattr(pars, "linsolve", "auto"),
        lu_drift_tol=getattr(pars, "lu_drift_tol", 0.1),
        args=k)
    if int(np.asarray(res_b.status)) != bdf.DONE:
        raise RuntimeError(f"adjoint solve failed "
                           f"(status {int(np.asarray(res_b.status))})")
    mus = jnp.concatenate([w[None], res_b.ys.astype(jnp.float64)])
    lambdas = mus[::-1]                       # lambda(t_i) = mu(T - t_i)

    # ---- quadrature: grad_j = int lambda . (N_j r_j) dt ----
    def integrand(u, lam):
        return net.rates(u, k) * (net.N @ lam)

    Q = jax.vmap(integrand)(us, lambdas)      # (n_nodes, nr)
    grad = np.asarray(_simpson(Q, T / (n_nodes - 1)))
    logger.info(" - adjoint gradient: |grad|_max = %.3e at g = %.6g",
                float(np.abs(grad).max()), g)
    return grad, g
