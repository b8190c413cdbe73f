"""Forward parameter sensitivities of CRN solves — differentiable kinetics.

A capability the reference cannot offer (its CVODE solves are opaque
native calls; CVODES-style sensitivity analysis is never wired up): here
the whole chunkwise BDF solve is a pure JAX computation, so the
sensitivity of every species trajectory to every rate constant is one
``jax.jacfwd`` away — the tangent runs through the integrator's
``lax.while_loop``/``lax.scan`` machinery (forward-mode differentiation of
``while_loop`` is supported by JAX; reverse is not, which is why this
module is forward-mode).

Parameterisation: per-reaction log-scalings ``theta`` with
``k_j -> k_j * exp(theta_j)`` evaluated at ``theta = 0``, so
``S[t, m, j] = d u_m(t) / d theta_j`` is the *logarithmic* sensitivity
``k_j * du_m/dk_j`` — the standard dimensionless measure used in
mechanism reduction and uncertainty propagation (local sensitivity
analysis, cf. Turanyi & Tomlin, "Analysis of Kinetic Reaction
Mechanisms"). Restrict ``rids`` to keep the tangent count (= cost
multiplier over a plain solve) manageable on large CRNs.

Note these are *discrete* sensitivities — derivatives of the numerical
solution produced by the adaptive solver, the same convention as CVODES'
staggered forward method. At the solver's own tolerance they agree with
the continuous sensitivities to ~sqrt(rtol).
"""
from __future__ import annotations

import copy
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.network import RxData, SpeciesData
from ..models.mass_action import build_mass_action
from ..ops import bdf
from .methods import (AbstractODESolveMethod, StaticODESolve, VariableODESolve,
                      _chunk_local_stops, _chunk_save_grid, _make_rhs_jac)
from .solve_utils import (apply_low_k_cutoff, calculate_discrete_rates,
                          get_initial_rates, make_u0)
from ..utils.logging import logger


@dataclass
class SensitivitySolution:
    """t (nt,), u (nt, ns), S (nt, ns, n_params), rids (n_params,).

    ``rd`` is the network snapshot the solve actually ran on (after
    filtering and the low-k cutoff) — ``rids`` index INTO IT, so use it
    (not the original network) when printing/ranking reactions.
    """
    t: np.ndarray
    u: np.ndarray
    S: np.ndarray
    rids: np.ndarray
    rd: RxData = None

    def species_sensitivity(self, sd: SpeciesData, smi: str) -> np.ndarray:
        """(nt, n_params) log-sensitivities of one species' trajectory."""
        return self.S[:, sd.toInt[smi], :]


class SensitivityProblem:
    """Reusable compiled forward-sensitivity solve over one CRN.

    Uses the discrete-rate chunkwise formalism (the production path):
    rates are precomputed on the conditions' tstop grid and scaled by
    ``exp(theta)`` inside the traced program, so ``jacfwd`` w.r.t. theta
    differentiates through the full solve.
    """

    def __init__(self, method: AbstractODESolveMethod, sd: SpeciesData,
                 rd: RxData, rids=None):
        pars = method.pars
        # never mutate the caller's calculator: solve_network splices it in
        # place, so a shared instance would desynchronise from our network
        calc = copy.deepcopy(method.calculator)
        self.method = method
        self.sd, self.rd = sd.copy(), rd.copy()

        is_variable = isinstance(method, VariableODESolve)
        if is_variable and not method.conditions.discrete_updates:
            raise ValueError(
                "Sensitivity solves use the discrete-rate formalism: build "
                "the ConditionSet with ts_update=... (continuous-only "
                "condition sets are not supported here)")

        mask = method.filter.get_filter_mask(self.sd, self.rd)
        ids = list(np.flatnonzero(mask))
        self.rd.splice(ids)
        if ids:
            calc.splice(ids)
        calc.setup_network(self.sd, self.rd)
        # match solve_network's preprocessing exactly so u/S correspond to
        # the production solve (same network, same reaction indexing).
        # Conditions must be solved BEFORE the low-k cutoff: with
        # low_k_cutoff="auto", get_max_rates needs solved profiles.
        if is_variable:
            method.conditions.solve_variable_conditions(pars)
        apply_low_k_cutoff(self.rd, calc, pars, method.conditions)

        self.rids = (np.arange(self.rd.nr, dtype=np.int64) if rids is None
                     else np.asarray(rids, dtype=np.int64))
        if len(self.rids) and (self.rids.min() < 0
                               or self.rids.max() >= self.rd.nr):
            raise ValueError("rids out of range for the filtered network")

        from ..models.mass_action import resolve_clip_delta
        self.dtype = jnp.float64 if pars.dtype == "float64" else jnp.float32
        self.net = build_mass_action(self.rd, self.sd.n, dtype=self.dtype,
                                     clip_delta=resolve_clip_delta(pars))
        self.rhs, self.jac, self.prepare = _make_rhs_jac(self.net, "discrete")
        self.pars = pars
        self.t0 = pars.tspan[0]
        self.chunkstep = (pars.solve_chunkstep if pars.solve_chunks
                          else pars.tspan[1] - pars.tspan[0])
        self.saveat_local, self.n_chunks = (
            _chunk_save_grid(pars) if pars.solve_chunks
            else (np.asarray([self.chunkstep]), 1))

        if is_variable:
            tstops, ktab = calculate_discrete_rates(method.conditions, calc,
                                                    self.rd.nr)
        else:
            tstops = np.asarray([0.0])
            ktab = np.asarray(get_initial_rates(method.conditions,
                                                calc))[None, :]
        self._tstops = jnp.asarray(tstops)
        self._ktab = jnp.asarray(ktab)
        self._stops_rows = jnp.asarray(
            _chunk_local_stops(tstops - self.t0, self.n_chunks,
                               self.chunkstep))
        self._u0 = jnp.asarray(make_u0(self.sd, pars), dtype=self.dtype)

        rhs, jac, prepare = self.rhs, self.jac, self.prepare
        chunkstep = self.chunkstep
        t_base = self.t0
        saveat_j = jnp.asarray(self.saveat_local)
        tstops_j, stops_rows = self._tstops, self._stops_rows
        chunk_ids = jnp.arange(self.n_chunks, dtype=jnp.float64)
        rid_idx = jnp.asarray(self.rids)
        maxiters = int(pars.maxiters)

        def solve_theta(theta, ktab, u0):
            scale = jnp.ones((ktab.shape[1],), ktab.dtype)
            scale = scale.at[rid_idx].set(jnp.exp(theta))
            ktab_s = ktab * scale[None, :]

            def body(carry, xs):
                u, h, warm = carry
                nc, stops_row = xs
                res = bdf.bdf_solve(
                    rhs, jac, u, 0.0, chunkstep, saveat_j,
                    rtol=pars.reltol, atol=pars.abstol, stops=stops_row,
                    max_steps=maxiters,
                    nonnegative=pars.ban_negatives,
                    nonnegative_project=pars.project_negatives,
                    lu_precision=pars.lu_precision,
                    first_step=h, prepare=prepare, warm_start=warm,
                    args=(t_base + nc * chunkstep, (tstops_j, ktab_s)))
                warm = (res.D, res.order, res.n_equal_steps)
                return (res.y_final, res.h, warm), (res.ys, res.status)

            h0 = jnp.asarray(jnp.nan, bdf.time_dtype(u0.dtype))
            warm0 = (jnp.zeros((bdf.MAX_ORDER + 3, u0.shape[0]), u0.dtype),
                     jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
            _, (ys, statuses) = jax.lax.scan(body, (u0, h0, warm0),
                                             (chunk_ids, stops_rows))
            return ys.reshape(-1, u0.shape[0]), jnp.min(statuses)

        self._solve_theta = jax.jit(solve_theta)
        # jacfwd w.r.t. theta (of the trajectory output only): one tangent
        # per selected reaction
        self._solve_with_S = jax.jit(
            lambda theta, ktab, u0: (
                solve_theta(theta, ktab, u0),
                jax.jacfwd(lambda th: solve_theta(th, ktab, u0)[0])(theta)))

    def solve(self) -> SensitivitySolution:
        logger.info(" - Forward-sensitivity solve: %d parameters over "
                    "%d chunks.", len(self.rids), self.n_chunks)
        theta0 = jnp.zeros((len(self.rids),), self.dtype)
        (ys, status), S = self._solve_with_S(theta0, self._ktab, self._u0)
        if int(status) != bdf.DONE:
            raise RuntimeError(
                f"Sensitivity solve failed (worst BDF status {int(status)}); "
                "loosen tolerances or reduce the parameter set")
        u0_np = np.asarray(self._u0)
        u = np.concatenate([u0_np[None], np.asarray(ys)])
        S_np = np.concatenate(
            [np.zeros((1,) + S.shape[1:]), np.asarray(S)])
        ts = self.t0 + np.concatenate([
            [0.0],
            (np.arange(self.n_chunks)[:, None] * self.chunkstep
             + self.saveat_local[None, :]).ravel()])
        return SensitivitySolution(t=ts, u=u, S=S_np, rids=self.rids,
                                   rd=self.rd)


def solve_network_sensitivities(method, sd, rd, rids=None):
    """One-shot forward-sensitivity solve (see :class:`SensitivityProblem`)."""
    return SensitivityProblem(method, sd, rd, rids=rids).solve()


def rank_reactions(sens: SensitivitySolution, sd: SpeciesData,
                   rd: RxData | None = None,
                   species: str | None = None, top_n: int = 10):
    """Rank reactions by peak absolute log-sensitivity.

    ``species`` restricts the ranking to one trajectory; otherwise the max
    is taken over all species. Returns a list of (rid, score) sorted
    descending — the standard first step of mechanism reduction. The rids
    index ``sens.rd`` (the filtered network snapshot the solve ran on);
    passing a ``rd`` with a different reaction count raises to catch
    accidental cross-network indexing.
    """
    if rd is not None and sens.rd is not None and rd.nr != sens.rd.nr:
        raise ValueError(
            f"rd has {rd.nr} reactions but the sensitivity solve ran on "
            f"{sens.rd.nr}; rids index sens.rd — use that network")
    S = (sens.S[:, sd.toInt[species], :][:, None, :] if species is not None
         else sens.S)
    score = np.max(np.abs(S), axis=(0, 1))
    order = np.argsort(score)[::-1][:top_n]
    return [(int(sens.rids[i]), float(score[i])) for i in order]


def save_sensitivities(sens: SensitivitySolution, saveto: str) -> None:
    """Persist a SensitivitySolution as a portable .npz (S can be large).

    The network snapshot is NOT embedded — save it separately with the
    solve output (`analysis.io.save_output`); `rids` plus the reaction
    count are stored so a mismatched reload is detected.
    """
    if not saveto.endswith(".npz"):
        saveto = saveto + ".npz"   # savez appends it anyway; keep the log honest
    np.savez_compressed(
        saveto, t=sens.t, u=sens.u, S=sens.S, rids=sens.rids,
        nr=np.asarray(sens.rd.nr if sens.rd is not None else -1))
    logger.info("Saved sensitivities to %s", saveto)


def load_sensitivities(path: str, rd: RxData | None = None) -> SensitivitySolution:
    """Load a :func:`save_sensitivities` file.

    Pass the matching (filtered) ``rd`` to re-attach the network snapshot;
    a reaction-count mismatch raises rather than silently mis-indexing.
    """
    with np.load(path) as z:
        nr = int(z["nr"])
        if rd is not None and nr >= 0 and rd.nr != nr:
            raise ValueError(
                f"Sensitivity file was computed on a {nr}-reaction network "
                f"but the given rd has {rd.nr}")
        return SensitivitySolution(t=z["t"], u=z["u"], S=z["S"],
                                   rids=z["rids"], rd=rd)
