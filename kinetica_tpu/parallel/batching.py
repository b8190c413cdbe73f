"""Batched ensemble solves: vmap over condition profiles / u0 / rate sets.

The reference has no ensemble machinery ("ensemble calculations are not
currently implemented by Kinetica and this exercise is left up to the
user", docs/src/tutorials/ode-solution.md:190) and no accelerator
parallelism of any kind (SURVEY.md §2.10). Here the batch axis is a
first-class capability: one ``vmap`` turns a single stiff chunkwise solve
into a lockstep sweep of hundreds of (T, P) profiles per chip, and
:mod:`kinetica_tpu.parallel.sharding` extends the same batch axis across a
device mesh.

Batching strategy: condition sweeps are expressed in *discrete-rate* form —
every ensemble member shares one global tstop grid, and differs only in its
precomputed k table (B, n_stops, nr) and/or its initial concentrations
(B, ns). This keeps a single compiled program for the whole sweep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..conditions.condition_set import ConditionSet
from ..core.network import RxData, SpeciesData
from ..models.mass_action import build_mass_action
from ..ops import bdf
from ..solving.methods import (VariableODESolve, _chunk_local_stops,
                               _chunk_save_grid, _make_rhs_jac)
from ..solving.solutions import EnsembleSolution, retcode_from_status
from ..solving.solve_utils import calculate_discrete_rates, make_u0
from ..utils.logging import logger


def build_condition_sweep(conditions_list: list[ConditionSet], calculator,
                          nr: int, pars) -> tuple[np.ndarray, np.ndarray]:
    """Precompute per-member k tables on a shared tstop grid.

    All members must share the same simulation horizon (their profiles may
    differ in shape/rate). The shared grid is the union of all members'
    tstops; each member's rate table is evaluated on it.

    Returns (tstops (n_stops,), k_tables (B, n_stops, nr)).
    """
    for cs in conditions_list:
        cs.solve_variable_conditions(pars)
    grids = [np.asarray(cs.get_tstops(), dtype=np.float64)
             for cs in conditions_list]
    tstops = np.unique(np.concatenate(grids))
    k_tables = []
    for cs in conditions_list:
        scs = cs.get_static_conditions()
        bound = dict(scs)
        for sym, prof in cs.get_variable_profiles().items():
            bound[sym] = jnp.asarray(prof.value(jnp.asarray(tstops)))
        k_tables.append(np.asarray(calculator(**bound)))
    return tstops, np.stack(k_tables)


def solve_network_ensemble(method: VariableODESolve, sd: SpeciesData,
                           rd: RxData,
                           conditions_list: list[ConditionSet] | None = None,
                           u0s: np.ndarray | None = None,
                           sharding=None) -> EnsembleSolution:
    """Chunkwise discrete-rate ensemble solve, vmapped over members.

    * ``conditions_list`` — one ConditionSet per member (defaults to the
      method's own conditions for every member).
    * ``u0s`` — optional (B, ns) initial concentrations (defaults to
      ``pars.u0`` for every member).
    * ``sharding`` — optional ``jax.sharding.NamedSharding`` with a batch
      axis: member arrays are placed with it so the sweep spans the mesh
      (XLA handles the rest; members are independent so no collectives are
      needed on the hot path).
    """
    pars = method.pars
    calc = method.calculator

    sd_a, rd_a = sd.copy(), rd.copy()
    mask = method.filter.get_filter_mask(sd_a, rd_a)
    ids = list(np.flatnonzero(mask))
    rd_a.splice(ids)
    if ids:
        calc.splice(ids)
    calc.setup_network(sd_a, rd_a)

    dtype = jnp.float64 if pars.dtype == "float64" else jnp.float32
    net = build_mass_action(rd_a, sd_a.n, dtype=dtype)

    if conditions_list is None:
        method.conditions.solve_variable_conditions(pars)
        tstops, k_table = calculate_discrete_rates(method.conditions, calc, rd_a.nr)
        k_tables = k_table[None]
    else:
        tstops, k_tables = build_condition_sweep(conditions_list, calc,
                                                 rd_a.nr, pars)
    B = k_tables.shape[0]
    if u0s is None:
        u0_single = make_u0(sd_a, pars)
        u0s = np.broadcast_to(u0_single, (B, sd_a.n))
    elif u0s.shape[0] != B:
        if B == 1:
            k_tables = np.broadcast_to(k_tables, (u0s.shape[0],) + k_tables.shape[1:])
            B = u0s.shape[0]
        else:
            raise ValueError("u0s and condition batch sizes do not match")

    rhs, jac = _make_rhs_jac(net, "discrete")
    chunkstep = pars.solve_chunkstep
    saveat_local, n_chunks = _chunk_save_grid(pars)
    stops_rows = jnp.asarray(_chunk_local_stops(tstops, n_chunks, chunkstep))
    saveat_j = jnp.asarray(saveat_local)
    chunk_ids = jnp.arange(n_chunks, dtype=dtype)
    tstops_j = jnp.asarray(tstops, dtype=dtype)

    def single(u0, ktab, abstol, reltol):
        def body(carry, xs):
            u, worst = carry
            nc, stops_row = xs
            res = bdf.bdf_solve(
                rhs, jac, u, 0.0, chunkstep, saveat_j,
                rtol=reltol, atol=abstol, stops=stops_row,
                max_steps=int(pars.maxiters),
                nonnegative=pars.ban_negatives,
                lu_precision=pars.lu_precision,
                args=(nc * chunkstep, (tstops_j, ktab)))
            return (res.y_final, jnp.minimum(worst, res.status)), res.ys

        (_, worst), ys = jax.lax.scan(
            body, (u0, jnp.asarray(bdf.DONE, jnp.int32)),
            (chunk_ids, stops_rows))
        return worst, ys

    batched = jax.vmap(single, in_axes=(0, 0, None, None))
    fn = jax.jit(batched)

    u0s_j = jnp.asarray(u0s, dtype=dtype)
    ktabs_j = jnp.asarray(k_tables, dtype=dtype)
    if sharding is not None:
        u0s_j = jax.device_put(u0s_j, sharding)
        ktabs_j = jax.device_put(ktabs_j, sharding)

    logger.info(" - Solving %d-member ensemble (%d chunks each)...", B, n_chunks)
    statuses, ys = fn(u0s_j, ktabs_j, jnp.asarray(pars.abstol),
                      jnp.asarray(pars.reltol))
    statuses = np.asarray(statuses)
    m = len(saveat_local)
    ys = np.asarray(ys).reshape(B, n_chunks * m, -1)
    ys = np.concatenate([np.asarray(u0s)[:, None, :], ys], axis=1)
    ts = np.concatenate([
        [0.0],
        (np.arange(n_chunks)[:, None] * chunkstep + saveat_local[None, :]).ravel()])

    vcs = {}
    if conditions_list is not None:
        syms = conditions_list[0].symbols
        for sym in syms:
            if conditions_list[0].get_profile(sym).is_variable:
                vcs[sym] = np.stack([
                    np.asarray(cs.get_profile(sym).value(jnp.asarray(ts)))
                    for cs in conditions_list])

    return EnsembleSolution(
        t=ts, u=ys,
        retcodes=[retcode_from_status(s) for s in statuses],
        vcs=vcs, stats={"n_chunks": n_chunks, "batch": B})
