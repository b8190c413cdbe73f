"""Solve methods: the static/variable x complete/chunkwise x
continuous/discrete matrix.

Capability parity with /root/reference/src/solving/methods.jl (864 LoC, six
concrete ``solve_network`` variants), redesigned TPU-first:

* The reference's per-chunk host loop with integrator ``reinit!``
  (methods.jl:258-287, 796-847) becomes one ``lax.scan`` over chunks inside
  a single jitted computation — each chunk integrates in *local* time
  (avoiding dt/t float underflow, implementation-details.md:5-28) and the
  chunk index rides the integrator's ``args`` to shift rate lookups onto
  the global clock (the reference does this with
  ``ChunkwiseRateUpdateAffect``, solve_utils.jl:488-509).
* Discrete rate updates are a precomputed (tstops, k_table) pair consumed
  by a left-anchored lookup in the RHS plus step clamping at the stops —
  no callbacks (the XLA formulation of PresetTimeCallback /
  DiscreteCallback, methods.jl:741-744).
* Continuous mode embeds ``k(T(t), P(t))`` directly: calculators are plain
  traceable jnp code, so the reference's biggest pain point — MTK symbolic
  registration and ``structural_simplify`` codegen cost
  (methods.jl:363-653) — disappears entirely.
* The adaptive-tolerance retry loop mirrors ``adaptive_solve!``
  (solve_utils.jl:376-424): tighten tolerances x10, at most 5 attempts,
  floor at machine eps; tolerances are traced scalars so retries do not
  recompile.
"""
from __future__ import annotations

import copy
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..calculators.base import KineticCalculator
from ..conditions.condition_set import ConditionSet
from ..core.network import RxData, SpeciesData
from ..models.mass_action import MassActionNetwork, build_mass_action
from ..ops import bdf, rk45
from ..ops.interp import left_constant_lookup
from ..utils.interpolation import TimeSeries
from ..utils.logging import logger
from ..utils.profiling import timed
from ..utils.time_units import create_savepoints
from .filters import RxFilter
from .params import ODESimulationParams
from .solutions import (ODESolution, retcode_from_status)
from .solve_utils import (apply_low_k_cutoff, calculate_discrete_rates,
                          get_initial_rates, make_u0,
                          resolve_chunks_per_dispatch)

DEFAULT_COMPLETE_SAVEPOINTS = 1000


class AbstractODESolveMethod:
    pass


class StaticODESolve(AbstractODESolveMethod):
    """Static-conditions kinetic CRN solve (methods.jl:7-41)."""

    def __init__(self, pars: ODESimulationParams, conditions: ConditionSet,
                 calculator: KineticCalculator, filter: RxFilter | None = None):
        if not conditions.isstatic():
            raise ValueError("All conditions must be static to run a StaticODESolve.")
        if not calculator.has_conditions(conditions.symbols):
            raise ValueError("Calculator does not support all of the provided conditions.")
        self.pars = pars
        self.conditions = conditions
        self.calculator = calculator
        self.filter = filter if filter is not None else RxFilter()


class VariableODESolve(AbstractODESolveMethod):
    """Variable-conditions kinetic CRN solve (methods.jl:44-79)."""

    def __init__(self, pars: ODESimulationParams, conditions: ConditionSet,
                 calculator: KineticCalculator, filter: RxFilter | None = None):
        if not calculator.has_conditions(conditions.symbols):
            raise ValueError("Calculator does not support all of the provided conditions.")
        if not conditions.discrete_updates and not calculator.allows_continuous:
            raise ValueError("Calculator does not support continuous rate updates "
                             "in simulations.")
        self.pars = pars
        self.conditions = conditions
        self.calculator = calculator
        self.filter = filter if filter is not None else RxFilter()


@dataclass
class KineticIntegrator:
    """The compiled problem handle returned by ``return_integrator=True``.

    Bundles the traceable RHS/Jacobian, network arrays, initial state and
    solve configuration so callers can step manually (the reference returns
    the DiffEq integrator for the same purpose, methods.jl:96-105).
    """
    rhs: object
    jac: object
    net: MassActionNetwork
    u0: jnp.ndarray
    args: object
    pars: ODESimulationParams
    stops: np.ndarray | None
    prepare: object = None

    def solve_segment(self, t0, tf, saveat, rtol=None, atol=None):
        return bdf.bdf_solve(
            self.rhs, self.jac, self.u0, t0, tf, jnp.asarray(saveat),
            rtol=self.pars.reltol if rtol is None else rtol,
            atol=self.pars.abstol if atol is None else atol,
            stops=None if self.stops is None else jnp.asarray(self.stops),
            max_steps=int(self.pars.maxiters),
            nonnegative=self.pars.ban_negatives,
            nonnegative_project=self.pars.project_negatives,
            lu_precision=self.pars.lu_precision,
            linsolve=getattr(self.pars, "linsolve", "auto"),
            lu_drift_tol=getattr(self.pars, "lu_drift_tol", 0.1),
            jac_policy=getattr(self.pars, "jac_policy", "lazy"),
            prepare=self.prepare,
            args=self.args)


# ---------------------------------------------------------------------------
# RHS/Jacobian builders.  args convention: (t_shift, payload)
#   static k    : payload = k vector
#   discrete k  : payload = (tstops, k_table)
#   continuous k : payload unused (k_fn closure over profile closed forms)
#   continuous_theta: payload = per-member profile theta dict
# ---------------------------------------------------------------------------

def _jac_dtype(pars: ODESimulationParams | None = None):
    """Dtype the Newton Jacobian is evaluated in.

    "auto" resolves to f32 on accelerators: J is only a preconditioner (the
    Newton fixed point is anchored by the f64 rhs residual; the f32 factor
    + refinement path in ops/linalg.py already tolerates f32-level factor
    error), while f64 elementwise emulation on TPU is ~12x slower. CPU
    keeps the full-precision Jacobian.
    """
    choice = getattr(pars, "jac_dtype", "auto") if pars is not None else "auto"
    if choice == "auto":
        if jax.default_backend() != "cpu":
            return jnp.float32
        # CPU: match the solve precision (never silently upcast f32 solves)
        solve_dtype = getattr(pars, "dtype", "float64") if pars else "float64"
        return jnp.float64 if solve_dtype == "float64" else jnp.float32
    return jnp.float64 if choice == "float64" else jnp.float32


def _resolve_contraction(net: MassActionNetwork, pars=None):
    """Pick the RHS contraction implementation for ``du = r @ N``.

    Returns a callable ``r -> du`` or None (plain dense dot). "auto"
    selects the Pallas sliced-compensated kernel (ops/pallas_matmul.py)
    on accelerators for f64 networks: XLA's emulated-f64 ``dot_general``
    degrades ~50x inside the Newton while-loop (scripts/ablate.py), while
    the kernel holds ~120 us/eval at 1095 reactions with ~1e-13 relative
    accuracy. CPU keeps the native f64 dot.
    """
    choice = getattr(pars, "rhs_contraction", "auto") if pars else "auto"
    if choice == "float64":
        return None
    if choice == "auto":
        if jax.default_backend() == "cpu":
            return None
        if net.N.dtype != jnp.float64:
            return None    # f32 solves: the plain f32 dot is already fast
    from ..ops.pallas_matmul import DDContraction, FusedMassActionRHS
    # Explicit "fused"/"dd" on CPU run the kernels in Pallas interpret
    # mode: bit-identical semantics to the device kernels (slow — meant
    # for debugging/verification, never chosen by "auto" on CPU).
    interp = jax.default_backend() == "cpu"
    try:
        if choice in ("auto", "fused"):
            # auto prefers the fully-fused RHS kernel (one launch per
            # eval); DDContraction remains as the explicit "dd" choice
            # and the fallback for unsupported slot layouts
            return FusedMassActionRHS(net.N, net.reac_slots,
                                      interpret=interp)
        return DDContraction(net.N, interpret=interp)
    except ValueError as exc:
        if choice in ("dd", "fused"):
            raise
        try:
            return DDContraction(net.N, interpret=interp)
        except ValueError:
            logger.info(" - dd contraction unavailable (%s); keeping f64 "
                        "dot", exc)
            return None


def _resolve_jac_form(pars, jdt) -> str:
    """Pick the analytic-Jacobian contraction form (see params.jac_form):
    "matmul" exactly when the Jacobian is f32 on an accelerator (MXU
    dot_generals at half the segsum traffic, no scatter), else "segsum"."""
    choice = getattr(pars, "jac_form", "auto") if pars is not None else "auto"
    if choice != "auto":
        return choice
    if jax.default_backend() != "cpu" and jdt == jnp.float32:
        return "matmul"
    return "segsum"


def _make_rhs_jac(net: MassActionNetwork, mode: str, k_fn=None, jac_net=None,
                  analytic_jac: bool = True, contraction=None,
                  k_fn_pair=None, jac_form: str = "segsum"):
    """Build ``(rhs, jac, prepare)`` for :func:`bdf.bdf_solve`.

    ``prepare(t_stage, t_start, args)`` evaluates the rate-constant vector
    ONCE per step attempt (it depends only on time, which is fixed across
    the Newton iterations of BDF's single implicit stage); ``rhs``/``jac``
    receive it as their third argument. Discrete-mode k is looked up at the
    *step start* (the reference's update callbacks fire at a tstop and
    affect subsequent steps only, solve_utils.jl:488-509); continuous
    profiles see the implicit stage time.

    ``jac_net`` optionally supplies a reduced-precision network for the
    Jacobian (see :func:`_jac_dtype`).
    """
    jnet = jac_net if jac_net is not None else net
    jdt = jnet.N.dtype

    if mode == "static":
        def prepare(t_stage, t_start, a):
            return a[1]
    elif mode == "discrete":
        def prepare(t_stage, t_start, a):
            tstops, ktab = a[1]
            return left_constant_lookup(t_start + a[0], tstops, ktab)
    elif mode == "continuous":
        def prepare(t_stage, t_start, a):
            return k_fn(t_stage + a[0])
    elif mode == "continuous_theta":
        # batched continuous: profiles evaluated from per-member theta
        # vectors threaded through args (parallel.batching builds k_fn)
        def prepare(t_stage, t_start, a):
            return k_fn(t_stage + a[0], a[1])
    else:  # pragma: no cover
        raise ValueError(mode)

    pair_mode = contraction is not None and getattr(contraction,
                                                    "supports_pair", False)
    if pair_mode:
        # k is split into a double-f32 pair ONCE per step attempt (the
        # prepare hook); rhs/jac then touch no f64 over the (nr,) axis —
        # the dominant in-situ cost of the emulated-f64 elementwise path.
        from ..ops.dd import pair_from_f64
        if k_fn_pair is not None and mode == "continuous":
            # range-safe calculators produce the pair natively — skip
            # the emulated-f64 materialise/re-split round trip entirely
            def prepare(t_stage, t_start, a):
                return k_fn_pair(t_stage + a[0])
        elif k_fn_pair is not None and mode == "continuous_theta":
            def prepare(t_stage, t_start, a):
                return k_fn_pair(t_stage + a[0], a[1])
        else:
            inner_prepare = prepare

            def prepare(t_stage, t_start, a):
                return pair_from_f64(inner_prepare(t_stage, t_start, a))

        if getattr(contraction, "supports_fused", False):
            # fully-fused Pallas RHS: gathers, pair products and the
            # compensated contraction in ONE kernel launch; only the
            # cheap (ns,)-sized clip/augment/pair-split stays in XLA
            from ..models.mass_action import _clip_pos
            clip_delta = net.delta

            def rhs(t, u, k_pair):
                u_aug = jnp.concatenate([_clip_pos(u, clip_delta),
                                         jnp.ones((1,), u.dtype)])
                uh, ul = pair_from_f64(u_aug)
                return contraction.rhs_pair(uh, ul, *k_pair)
        else:
            def rhs(t, u, k_pair):
                return contraction.contract_pair(*net.rates_pair(u, k_pair))

        def k_for_jac(k_pair):
            if jdt == jnp.float32:
                return k_pair[0]
            return k_pair[0].astype(jdt) + k_pair[1].astype(jdt)
    elif contraction is not None:
        def rhs(t, u, k):
            return contraction(net.rates(u, k))

        def k_for_jac(k):
            return k.astype(jdt)
    else:
        def rhs(t, u, k):
            return net.rhs(u, k)

        def k_for_jac(k):
            return k.astype(jdt)

    if analytic_jac:
        jac_impl = jnet.jac_matmul if jac_form == "matmul" else jnet.jac

        def jac(t, u, k):
            return jac_impl(u.astype(jdt), k_for_jac(k))
    else:
        # pars.jac=False: forward-mode autodiff Jacobian of the same RHS
        # (the reference's jac=false lets the solver derive the Jacobian;
        # here that is jacfwd through the mass-action model)
        def jac(t, u, k):
            kk = k_for_jac(k)
            return jax.jacfwd(lambda uu: jnet.rhs(uu, kk))(u.astype(jdt))

    return rhs, jac, prepare


def _integrate(pars: ODESimulationParams, rhs, jac, u0, t0, tf, saveat,
               rtol, atol, stops, args, first_step=None, prepare=None,
               warm_start=None):
    """Dispatch to the selected on-TPU integrator (pars.solver).

    ``first_step`` may be a traced scalar (NaN = auto): the chunkwise
    loops carry the final accepted h into the next chunk, skipping the
    order-1 restart ramp the reference pays at every ``reinit!``
    (methods.jl:819). ``warm_start`` extends that carry to the full BDF
    method state (difference array, order, equal-step counter) so chunk
    boundaries cost nothing at all. The returned dict includes ``h`` (and,
    for BDF, ``warm``) for those carries.
    """
    if pars.solver == "rk45":
        # explicit stages evaluate at distinct times: fold prepare back in
        rhs_rk = (rhs if prepare is None else
                  (lambda t, y, a, t_start: rhs(t, y, prepare(t, t_start, a))))
        res = rk45.rk45_solve(
            rhs_rk, u0, t0, tf, saveat, rtol=rtol, atol=atol, stops=stops,
            max_steps=int(pars.maxiters), nonnegative=pars.ban_negatives,
            args=args)
        return res.status, res.ys, res.y_final, {
            "n_steps": res.n_steps, "n_accepted": res.n_accepted,
            "n_rejected": res.n_rejected, "h": res.h}
    res = bdf.bdf_solve(
        rhs, jac, u0, t0, tf, saveat, rtol=rtol, atol=atol, stops=stops,
        max_steps=int(pars.maxiters), nonnegative=pars.ban_negatives,
        nonnegative_project=pars.project_negatives,
        lu_precision=pars.lu_precision, first_step=first_step,
        linsolve=getattr(pars, "linsolve", "auto"),
        lu_drift_tol=getattr(pars, "lu_drift_tol", 0.1),
                jac_policy=getattr(pars, "jac_policy", "lazy"),
        prepare=prepare, warm_start=warm_start, args=args)
    return res.status, res.ys, res.y_final, {
        "n_steps": res.n_steps, "n_accepted": res.n_accepted,
        "n_rejected": res.n_rejected, "n_fev": res.n_fev,
        "n_jev": res.n_jev, "n_lu": res.n_lu, "h": res.h,
        "warm": (res.D, res.order, res.n_equal_steps)}


def _make_continuous_k_fn(conditions: ConditionSet, calculator: KineticCalculator,
                          pair: bool = False):
    """Traceable t -> k vector embedding profile closed forms + calculator.

    ``pair=True`` returns the calculator's f32-pair rates directly
    (``rates_pair``), letting pair-mode contractions skip the emulated-f64
    materialise/re-split round trip in the per-attempt prepare hook."""
    if pair:
        def k_fn_pair(t):
            conds = conditions.conditions_at(t)
            return calculator.rates_pair(**conds)
        return k_fn_pair

    def k_fn(t):
        conds = conditions.conditions_at(t)
        return calculator(**conds)
    return k_fn


def _adaptive_device_solve(solve_fn, pars: ODESimulationParams):
    """Host retry loop mirroring adaptive_solve! (solve_utils.jl:376-424).

    ``solve_fn(abstol, reltol) -> (status, payload)``; tolerances tighten
    x10 per retry (traced scalars — no recompilation), at most 5 attempts,
    floored at machine eps.
    """
    abstol, reltol = pars.abstol, pars.reltol
    mintol = np.finfo(np.float64).eps
    attempts = 0
    while True:
        attempts += 1
        status, payload = solve_fn(abstol, reltol)
        status = int(status)
        if status == bdf.DONE:
            if pars.update_tols and (abstol != pars.abstol or reltol != pars.reltol):
                logger.info("   - Writing new tolerances back to ODEParams.")
                pars.abstol, pars.reltol = abstol, reltol
            return status, payload, attempts
        if not pars.adaptive_tols:
            logger.error(" - Solve failed, not retrying as adaptive tolerance "
                         "is not enabled.")
            raise RuntimeError("ODE solution failed.")
        if attempts >= 5:
            logger.error(" - Too many attempts have been made to reduce solver "
                         "tolerance, exiting.")
            raise RuntimeError("ODE solution failed.")
        if abstol / 10 <= mintol or reltol / 10 <= mintol:
            logger.error(" - Solution cannot be converged by reducing solver "
                         "tolerance any further, exiting.")
            raise RuntimeError("ODE solution failed.")
        abstol /= 10
        reltol /= 10
        logger.warning("   - ODE solution failed at current solver tolerances.")
        logger.warning("   - Reducing tolerances to abstol = %g reltol = %g",
                       abstol, reltol)


def _complete_saveat(pars: ODESimulationParams) -> np.ndarray:
    t0, tf = pars.tspan
    if pars.save_interval is not None:
        return create_savepoints(t0, tf, pars.save_interval)
    return np.linspace(t0, tf, DEFAULT_COMPLETE_SAVEPOINTS + 1)


def _chunk_save_grid(pars: ODESimulationParams):
    """Local saveat grid (si, 2si, ..., chunkstep) and chunk count."""
    chunkstep = pars.solve_chunkstep
    si = pars.save_interval if pars.save_interval is not None else chunkstep
    m = int(round(chunkstep / si))
    if abs(m * si - chunkstep) > 1e-9 * chunkstep:
        # non-divisible save interval: fall back to one save per chunk
        m, si = 1, chunkstep
    saveat_local = (np.arange(1, m + 1) * si).astype(np.float64)
    saveat_local[-1] = chunkstep
    n_chunks = int(round(pars.tspan[1] / chunkstep))
    return saveat_local, n_chunks


def _chunk_local_stops(global_stops: np.ndarray, n_chunks: int,
                       chunkstep: float) -> np.ndarray:
    """Per-chunk stop times in local coordinates, padded with +inf.

    Only stops strictly inside (0, chunkstep) matter: chunk boundaries are
    integration endpoints already (the reference's boundary bookkeeping,
    methods.jl:800-818, is subsumed by exact per-chunk tf).
    """
    rows = []
    max_len = 1
    eps = 1e-12 * max(chunkstep * n_chunks, 1.0)
    for nc in range(n_chunks):
        lo, hi = nc * chunkstep, (nc + 1) * chunkstep
        local = [g - lo for g in global_stops if lo + eps < g < hi - eps]
        rows.append(local)
        max_len = max(max_len, len(local))
    out = np.full((n_chunks, max_len), np.inf)
    for i, row in enumerate(rows):
        out[i, : len(row)] = row
    return out


def _run_complete(rhs, jac, u0, pars: ODESimulationParams, saveat: np.ndarray,
                  stops: np.ndarray | None, args_payload, prepare=None):
    """Single whole-tspan device solve with adaptive-tolerance retries."""
    t0, tf = pars.tspan
    saveat_inner = jnp.asarray(saveat[saveat > t0 + 0.0])
    stops_j = None if stops is None or len(stops) == 0 else jnp.asarray(stops)
    zero = jnp.asarray(0.0, u0.dtype)

    def solve_fn(abstol, reltol):
        status, ys, y_final, st = _integrate(
            pars, rhs, jac, u0, t0, tf, saveat_inner, reltol, abstol,
            stops_j, (zero, args_payload), prepare=prepare)
        return status, (ys, st)

    status, (ys_dev, st), attempts = _adaptive_device_solve(solve_fn, pars)
    ys = np.concatenate([np.asarray(u0)[None], np.asarray(ys_dev)])
    ts = np.concatenate([[t0], np.asarray(saveat_inner)])
    stats = {k: int(v) for k, v in st.items() if k != "warm"}
    stats["attempts"] = attempts
    return ts, ys, status, stats


def _run_chunkwise(rhs, jac, u0, pars: ODESimulationParams,
                   global_stops: np.ndarray | None, args_payload,
                   prepare=None):
    """lax.scan over local-time chunks (the reference's chunk loop,
    methods.jl:796-847, as one device computation)."""
    chunkstep = pars.solve_chunkstep
    saveat_local, n_chunks = _chunk_save_grid(pars)
    saveat_j = jnp.asarray(saveat_local)
    if global_stops is not None and len(global_stops) > 0:
        stops_rows = jnp.asarray(_chunk_local_stops(global_stops, n_chunks, chunkstep))
    else:
        stops_rows = jnp.full((n_chunks, 1), jnp.inf)
    chunk_ids = jnp.arange(n_chunks, dtype=u0.dtype)

    n_chunks_total = int(chunk_ids.shape[0])

    def _progress_cb(nc):
        done = int(nc) + 1
        if done % max(1, n_chunks_total // 20) == 0 or done == n_chunks_total:
            logger.info("   - Chunkwise ODE: %d/%d chunks", done, n_chunks_total)

    STAT_KEYS = ("n_steps", "n_accepted", "n_rejected", "n_fev", "n_jev",
                 "n_lu")
    use_warm = getattr(pars, "chunk_warm_start", True) and pars.solver == "bdf"

    @jax.jit
    def scan_solve(u0, worst0, h0, warm0, acc0, chunk_ids, stops_rows, abstol,
                   reltol, payload):
        def body(carry, xs):
            u, worst, h_prev, warm, acc = carry
            nc, stops_row = xs
            status, ys, y_final, stats = _integrate(
                pars, rhs, jac, u, 0.0, chunkstep, saveat_j, reltol, abstol,
                stops_row, (nc * chunkstep, payload), first_step=h_prev,
                prepare=prepare, warm_start=warm if use_warm else None)
            worst = jnp.minimum(worst, status)
            acc = acc + jnp.stack([
                stats.get(k, jnp.asarray(0, jnp.int32)).astype(jnp.int64)
                for k in STAT_KEYS])
            if pars.progress:
                # structured progress (reference uses ProgressLogging bars,
                # methods.jl:248-254); host callback per chunk
                jax.debug.callback(_progress_cb, nc, ordered=False)
            # carry the final accepted h — and with chunk_warm_start the
            # whole BDF method state — into the next chunk (NaN/order-0 =
            # cold auto-start on chunk 0), so chunk boundaries skip the
            # order-1 restart ramp entirely
            warm_next = stats["warm"] if use_warm else warm
            return (y_final, worst, stats["h"], warm_next, acc), ys

        (u_f, worst, h_f, warm_f, acc), ys = jax.lax.scan(
            body, (u0, worst0, h0, warm0, acc0), (chunk_ids, stops_rows))
        return u_f, worst, h_f, warm_f, acc, ys

    # Device-dispatch granularity: on CPU the whole chunk loop is one scan;
    # on accelerators it is split into groups of chunks so no single device
    # execution runs unboundedly long (remote-attached TPU workers enforce
    # per-execution deadlines). Grouping is bit-neutral: the carry is
    # exactly (u, worst-status), threaded on host between dispatches.
    cpd = resolve_chunks_per_dispatch(pars.chunks_per_dispatch, n_chunks)

    def solve_fn(abstol, reltol):
        at = jnp.asarray(abstol)
        rt = jnp.asarray(reltol)
        u = u0
        worst = jnp.asarray(bdf.DONE, jnp.int32)
        h = jnp.asarray(jnp.nan, bdf.time_dtype(u0.dtype))
        warm = (jnp.zeros((bdf.MAX_ORDER + 3, u0.shape[0]), u0.dtype),
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        acc = jnp.zeros((len(STAT_KEYS),), jnp.int64)
        ys_parts = []
        for lo in range(0, n_chunks, cpd):
            hi = min(lo + cpd, n_chunks)
            with timed("solve.chunk_dispatch"):
                u, worst, h, warm, acc, ys_g = scan_solve(
                    u, worst, h, warm, acc, chunk_ids[lo:hi],
                    stops_rows[lo:hi], at, rt, args_payload)
            ys_parts.append(ys_g)
        ys = ys_parts[0] if len(ys_parts) == 1 else jnp.concatenate(ys_parts)
        return worst, (ys, acc)

    status, (ys, acc), attempts = _adaptive_device_solve(solve_fn, pars)
    m = len(saveat_local)
    ys = np.asarray(ys).reshape(n_chunks * m, -1)
    ys = np.concatenate([np.asarray(u0)[None], ys])
    ts = np.concatenate([
        [0.0],
        (np.arange(n_chunks)[:, None] * chunkstep + saveat_local[None, :]).ravel()])
    stats = {"attempts": attempts, "n_chunks": n_chunks}
    stats.update({k: int(v) for k, v in zip(STAT_KEYS, np.asarray(acc))})
    return ts, ys, status, stats


# ---------------------------------------------------------------------------
# solve_network — the public entry point (methods.jl:86-130, 330-360)
# ---------------------------------------------------------------------------

def solve_network(method: AbstractODESolveMethod, sd: SpeciesData, rd: RxData,
                  copy_network: bool = True, return_integrator: bool = False):
    """Solve a CRN under the given method; returns an ``ODESolveOutput``.

    Dispatch (mirroring the reference): StaticODESolve x {complete,
    chunkwise}; VariableODESolve x {complete, chunkwise} x {continuous,
    discrete}.
    """
    pars = method.pars
    conditions = method.conditions
    calc = method.calculator

    if copy_network:
        sd_active, rd_active = sd.copy(), rd.copy()
    else:
        sd_active, rd_active = sd, rd

    is_variable = isinstance(method, VariableODESolve)
    if is_variable:
        logger.info(" - Calculating variable condition profiles.")
        conditions.solve_variable_conditions(pars)

    logger.info(" - Filtering reactions...")
    mask = method.filter.get_filter_mask(sd_active, rd_active)
    filtered_ids = list(np.flatnonzero(mask))
    rd_active.splice(filtered_ids)
    # The reference splices only rd here (methods.jl:344-346), which breaks
    # precalculated calculators whose setup validates parameter lengths;
    # splicing the calculator's per-reaction parameters too keeps filters
    # usable with every calculator.
    if filtered_ids:
        calc.splice(filtered_ids)
    logger.info("   - Removed %d filtered reactions from network", int(mask.sum()))

    logger.info(" - Performing calculator-specific network setup.")
    with timed("solve.calculator_setup"):
        calc.setup_network(sd_active, rd_active)

    logger.info(" - Removing low-rate reactions")
    apply_low_k_cutoff(rd_active, calc, pars, conditions)

    if rd_active.nr == 0:
        raise ValueError(
            "CRN has no reactions after filtering/setup/low-k cutoff; "
            "nothing to solve. Check the filter masks, low_k_cutoff and "
            "(for explored networks) the max_molecularity ingestion limit.")

    from ..models.mass_action import resolve_clip_delta
    dtype = jnp.float64 if pars.dtype == "float64" else jnp.float32
    net = build_mass_action(rd_active, sd_active.n, dtype=dtype,
                            clip_delta=resolve_clip_delta(pars))
    jdt = _jac_dtype(pars)
    jac_form = _resolve_jac_form(pars, jdt)
    jac_net = (MassActionNetwork(net.reac_slots, net.N.astype(jdt),
                                 delta=net.delta)
               if jdt != dtype else None)
    u0 = jnp.asarray(make_u0(sd_active, pars), dtype=dtype)

    update_mode = ("discrete" if (is_variable and conditions.discrete_updates)
                   else ("continuous" if is_variable else "static"))
    contraction = _resolve_contraction(net, pars)

    # --- rate specification ---
    k_series = None
    if update_mode == "static":
        k_vec = jnp.asarray(get_initial_rates(conditions, calc), dtype=dtype)
        rhs, jac, prepare = _make_rhs_jac(net, "static", jac_net=jac_net,
                                          analytic_jac=pars.jac,
                                          contraction=contraction,
                                          jac_form=jac_form)
        payload = k_vec
        global_stops = None
    elif update_mode == "discrete":
        logger.info(" - Pre-calculating rate constants at discrete time intervals.")
        with timed("solve.rate_precalc"):
            tstops, k_table = calculate_discrete_rates(conditions, calc, rd_active.nr)
        rhs, jac, prepare = _make_rhs_jac(net, "discrete", jac_net=jac_net,
                                          analytic_jac=pars.jac,
                                          contraction=contraction,
                                          jac_form=jac_form)
        payload = (jnp.asarray(tstops, dtype=dtype), jnp.asarray(k_table, dtype=dtype))
        global_stops = tstops
        k_series = TimeSeries(tstops, k_table)
    else:
        k_fn = _make_continuous_k_fn(conditions, calc)
        k_fn_pair = (_make_continuous_k_fn(conditions, calc, pair=True)
                     if hasattr(calc, "rates_pair") else None)
        rhs, jac, prepare = _make_rhs_jac(net, "continuous", k_fn=k_fn,
                                          jac_net=jac_net,
                                          analytic_jac=pars.jac,
                                          contraction=contraction,
                                          k_fn_pair=k_fn_pair,
                                          jac_form=jac_form)
        payload = None
        global_stops = np.asarray(conditions.get_tstops())

    if return_integrator:
        logger.info(" - Returning integrator early.")
        return KineticIntegrator(rhs=rhs, jac=jac, net=net, u0=u0,
                                 args=(jnp.asarray(0.0, dtype), payload),
                                 pars=pars, stops=global_stops,
                                 prepare=prepare)

    logger.info(" - Solving network...")
    if pars.solve_chunks:
        ts, ys, status, stats = _run_chunkwise(rhs, jac, u0, pars,
                                               global_stops, payload,
                                               prepare=prepare)
    else:
        saveat = _complete_saveat(pars)
        ts, ys, status, stats = _run_complete(rhs, jac, u0, pars, saveat,
                                              global_stops, payload,
                                              prepare=prepare)
    logger.info(" - Solved.")

    # --- variable-condition traces at the save times (ODESolutionVC parity) ---
    vcs = {}
    if is_variable:
        # host-side trace assembly: keep off a remote accelerator backend
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ts_cpu = jax.device_put(np.asarray(ts), cpu)
            for sym, prof in conditions.get_variable_profiles().items():
                vcs[sym] = np.asarray(prof.value(ts_cpu), dtype=np.float64)

    sol = ODESolution(t=ts, u=ys, retcode=retcode_from_status(status),
                      vcs=vcs, k=k_series, stats=stats)

    from ..analysis.io import ODESolveOutput
    return ODESolveOutput(method, sol, sd_active, rd_active)
