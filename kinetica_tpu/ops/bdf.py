"""Variable-order BDF stiff integrator, from scratch in JAX.

This is the TPU-native replacement for the reference's production solver,
Sundials ``CVODE_BDF(linear_solver=:KLU)``
(/root/reference/docs/src/getting-started.md:69-77) — no CVODE exists on
TPU, so the classic variable-step variable-order BDF method (orders 1-5,
backward-difference state array, simplified Newton with a frozen-Jacobian
LU, step/order adaptation; the published math that CVODE/ode15s/scipy-BDF
all implement) is built here directly on jax/XLA primitives:

* one ``lax.while_loop`` whose carry holds the full integrator state with
  *static shapes* (the D difference array is padded to MAX_ORDER+3 rows),
* Newton iterations as an inner ``lax.while_loop`` over a cached dense LU
  (``jax.scipy.linalg.lu_factor``) — batched dense LU is the TPU-friendly
  choice at the 10^2-10^3-species scale this framework targets (the
  reference's KLU sparsity trick does not map to the MXU),
* dense output evaluated from the BDF interpolating polynomial into a
  statically-shaped ``saveat`` grid,
* optional hard "stops" (sorted event times): steps are clamped so no step
  straddles a stop — the XLA-native formulation of the reference's discrete
  rate-update callbacks (solve_utils.jl:435-509): rate constants are pure
  functions of time looked up at the step start, and stops guarantee no
  step crosses a rate discontinuity,
* optional nonnegativity rejection (reference ``ban_negatives`` /
  ``isoutofdomain``, methods.jl:168-170).

Everything is jit- and vmap-compatible: vmapping the solve turns one stiff
integration into a lockstep batched integration (e.g. 256 condition
profiles per chip) with per-element masking.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from .linalg import (NewtonFactors, newton_factor, newton_solve,
                     warm_factor_refresh,
                     resolve_linsolve)

MAX_ORDER = 5
_DEBUG_TRACE = False  # set True for per-step-attempt prints (diagnosis only)
_DEBUG_DUMP = False   # with _DEBUG_TRACE: also dump Newton system inputs
# In-carry attempt trace: set to a row count N > 0 to record per-attempt
# (t, h, order, err_norm, n_it, converged, accept, nfail) rows into an
# (N, 8) f32 buffer returned as BDFResults.trace. Unlike _DEBUG_TRACE
# (jax.debug.print), this works on backends without host callbacks
# (e.g. remote-attached TPU). Diagnosis only — costs one
# dynamic_update_slice per attempt.
_TRACE_STEPS = 0
_NOISE_ACCEPT = 0.03  # scaled-units Newton noise-floor acceptance threshold
# Warm factor refresh (KINETICA_WARM_FACTOR=on enables): c-drift-only
# refactors reuse the previous inverse via Newton-Schulz matmul sweeps
# instead of a full Gauss-Jordan rebuild (ops/linalg.warm_factor_refresh).
# Measured OFF-by-default (r5, v5e, in-process A/B): flagship 1.739 ->
# 1.879 ms/step, nc=60 11.6 -> 13.0 — the Gauss-Jordan it skips is the
# SMALLER part of the compacted build (r5 trace: NS refine + phase-2
# residuals dominate), while the warm sweeps run uncompacted on the
# full batch at HIGHEST-precision matmul cost every refactor fire.
_WARM_FACTOR = os.environ.get("KINETICA_WARM_FACTOR", "off") == "on"
NEWTON_MAXITER = 4
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0

# Status codes
RUNNING = 0
DONE = 1
FAIL_MAX_STEPS = -1
FAIL_H_UNDERFLOW = -2


class BDFState(NamedTuple):
    t: jnp.ndarray
    h: jnp.ndarray
    order: jnp.ndarray        # int32 in 1..MAX_ORDER
    D: jnp.ndarray            # (MAX_ORDER+3, ns) backward differences
    n_equal_steps: jnp.ndarray
    lu: jnp.ndarray           # LU factors of (I - c_lu J)
    piv: jnp.ndarray
    J: jnp.ndarray
    current_jac: jnp.ndarray  # J evaluated at current state?
    c_lu: jnp.ndarray         # c value the LU was factorised with
    status: jnp.ndarray
    n_steps: jnp.ndarray
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    n_fev: jnp.ndarray
    n_jev: jnp.ndarray
    n_lu: jnp.ndarray
    save_ptr: jnp.ndarray
    ys: jnp.ndarray           # (n_save, ns)
    stop_ptr: jnp.ndarray
    bruised: jnp.ndarray      # recent Newton failure: limit h regrowth
    h_ncf: jnp.ndarray        # Newton-failure step ceiling (decays upward)
    trace: jnp.ndarray = None  # (_TRACE_STEPS, 8) attempt log (diagnosis)
    # chunked (async multi-chunk) mode only — see bdf_solve(chunks=...):
    nc: jnp.ndarray = None     # current chunk index (int32)
    ys_all: jnp.ndarray = None  # (n_chunks, n_save, ns) completed-chunk saves


class BDFResults(NamedTuple):
    ys: jnp.ndarray
    status: jnp.ndarray
    t: jnp.ndarray
    y_final: jnp.ndarray
    h: jnp.ndarray
    order: jnp.ndarray
    n_steps: jnp.ndarray
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    n_fev: jnp.ndarray
    n_jev: jnp.ndarray
    n_lu: jnp.ndarray
    # Final difference array + equal-step counter: together with (h, order)
    # these form the warm-start carry for seamless chunkwise continuation
    # (pass as ``warm_start=(D, order, n_equal_steps)`` with
    # ``first_step=h`` to the next segment's bdf_solve).
    D: jnp.ndarray = None
    n_equal_steps: jnp.ndarray = None
    trace: jnp.ndarray = None


def time_dtype(state_dtype):
    """The dtype bdf_solve carries time quantities (t, h) in.

    f64 when x64 is enabled regardless of the state dtype (time variables
    are scalars, so f64 emulation is free, while f32 time caps resolvable
    step ratios at h/t ~ 1e-7). Callers carrying ``BDFResults.h`` across
    chunkwise segments must initialise the carry in this dtype.
    """
    return jnp.float64 if jax.config.jax_enable_x64 else state_dtype


def _rms_norm(x):
    """Weighted RMS norm, computed in f32.

    Norms only feed *controller decisions* (Newton convergence tests, the
    error test, step-size factors) whose thresholds are heuristic at the
    1e-3 level, so f32's 1e-7 relative accuracy is far more than enough —
    while f64 scalar chains are ~12x slower on TPU (double-double
    emulation). Scaled inputs are clipped at 1e16 so squares can never
    overflow f32 (any norm above ~10 means "reject" regardless of its
    exact value, and 1e16 still compares/reciprocates finitely); raw-rate
    heuristics that need the true magnitude use :func:`_rms_norm_f64`.
    """
    x = jnp.clip(x.astype(jnp.float32), -1e16, 1e16)
    return jnp.sqrt(jnp.mean(x * x))


def _rms_norm_f64(x):
    # Scale-invariant formulation: TPU's emulated f64 (double-float) has
    # f64 precision but only f32 DYNAMIC RANGE (head word is f32, max
    # ~3.4e38). Stiff-rate quotients reach ~1e19-1e20 here, so the naive
    # mean(x*x) overflows the head to inf/NaN on TPU while passing on CPU.
    # Factoring out max|x| keeps every squared operand <= 1.
    m = jnp.max(jnp.abs(x))
    m_safe = jnp.where(m > 0.0, m, 1.0)
    return m * jnp.sqrt(jnp.mean(jnp.square(x / m_safe)))


def _scaled_norm(v, scale32):
    """_rms_norm(v / scale) with the division done in f32 too."""
    return _rms_norm(v.astype(jnp.float32) / scale32)


def _compute_R(factor, dtype):
    """(MAX_ORDER+1)^2 rescaling matrix: R[i,j] = prod_{m=1..i}(m-1-factor*j)/m.

    Column 0 is [1, 0, ...]; row 0 is all ones. Used to rescale the
    backward-difference array D when the step size changes by ``factor``.
    """
    n = MAX_ORDER + 1
    Iv = jnp.arange(1, n, dtype=dtype)[:, None]
    Jv = jnp.arange(1, n, dtype=dtype)[None, :]
    body = (Iv - 1 - factor * Jv) / Iv
    M = jnp.zeros((n, n), dtype=dtype)
    M = M.at[1:, 1:].set(body)
    M = M.at[0, :].set(1.0)
    return jnp.cumprod(M, axis=0)


def _change_D(D, order, factor):
    """Rescale D[:order+1] for a step-size change by ``factor``."""
    dtype = D.dtype
    factor = jnp.asarray(factor, dtype)
    RU = _compute_R(factor, dtype) @ _compute_R(jnp.asarray(1.0, dtype), dtype)
    idx = jnp.arange(MAX_ORDER + 1)
    active = (idx[:, None] <= order) & (idx[None, :] <= order)
    RU_m = jnp.where(active, RU, jnp.eye(MAX_ORDER + 1, dtype=dtype))
    # contract as broadcast+sum, not dot: f64 dot_general on TPU lowers to
    # a many-way f32 splitting emulation far costlier than these 6x6x-ns
    # elementwise ops
    Dn = jnp.sum(RU_m.T[:, :, None] * D[None, : MAX_ORDER + 1], axis=1)
    return D.at[: MAX_ORDER + 1].set(Dn)


def _bdf_constants(dtype):
    kappa = jnp.array([0.0, -0.1850, -1.0 / 9.0, -0.0823, -0.0415, 0.0], dtype=dtype)
    gamma = jnp.concatenate([
        jnp.zeros((1,), dtype),
        jnp.cumsum(1.0 / jnp.arange(1, MAX_ORDER + 1, dtype=dtype))])
    alpha = (1.0 - kappa) * gamma
    error_const = kappa * gamma + 1.0 / jnp.arange(1, MAX_ORDER + 2, dtype=dtype)
    return kappa, gamma, alpha, error_const


def select_initial_step(rhs, t0, y0, f0, tf, rtol, atol):
    """Hairer-style automatic initial step size (order-1 heuristic).

    State norms run in the solve dtype; the returned h is in the time
    dtype (f64 under x64) so tiny initial steps stay representable.
    """
    tdtype = t0.dtype if hasattr(t0, "dtype") else jnp.result_type(float)
    scale = atol + jnp.abs(y0) * rtol
    # full-precision norms here: f0/scale can reach ~1e20 (stiff rates over
    # tiny atol), far beyond the f32 range the clipped controller norm
    # assumes, and h0 ~ d0/d1 needs the true magnitudes
    d0 = _rms_norm_f64(y0 / scale).astype(tdtype)
    d1 = _rms_norm_f64(f0 / scale).astype(tdtype)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    h0 = jnp.minimum(h0, jnp.abs(tf - t0))
    h0 = jnp.maximum(h0, jnp.asarray(jnp.finfo(y0.dtype).tiny * 1e3, tdtype))
    y1 = y0 + h0.astype(y0.dtype) * f0
    f1 = rhs(t0 + h0, y1)
    d2 = _rms_norm_f64((f1 - f0) / scale).astype(tdtype) / h0
    h1 = jnp.where(jnp.maximum(d1, d2) <= 1e-15,
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / jnp.maximum(d1, d2)) ** 0.5)
    return jnp.minimum(100 * h0, jnp.minimum(h1, jnp.abs(tf - t0)))


@partial(jax.jit, static_argnames=("rhs", "jac", "max_steps", "nonnegative",
                                   "nonnegative_project", "lu_precision",
                                   "refine", "linsolve", "jac_policy",
                                   "prepare", "lu_drift_tol", "chunks"))
def bdf_solve(rhs: Callable, jac: Callable, y0: jnp.ndarray,
              t0, tf, saveat: jnp.ndarray,
              rtol=1e-8, atol=1e-10,
              stops: jnp.ndarray | None = None,
              max_steps: int = 100000,
              first_step=None,
              nonnegative: bool = False,
              nonnegative_project: bool = False,
              lu_precision: str = "mixed",
              refine: int = 1,
              linsolve: str = "auto",
              jac_policy: str = "lazy",
              lu_drift_tol: float = 0.1,
              prepare: Callable | None = None,
              warm_start=None,
              args=None,
              chunks: int | None = None,
              chunk_offsets: jnp.ndarray | None = None) -> BDFResults:
    """Integrate ``dy/dt = rhs(t, y, args)`` from t0 to tf with BDF(1-5).

    Args:
      rhs: (t, y, args) -> dy/dt, traceable.
      jac: (t, y, args) -> (ns, ns) Jacobian of rhs w.r.t. y, traceable.
      args: arbitrary traced pytree threaded to rhs/jac — lets callers embed
        per-solve data (chunk index, rate tables, batched parameters)
        without retracing.
      saveat: increasing times in (t0, tf] to record (static shape); entries
        <= t0 are skipped (callers emit u0 themselves).
      stops: optional sorted event times (padded with +inf); no step ever
        straddles one, and after hitting a stop the pre-clamp step size is
        restored.
      nonnegative: reject steps producing any negative component.
      nonnegative_project: clamp accepted states onto u >= 0 (tolerance-
        level projection; see the accept-path comment). Off by default —
        this is a generic integrator; the kinetics call sites enable it.
      warm_start: optional traced ``(D, order, n_equal_steps)`` carry from a
        previous segment's BDFResults. When ``order >= 1`` AND ``first_step``
        is a valid (finite, positive) carried h, integration RESUMES the
        previous segment's method state — difference array, order, step-
        equality counter — instead of restarting at order 1, eliminating the
        per-chunk order ramp-up that a cold chunkwise restart pays (~30% of
        all steps on a 28-chunk production sweep; the reference's reinit!
        resets this state, methods.jl:819, so this is strictly better than
        parity). The carried D is rescaled by ``_change_D`` when the chunk
        window clamps the first step below the carried h. Lanes whose carry
        is invalid (first chunk: order 0 / NaN h) fall back to the cold
        start, so one compiled program serves both cases.
      prepare: optional ``(t_stage, t_step_start, args) -> pre`` hook
        computing the step-invariant part of the model (for kinetics: the
        rate-constant vector k). BDF has a single implicit stage, so
        everything depending only on time is CONSTANT across the Newton
        iterations of a step attempt — but XLA does not hoist it out of
        the Newton while-loop on its own, and an emulated-f64 ``exp`` over
        every reaction per Newton iteration dominated the measured step
        cost on TPU. With ``prepare`` given, ``rhs``/``jac`` are called as
        ``fn(t, y, pre)`` and the hook runs once per step attempt.
      chunks: enable ASYNC-CHUNK mode — integrate ``chunks`` consecutive
        chunkwise-local-time segments of [t0, tf] inside ONE while_loop,
        performing the chunk transition (save-buffer dump, local-time
        reset, warm method-state carry) per lane inside the loop body.
        Motivation: a vmapped per-chunk loop synchronises every lane on
        the slowest lane of EACH chunk, executing sum_c(max_lane steps)
        iterations; measured on the production sweep that is 1.49x the
        async bound max_lane(sum_c steps) (scripts/attrib_sync_steps.py).
        Requirements: ``prepare`` given, ``stops``
        2-D with shape (chunks, n_stops_row) in CHUNK-LOCAL time (an
        extra +inf guard column is appended internally so a full row can
        never leak into the next chunk's stops), and ``chunk_offsets`` a
        (chunks,) vector of global time offsets threaded to ``prepare``
        as ``args[0]`` (prepare sees ``(chunk_offsets[nc], args)``).
        ``saveat`` is the per-chunk local grid; results ``ys`` gain a
        leading (chunks,) axis. ``max_steps`` bounds the TOTAL step count
        across all chunks. The method state (D, order, h, J, LU, h_ncf)
        carries across transitions — J/LU staleness across a boundary is
        handled by the same drift/refresh machinery that handles it
        between steps. Strictly-better-than-parity note as for
        ``warm_start`` (the reference's reinit! cold-restarts each chunk,
        methods.jl:819).
    """
    import inspect

    # Internal calling convention: fn(t_stage, y, t_step_start). Discrete
    # rate tables must be looked up at the *step start* (the reference's
    # callback fires at a tstop and affects subsequent steps only,
    # solve_utils.jl:488-509) while continuous profiles see the implicit
    # stage time; user functions opt in by arity:
    #   (t, y) | (t, y, args) | (t, y, args, t_step_start)
    def _adapt(fn):
        try:
            n_params = len(inspect.signature(fn).parameters)
        except (TypeError, ValueError):
            n_params = 3
        if n_params >= 4:
            return lambda t, y, t_start: fn(t, y, args, t_start)
        if n_params == 3:
            return lambda t, y, t_start: fn(t, y, args)
        return lambda t, y, t_start: fn(t, y)

    chunked = chunks is not None
    if chunked and (prepare is None or chunk_offsets is None):
        raise ValueError("chunks= mode requires prepare and chunk_offsets")
    # warm_start composes with chunks=: the carry initialises the FIRST
    # chunk of this call's range exactly as it would a single segment
    # (segmented-async mode — parallel/batching runs the horizon as a few
    # async chunk ranges with host progress reporting between dispatches)
    if prepare is not None:
        # rhs/jac have signature (t, y, pre); thread pre through the
        # t_start slot of the internal convention. _prep takes the chunk
        # index as a third arg (ignored outside chunked mode).
        user_rhs, user_jac = rhs, jac
        rhs = lambda t, y, pre: user_rhs(t, y, pre)
        jac = lambda t, y, pre: user_jac(t, y, pre)
        if chunked:
            _offsets = jnp.asarray(chunk_offsets)
            _prep = lambda t_stage, t_start, nc: prepare(
                t_stage, t_start, (_offsets[jnp.minimum(nc, chunks - 1)],
                                   args))
        else:
            _prep = lambda t_stage, t_start, nc: prepare(t_stage, t_start,
                                                         args)
    else:
        rhs = _adapt(rhs)
        jac = _adapt(jac)
        _prep = lambda t_stage, t_start, nc: t_start
    dtype = y0.dtype
    # Precision policy: STATE (y, D, J, LU, norms) in the solve dtype; TIME
    # (t, h, saveat, stops) always in f64 when available. Time variables
    # are scalars — f64 emulation costs nothing — while f32 time would cap
    # resolvable step ratios at h/t ~ 1.2e-7, far too coarse for stiff
    # transients late in a chunk. This is the deliberate TPU policy: f32
    # vectors/matrices on the fast units, f64 clocks on the side.
    tdtype = jnp.float64 if jax.config.jax_enable_x64 else dtype
    ns = y0.shape[0]
    t0 = jnp.asarray(t0, tdtype)
    tf = jnp.asarray(tf, tdtype)
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)
    saveat = jnp.asarray(saveat, tdtype)
    n_save = saveat.shape[0]
    if chunked:
        # Per-chunk stop rows in chunk-local time, flattened with an +inf
        # guard column so a fully-populated row can never leak the next
        # chunk's stops into this chunk (stop_ptr only advances on a hit,
        # and a hit on +inf is impossible).
        if stops is None:
            stops = jnp.full((chunks, 1), jnp.inf, dtype=tdtype)
        else:
            stops = jnp.asarray(stops, tdtype)
            if stops.ndim != 2 or stops.shape[0] != chunks:
                raise ValueError("chunked stops must have shape "
                                 f"({chunks}, n_stops_row)")
        stops = jnp.concatenate(
            [stops, jnp.full((chunks, 1), jnp.inf, dtype=tdtype)], axis=1)
        n_stops_row = stops.shape[1]
        _stops2d = stops
        stops = stops.reshape(-1)
    elif stops is None:
        stops = jnp.full((1,), jnp.inf, dtype=tdtype)
    else:
        stops = jnp.asarray(stops, tdtype)
    n_stops = stops.shape[0]

    _, gamma, alpha, error_const = _bdf_constants(dtype)
    alpha_t = alpha.astype(tdtype)
    # Controller precision policy: error norms, Newton convergence tests and
    # step/order factors are pure *decisions* with ~1e-3 meaningful
    # resolution, so they run in f32 (f64 scalar chains are ~12x slower on
    # TPU). State (y, D, residuals) stays in the solve dtype throughout —
    # the error ESTIMATE d = y_new - y_pred must resolve rtol-level
    # differences, only its NORM is taken in f32.
    f32 = jnp.float32
    error_const32 = error_const.astype(f32)
    newton_tol = jnp.maximum(10 * jnp.finfo(dtype).eps / rtol,
                             jnp.minimum(0.03, rtol ** 0.5)).astype(f32)
    eps = jnp.finfo(tdtype).eps

    nc0 = jnp.asarray(0, jnp.int32)
    pre0 = _prep(t0, t0, nc0)
    f0 = rhs(t0, y0, pre0)
    if first_step is None:
        fs_ok = jnp.asarray(False)
        fs = jnp.asarray(jnp.nan, tdtype)
        h_init = select_initial_step(lambda t, y: rhs(t, y, pre0), t0, y0, f0,
                                     tf, rtol, atol)
    else:
        # Traced first_step supports carrying the final h across chunkwise
        # segments (one compiled program); non-finite/<=0 values fall back
        # to the automatic heuristic so the first chunk can pass NaN.
        fs = jnp.asarray(first_step, tdtype)
        h_auto = select_initial_step(lambda t, y: rhs(t, y, pre0), t0, y0, f0,
                                     tf, rtol, atol)
        fs_ok = jnp.isfinite(fs) & (fs > 0.0)
        h_init = jnp.where(fs_ok, jnp.minimum(fs, jnp.abs(tf - t0)), h_auto)
    h_init = jnp.asarray(h_init, tdtype)

    D0 = jnp.zeros((MAX_ORDER + 3, ns), dtype)
    D0 = D0.at[0].set(y0).at[1].set(f0 * h_init.astype(dtype))
    order0 = jnp.asarray(1, jnp.int32)
    neq0 = jnp.asarray(0, jnp.int32)
    if warm_start is not None:
        # Resume the previous segment's method state (see docstring). The
        # cold D0/h_init above remain the fallback for invalid carries
        # (first chunk, or a lane whose previous chunk failed).
        D_w, order_w, neq_w = warm_start
        D_w = jnp.asarray(D_w, dtype)
        order_w = jnp.asarray(order_w, jnp.int32)
        warm_ok = fs_ok & (order_w >= 1)
        # The chunk window clamps h_init to (tf - t0); the carried D is
        # scaled for steps of the carried h — rescale to the actual start
        # h (factor 1 when no clamp applied).
        rescale = jnp.where(warm_ok, h_init / jnp.where(fs_ok, fs, h_init),
                            1.0)
        D_w = _change_D(D_w, jnp.maximum(order_w, 1), rescale)
        # Row 0 must be the caller's y0 exactly (accepted-state projection
        # or caller-side edits between chunks land in y0, not in the carry).
        D_w = D_w.at[0].set(y0)
        D0 = jnp.where(warm_ok, D_w, D0)
        order0 = jnp.where(warm_ok, order_w, order0)
        neq0 = jnp.where(warm_ok, jnp.asarray(neq_w, jnp.int32), neq0)

    # "full" keeps the LU in the solve dtype; TPU XLA implements
    # LuDecomposition only in F32, so full-precision LU is CPU-only and is
    # silently demoted to the mixed path elsewhere. Conversely on CPU the
    # native f64 LAPACK factor costs the same as f32, while the mixed
    # path's eps32*cond(A) refinement floor stalls Newton on saturated-
    # rate (cond ~ 1e8+) systems — promote "mixed" to the full factor.
    if lu_precision == "full" and jax.default_backend() != "cpu":
        lu_precision = "mixed"
    elif (lu_precision == "mixed" and jax.default_backend() == "cpu"
          and dtype == jnp.float64):
        lu_precision = "full"
    lu_dtype = jnp.float32 if lu_precision == "mixed" else dtype
    # Newton linear-solve method: explicit Pallas inverse on TPU ("inv"),
    # LAPACK LU on CPU / wide systems — see linalg.resolve_linsolve.
    linsolve = resolve_linsolve(linsolve, ns)
    if linsolve in ("inv", "inv_fused", "inv_gated"):
        lu_dtype = jnp.float32
    if linsolve == "inv_fused":
        # Tile-align the Newton linear algebra ONCE at the source: the
        # Jacobian is padded to the Pallas sublane multiple right after
        # evaluation (gated, rare), so the per-solve kernel operands
        # (J, and the factor inverse, which inherits the padding through
        # I - cJ) are already aligned — unaligned operands cost Mosaic
        # an on-stack relayout copy per matrix per launch (measured:
        # VMEM-stack OOM at B=64/ns=73), and padding per *solve* in XLA
        # costs two (B, ns, ns) copies per Newton iteration instead of
        # zero. The padded block of I - cJ is an exact identity, so the
        # factor, equilibration scales and solves are unchanged on the
        # real rows; solve rhs/solution vectors stay (ns,)-sized.
        ns_pad = ((ns + 7) // 8) * 8
        if ns_pad != ns:
            jac_raw = jac

            def jac(t, y, pre):
                Jr = jac_raw(t, y, pre)
                return jnp.zeros((ns_pad, ns_pad), Jr.dtype
                                 ).at[:ns, :ns].set(Jr)

    J0 = jac(t0, y0, pre0)
    # Lane-compacted jac refresh (ops/gating.lane_compacted): under vmap
    # the Newton-failure J rebuild is gathered to the needing lanes only;
    # unbatched solves run fn directly (the custom_vmap primal). Width-
    # gated: at one-tile scale the jac (matmul form) is cheap enough that
    # the compaction's argsort/gather/scatter overhead loses (bench
    # 31.2 -> 33.8 ms/profile at ns=73), while at multi-tile scale the
    # ~7 ms/fire jac makes it win (199.1 -> 188.5 ms/profile at ns=181).
    # KINETICA_JAC_GATE=on|off overrides the width heuristic for A/B.
    _jg = os.environ.get("KINETICA_JAC_GATE", "auto")
    if _jg == "on" or (_jg != "off" and ns >= 128):
        from .gating import lane_compacted
        jac_gated = lane_compacted(jac)
    else:
        def jac_gated(_need, t, y, pre):
            return jac(t, y, pre)
    c0 = h_init / alpha_t[order0]
    fact0 = newton_factor(J0, c0.astype(dtype), lu_dtype, method=linsolve)
    lu0, piv0 = fact0.lu, fact0.piv

    tspan_scale = jnp.maximum(jnp.abs(tf), 1.0)
    if chunked:
        # initial in-row stop offset per chunk (rows are chunk-local, all
        # starting at t0) — reused by the in-loop chunk transition
        row_ptr0 = jax.vmap(
            lambda r: jnp.searchsorted(r, t0 + 4 * eps * tspan_scale,
                                       side="left"))(_stops2d
                                                     ).astype(jnp.int32)
        stop_ptr0 = row_ptr0[0]
    else:
        stop_ptr0 = jnp.searchsorted(stops, t0 + 4 * eps * tspan_scale,
                                     side="left")
    save_ptr0 = jnp.searchsorted(saveat, t0, side="right")

    state0 = BDFState(
        t=t0, h=h_init, order=order0, D=D0,
        n_equal_steps=neq0,
        lu=lu0, piv=piv0, J=J0,
        current_jac=jnp.asarray(True), c_lu=c0,
        status=jnp.asarray(RUNNING, jnp.int32),
        n_steps=jnp.asarray(0, jnp.int32), n_accepted=jnp.asarray(0, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32), n_fev=jnp.asarray(2, jnp.int32),
        n_jev=jnp.asarray(1, jnp.int32), n_lu=jnp.asarray(1, jnp.int32),
        save_ptr=save_ptr0.astype(jnp.int32),
        ys=jnp.zeros((n_save, ns), dtype),
        bruised=jnp.asarray(False),
        stop_ptr=stop_ptr0.astype(jnp.int32),
        h_ncf=jnp.asarray(jnp.inf, tdtype),
        trace=(jnp.zeros((_TRACE_STEPS, 8), jnp.float32)
               if _TRACE_STEPS else None),
        nc=nc0,
        ys_all=(jnp.zeros((chunks, n_save, ns), dtype) if chunked else None),
    )

    def newton_iterate(t_new, pre, y_pred, c, psi, scale, fact):
        """Simplified Newton: find d with d = c f(t_new, y_pred + d) - psi."""
        def cond(carry):
            it, converged, diverged = carry[0], carry[1], carry[2]
            return (~converged) & (~diverged) & (it < NEWTON_MAXITER)

        def body(carry):
            it, converged, diverged, d, y, dy_norm_old = carry
            f = rhs(t_new, y, pre)
            res = c * f - psi - d
            dy = newton_solve(fact, res, refine=refine, method=linsolve)
            dy_norm = _scaled_norm(dy, scale)
            rate = jnp.where(it > 0,
                             dy_norm / jnp.maximum(dy_norm_old,
                                                   jnp.finfo(f32).tiny),
                             jnp.asarray(jnp.inf, f32))
            # Updates far below the Newton tolerance are converged no matter
            # what the rate estimate says — at that magnitude dy sits on the
            # linear-solve noise floor (f32 LU preconditioning) and the
            # rate is meaningless; without this, quiescent steady states
            # churn through spurious rate>=1 "divergences" and step cuts.
            small = dy_norm < 0.03 * newton_tol
            # Abort only on CLEAR divergence (growing updates). CVODE and
            # scipy also abort when the projected tail
            # rate**(m-it)/(1-rate)*dy cannot reach tol — an optimisation
            # for expensive RHS evaluations that is a pessimisation here:
            # with f32-preconditioned solves the early-iteration "rate"
            # is contaminated by linear-solve error (measured ~0.2 where
            # the true contraction is ~1e-3), so the projection spuriously
            # kills steps whose next iteration would converge outright
            # (a re-added it>=2 projected kill measurably broke
            # forward-sensitivity/FD smoothness). RHS evals are cheap on
            # this stack; let Newton use its full iteration budget.
            bad = (~small) & (it > 0) & (rate >= 1.2)
            d = d + dy
            y = y + dy
            conv = small | jnp.where(
                it > 0,
                (rate < 1.0) & (rate / (1 - rate) * dy_norm < newton_tol),
                dy_norm == 0.0)
            if _DEBUG_TRACE:
                jax.debug.print(
                    "  newton it={i} dy={d:.3e} rate={r:.3e} conv={c} bad={b}",
                    i=it, d=dy_norm, r=rate, c=conv, b=bad & (~conv))
            return (it + 1, conv, bad & (~conv), d, y, dy_norm)

        init = (jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(False),
                jnp.zeros_like(y_pred), y_pred, jnp.asarray(0.0, f32))
        it, converged, diverged, d, y, dy_last = lax.while_loop(
            cond, body, init)
        # Post-hoc noise reclassification: an exit (divergence-flagged or
        # iteration-capped) whose LAST update was below 0.03 scale-units
        # is treated as converged at the arithmetic's noise floor (the
        # f64 RHS rounding floor c*eps*gross_flux/scale on saturated-rate
        # CRNs sits at ~1e-3..1e-2 scaled, above newton_tol, so strict
        # Newton can never "prove" convergence there and the stepper
        # rejects its way into an ever-smaller-h trap; measured 35k-100k
        # steps/chunk where scipy takes ~100). Accuracy bound: for an
        # iteration-capped non-growing tail the residual uncertainty in d
        # is <~ 3% of the accuracy target; for a divergence-flagged exit
        # (rate >= 1.2) that geometric bound does NOT hold — but at the
        # noise floor the rate estimate itself is dominated by
        # linear-solve noise (measured ~0.2 apparent rate where the true
        # contraction is ~1e-3), so the "divergence" classification is
        # unreliable there, and the step ERROR TEST remains the actual
        # accuracy guard. Excluding diverged exits was tried (ADVICE r2)
        # and measured a 20x step-count regression on the saturated
        # full-ramp CRN (15.8k -> 314k steps) with no accuracy change —
        # the flagged exits there are exactly the spurious ones. Applied
        # ONLY at loop exit: rescuing would-be failures leaves
        # ordinarily-converging steps at full strict-test accuracy (an
        # in-loop version measurably degraded forward-sensitivity/FD
        # agreement to 16%).
        del diverged
        converged = converged | ((it > 0) & (dy_last < _NOISE_ACCEPT))
        return converged, it, y, d

    def fill_saveat(t_new, h, order, D, save_ptr, ys):
        """Record BDF dense output at saveat points in (t_prev, t_new]."""
        t_shift = t_new - h * jnp.arange(MAX_ORDER, dtype=tdtype)
        denom = h * (1.0 + jnp.arange(MAX_ORDER, dtype=tdtype))

        def dense_eval(tq):
            # interpolation abscissae in time dtype; polynomial contraction
            # against D in the state dtype
            x = (tq - t_shift) / denom
            p = jnp.cumprod(x)
            p = jnp.where(jnp.arange(MAX_ORDER) < order, p, 0.0)
            # broadcast+sum instead of an f64 dot (see _change_D comment)
            return D[0] + jnp.sum(p.astype(dtype)[:, None]
                                  * D[1: MAX_ORDER + 1], axis=0)

        def cond(carry):
            ptr, _ = carry
            in_range = saveat[jnp.minimum(ptr, n_save - 1)] <= t_new + 4 * eps * tspan_scale
            return (ptr < n_save) & in_range

        def body(carry):
            ptr, ys = carry
            yq = dense_eval(saveat[ptr])
            ys = lax.dynamic_update_slice(ys, yq[None, :], (ptr, jnp.asarray(0, ptr.dtype)))
            return ptr + 1, ys

        return lax.while_loop(cond, body, (save_ptr, ys))

    def step_attempt(s: BDFState) -> BDFState:
        t = s.t
        h_pre = s.h
        order = s.order

        # --- clamp h so no step straddles tf or the next stop ---
        # Underflow floor is relative to the *current* t (plus a tiny absolute
        # floor), so fast transients near t=0 can take arbitrarily small
        # steps — chunkwise solves keep |t| local precisely to exploit this
        # (reference implementation-details.md:5-28).
        h_min = jnp.abs(t) * eps * 10 + jnp.finfo(tdtype).tiny * 1e4
        next_stop = jnp.where(s.stop_ptr < n_stops,
                              stops[jnp.minimum(s.stop_ptr, n_stops - 1)],
                              jnp.asarray(jnp.inf, tdtype))
        t_bound = jnp.minimum(tf, next_stop)
        dist = t_bound - t
        # Stretch-clamp: if the step would reach within 2% of the boundary,
        # stretch/shrink it to land exactly — avoids leaving degenerate
        # sliver steps whose extreme D rescalings destroy the history.
        clamp = (t + 1.02 * h_pre) >= (t_bound - 4 * eps * tspan_scale)
        h = jnp.where(clamp, jnp.maximum(dist, h_min), h_pre)
        D = jnp.where(clamp, _change_D(s.D, order, h / h_pre), s.D)
        n_equal_steps = jnp.where(clamp, jnp.asarray(0, jnp.int32), s.n_equal_steps)
        t_new = jnp.where(clamp, t_bound, t + h)

        # --- predictor ---
        idx = jnp.arange(MAX_ORDER + 3)
        y_pred = jnp.sum(jnp.where((idx <= order)[:, None], D, 0.0), axis=0)
        # scale vectors only feed f32 norms — compute them in f32, with the
        # magnitude clamped below f32-max so transiently diverging lanes
        # keep a finite scale (inf scale would zero the error norm and
        # spuriously ACCEPT the blown-up step)
        atol32, rtol32 = atol.astype(f32), rtol.astype(f32)

        def _scale32(y):
            ab = jnp.minimum(jnp.abs(y), 1e37).astype(f32)
            return atol32 + rtol32 * ab

        scale_pred = _scale32(y_pred)
        gamma_w = jnp.where((idx >= 1) & (idx <= order),
                            gamma[jnp.minimum(idx, MAX_ORDER)], 0.0)
        psi = jnp.sum(gamma_w[:, None] * D, axis=0) / alpha[order]
        c = h / alpha_t[order]          # time dtype (h may be < f32 tiny)
        c_state = c.astype(dtype)       # state-dtype copy for Newton algebra

        pre = _prep(t_new, t, s.nc)
        if jac_policy == "always":
            # Optional policy: evaluate J and refactor at EVERY step
            # attempt. Under vmap, lax.cond lowers to select-with-both-
            # branches, so the lazy path's jac+factor work is computed
            # every step anyway — caching saves nothing on accelerators —
            # and a fresh J avoids stale-J Newton retry cycles on
            # fast-evolving chemistry. NOT the default: measured on f32
            # solves of the saturated synthetic CRN, J evaluated at wild
            # transient predictor states destabilised Newton where the
            # lazy path's last-good-state J rode through (67 vs 100k
            # steps on one chunk); with the noise-reclassification and
            # h_ncf fixes the lazy policy matches "always" on the stiff
            # f64 benchmarks as well.
            J = jac(t_new, y_pred, pre)
            f_new = newton_factor(J, c_state, lu_dtype, method=linsolve)
            lu, piv = f_new.lu, f_new.piv
            n_lu = s.n_lu + 1
            n_jev = s.n_jev + 1
            fact = NewtonFactors(lu=lu, piv=piv, J=J, c=c_state)
            converged, n_it, y_new, d = newton_iterate(
                t_new, pre, y_pred, c_state, psi, scale_pred, fact)
            refresh = jnp.asarray(False)
            current_jac = jnp.asarray(True)
            c_lu_next = c
        else:
            # --- LU cache: refactor only if c drifted substantially ---
            # CVODE-style wide tolerance (its dgmax=0.3): factors built at
            # a stale c' stay useful because newton_solve's f64 iterative
            # refinement targets the residual of the CURRENT (I - c J) —
            # each sweep contracts the solve error by ~|1 - c/c'|, so
            # moderate drifts cost at most a few adaptive sweeps (which
            # themselves zero-trip when unneeded) instead of a refactor.
            # ``lu_drift_tol`` trades refactor frequency against Newton
            # quality: too wide and the worst lane's step count grows
            # (batch-synchronous cost follows the max lane).
            # (A per-lane threshold jitter was tried here to de-correlate
            # batch refresh epochs — ~19% of nc=60 steps see >B/2 lanes
            # drift together, forcing the compaction's full-batch
            # fallback — but measured WORSE: +-15% jitter raised both
            # steps (894 -> 994 max) and ms/step (13.5 -> 14.4) at nc=60
            # because lowered-threshold lanes refresh more often without
            # actually spreading the correlated epochs.)
            need_lu = jnp.abs(c - s.c_lu) > lu_drift_tol * jnp.abs(c)

            # GATING, not lax.cond: under vmap, cond lowers to select-
            # with-both-branches, so the factor path (Pallas Gauss-Jordan
            # + Newton-Schulz, ~0.5 ms at B=64/ns=73) would run EVERY
            # step although lanes refactor only ~0.07x/step. A zero-trip
            # while_loop is batched as run-while-ANY-lane-needs-it with
            # per-lane carry masking — the whole batch skips the factor
            # entirely on the (common) steps where no lane drifted.
            def refactor_body(carry):
                del carry
                # need_lu rides into the factor: with linsolve="inv_gated"
                # the batch rule compacts the Gauss-Jordan + Newton-Schulz
                # build to the needing lanes only (the ANY-lane gate fires
                # ~every step at B=64 although each lane refactors ~0.2x/
                # step). Non-needing lanes receive zeros OR arbitrary
                # bucket fill-in values (the compaction scatters valid
                # inverses into up to bucket-minus-count fill lanes) and
                # MUST be masked by the caller — here the while_loop's
                # per-lane carry masking discards them.
                if linsolve == "inv_gated" and _WARM_FACTOR:
                    # Warm refresh first: most refactors are c-drift-only,
                    # where the old inverse is within lu_drift_tol of the
                    # new one and 3 Newton-Schulz matmul sweeps replace
                    # the whole equilibrate+Gauss-Jordan+refine build
                    # (ops/linalg.warm_factor_refresh). Only lanes whose
                    # warm residual stays above tolerance (fresh J, or
                    # saturated conditioning) take the compacted full
                    # build.
                    M_warm, need_full = warm_factor_refresh(
                        s.J, c_state, s.lu, need_lu)
                    f = newton_factor(s.J, c_state, lu_dtype,
                                      method=linsolve, need=need_full)
                    lu_new = jnp.where(need_full, f.lu, M_warm)
                    return jnp.asarray(False), lu_new, f.piv
                f = newton_factor(s.J, c_state, lu_dtype, method=linsolve,
                                  need=need_lu)
                return jnp.asarray(False), f.lu, f.piv

            _, lu, piv = lax.while_loop(lambda cr: cr[0], refactor_body,
                                        (need_lu, s.lu, s.piv))
            n_lu = s.n_lu + need_lu.astype(jnp.int32)
            fact = NewtonFactors(lu=lu, piv=piv, J=s.J, c=c_state)

            converged, n_it, y_new, d = newton_iterate(
                t_new, pre, y_pred, c_state, psi, scale_pred, fact)

            # Newton failed on a stale Jacobian: refresh J and redo the
            # step on the *next* outer iteration instead of retrying
            # in-line (costs one extra outer iteration only when a lane
            # actually fails; CVODE structures its retry the same way).
            # Zero-trip gating skips the whole batch when NO lane needs a
            # refresh, and ``lane_compacted`` additionally compacts the
            # evaluation to the needing lanes when the any-lane gate
            # fires anyway (r3 trace: the gated jac fired ~0.4x/step
            # COLLECTIVELY at 2.1 ms/fire although per-lane rates are
            # ~0.01-0.26 — same any-lane economics as the factor path).
            # Non-refresh lanes receive zeros/fill-in from the compaction
            # and are discarded by the batched while_loop's per-lane
            # carry select, which keeps their old J.
            refresh = (~converged) & (~s.current_jac)

            def jac_body(carry):
                del carry
                return jnp.asarray(False), jac_gated(refresh, t_new,
                                                     y_pred, pre)

            _, J = lax.while_loop(lambda cr: cr[0], jac_body,
                                  (refresh, s.J))
            current_jac = s.current_jac | refresh
            n_jev = s.n_jev + refresh.astype(jnp.int32)
            # Force an LU refactor with the fresh J next iteration. c_lu
            # tracks the c at which the LU was last BUILT, so it only
            # advances when need_lu actually refactored — overwriting it
            # with the current attempt's c every step let sub-tolerance
            # per-step drifts accumulate unboundedly without ever firing
            # need_lu, leaving Newton iterating against an arbitrarily
            # stale LU (observed: saturated-k lanes wedged at 4-iteration
            # rescue/reject creep with n_lu frozen at 1).
            c_lu_next = jnp.where(refresh, jnp.asarray(-jnp.inf, tdtype),
                                  jnp.where(need_lu, c, s.c_lu))

        safety = (0.9 * (2 * NEWTON_MAXITER + 1)
                  / (2 * NEWTON_MAXITER + n_it.astype(f32)))

        # --- error test (norms and factors in f32; d itself stays f64) ---
        # The d/scale quotient is formed in the state dtype and only the
        # result cast to f32: with atol below f32-tiny (~1.2e-38) both an
        # f32 d and an f32 scale underflow to 0, giving err_norm 0 and
        # spurious acceptance; the quotient itself is O(1) and f32-safe.
        scale_full = (atol.astype(d.dtype)
                      + rtol.astype(d.dtype)
                      * jnp.minimum(jnp.abs(y_new),
                                    jnp.asarray(1e37, d.dtype)))
        err_norm = _rms_norm(error_const32[order]
                             * (d / scale_full).astype(f32))
        neg = jnp.asarray(nonnegative) & (jnp.min(y_new) < 0.0)
        accept = converged & (err_norm <= 1.0) & (~neg)
        if _DEBUG_TRACE:
            jax.debug.print(
                "step t={t:.6e} h={h:.3e} ord={o} conv={c} nit={n} "
                "err={e:.3e} acc={a}",
                t=t, h=h, o=order, c=converged, n=n_it, e=err_norm, a=accept)
            if _DEBUG_DUMP:
                jax.debug.print("DUMP c={c} ypred={yp} psi={ps}",
                                c=c_state, yp=y_pred, ps=psi)

        def _safe_factor(factor, fallback=0.5):
            ok = jnp.isfinite(factor) & (factor > 0.0)
            return jnp.where(ok, factor, jnp.asarray(fallback, f32))

        # ---- flattened outcome merge ----
        # Under vmap, lax.cond lowers to select-with-both-branches, so a
        # branch cascade executes every branch for every lane anyway while
        # paying per-branch whole-state selects AND one D-rescale per
        # branch. Computing all outcome scalars up front and doing a single
        # _change_D + field-wise where is the same arithmetic with ~4x
        # fewer kernels in the hot while body.

        # accept path: update differences, dense output, order adaptation
        n_eq_acc = n_equal_steps + 1
        # Projection onto u >= 0 for accepted steps: the error test has
        # already passed on the honest d, so zeroing tolerance-level
        # negative wiggles is within the accepted error budget. Without it,
        # species pinned at ~0 chatter across the rate-clip boundary
        # (models evaluate rates on max(u, 0)) and the controller grinds at
        # tiny h; with it they land exactly on 0 and stay until produced.
        d_proj = jnp.where(nonnegative_project,
                           jnp.maximum(y_new, 0.0) - y_pred, d)
        # Difference-array update, as mask arithmetic instead of dynamic
        # row indexing. The reference recursion
        #   D[order+2] = d - D[order+1];  D[order+1] = d
        #   for j = order..0: D[j] += D[j+1]
        # telescopes to suffix sums D_new[j] = sum_{m=j}^{order+1} D_mid[m]
        # for j <= order — one reversed cumsum — where sequential
        # dynamic_update_slice rows cost ~90 us each on TPU (~0.8 ms/step
        # of pure row-update kernels at order 5).
        rowm = idx[:, None]
        selq = (idx == order + 1)[:, None]
        Dq1 = jnp.sum(jnp.where(selq, D, 0.0), axis=0)   # D[order+1]
        D_mid = jnp.where(selq, d_proj,
                          jnp.where(rowm == order + 2, d_proj - Dq1, D))
        contrib = jnp.where(rowm <= order + 1, D_mid, 0.0)
        suffix = jnp.cumsum(contrib[::-1], axis=0)[::-1]
        D2 = jnp.where(rowm <= order, suffix, D_mid)

        save_ptr2, ys2 = fill_saveat(t_new, h, order, D2, s.save_ptr, s.ys)

        done = t_new >= tf - 4 * eps * tspan_scale
        hit_stop = jnp.abs(t_new - next_stop) <= 4 * eps * tspan_scale

        def adapt():
            od = order.astype(f32)
            err_m = jnp.where(
                order > 1,
                _rms_norm(error_const32[jnp.maximum(order - 1, 0)]
                          * (D2[order] / scale_full).astype(f32)),
                jnp.asarray(jnp.inf, f32))
            err_p = jnp.where(
                order < MAX_ORDER,
                _rms_norm(error_const32[jnp.minimum(order + 1, MAX_ORDER)]
                          * (D2[order + 2] / scale_full).astype(f32)),
                jnp.asarray(jnp.inf, f32))

            # err ** (-1/q) with guards: TPU's emulated pow returns NaN
            # for inf bases (CPU returns 0), which froze the step size
            # permanently; clip the base and resolve the 0/inf cases with
            # selects instead.
            def err_factor(err, inv_q):
                fi = jnp.finfo(f32)
                base = jnp.clip(err, jnp.asarray(fi.tiny * 1e3, f32),
                                jnp.asarray(fi.max / 1e3, f32))
                f = base ** (-inv_q)
                f = jnp.where(err <= 0.0, jnp.asarray(MAX_FACTOR, f32), f)
                return jnp.where(jnp.isfinite(err), f,
                                 jnp.asarray(0.0, f32))

            f_m = err_factor(err_m, 1.0 / od)
            f_0 = err_factor(err_norm, 1.0 / (od + 1))
            f_p = err_factor(err_p, 1.0 / (od + 2))
            factors = jnp.stack([f_m, f_0, f_p])
            best = jnp.argmax(factors)
            new_order = jnp.clip(order + best.astype(jnp.int32) - 1, 1, MAX_ORDER)
            factor = jnp.clip(safety * factors[best], MIN_FACTOR, MAX_FACTOR)
            return new_order, factor

        do_adapt = (n_eq_acc >= order + 1) & (~clamp)
        new_order, factor_acc = lax.cond(
            do_adapt, adapt, lambda: (order, jnp.asarray(1.0, f32)))
        factor_acc = _safe_factor(factor_acc, 1.0)
        # CVODE-style growth limiter: after a Newton failure at larger h,
        # the error estimate at the reduced h says "grow x10" again, and
        # the solver thrashes in an accept/10x/diverge/halve cycle that
        # never builds order and leaks tolerance-level negative errors.
        # Hold h for the first accepted step after any Newton failure.
        factor_acc = jnp.where(s.bruised, jnp.minimum(factor_acc, 1.0),
                               factor_acc)
        # Newton-failure hysteresis: the error test says nothing about
        # how large a step NEWTON can handle, and in fast-equilibrium
        # regimes (saturated rate constants) the nonlinearity — not the
        # truncation error — binds h. Remember the step size at which
        # Newton last failed and cap regrowth just below it; the ceiling
        # relaxes x1.5 per accepted step so larger steps are re-probed
        # geometrically instead of by x10 jumps that cascade 3-4
        # failures each (measured: a grow/fail^3/halve^3 limit cycle
        # burned >10x the necessary steps on the getting-started CRN).
        ncf_cap = jnp.where(
            jnp.isfinite(s.h_ncf),
            jnp.maximum(jnp.asarray(1.0, f32),
                        jnp.minimum(0.9 * s.h_ncf / h,
                                    1e30).astype(f32)),
            jnp.asarray(MAX_FACTOR, f32))
        factor_acc = jnp.minimum(factor_acc, _safe_factor(ncf_cap, MAX_FACTOR))
        # After a clamped (stop/tf-hitting) step, restore the pre-clamp h
        # (capped: an uncapped restore from a sliver step would scale the
        # high-order differences by factor**order and overflow them).
        # The restore OVERRIDES the failure-hysteresis caps: a sliver
        # step's h says nothing about Newton's true h limit, and capping
        # the restore strands the solver at the sliver size (measured:
        # f32 discrete-stop solves ground to maxiters).
        factor_acc = jnp.where(clamp,
                               _safe_factor(jnp.minimum(h_pre / h, MAX_FACTOR
                                                        ).astype(f32), 1.0),
                               factor_acc)
        rescale_acc = clamp | do_adapt

        # error-reject factor
        od = order.astype(f32)
        factor_rej = _safe_factor(jnp.clip(safety * err_norm ** (-1.0 / (od + 1)),
                                           MIN_FACTOR, 1.0), MIN_FACTOR)
        factor_rej = jnp.where(neg, jnp.minimum(factor_rej, jnp.asarray(0.5, f32)),
                               factor_rej)

        # outcome flags: accept | error-reject | jac-refresh | newton-fail
        reject = converged & (~accept)
        nfail = (~converged) & (~refresh)

        order_next = jnp.where(accept, new_order, order)
        factor = jnp.where(
            accept, factor_acc.astype(tdtype),
            jnp.where(reject, factor_rej.astype(tdtype),
                      jnp.where(nfail, jnp.asarray(0.5, tdtype),
                                jnp.asarray(1.0, tdtype))))
        rescale = jnp.where(accept, rescale_acc, reject | nfail)
        D_base = jnp.where(accept, D2, D)
        D_next = jnp.where(rescale, _change_D(D_base, order_next, factor), D_base)
        h_next = jnp.where(rescale, h * factor, h)
        n_eq_next = jnp.where(
            accept, jnp.where(rescale_acc, 0, n_eq_acc),
            jnp.where(refresh, n_equal_steps, 0)).astype(jnp.int32)

        s_new = s._replace(
            t=jnp.where(accept, t_new, t),
            h=h_next, order=order_next, D=D_next, n_equal_steps=n_eq_next,
            lu=lu, piv=piv, J=J,
            c_lu=c_lu_next,
            current_jac=jnp.where(accept, jnp.asarray(False), current_jac),
            status=jnp.where(accept & done, DONE, s.status).astype(jnp.int32),
            n_accepted=s.n_accepted + accept.astype(jnp.int32),
            n_rejected=s.n_rejected + (reject | nfail).astype(jnp.int32),
            save_ptr=jnp.where(accept, save_ptr2, s.save_ptr),
            ys=jnp.where(accept, ys2, s.ys),
            stop_ptr=jnp.where(accept, s.stop_ptr + hit_stop.astype(jnp.int32),
                               s.stop_ptr),
            n_jev=n_jev, n_lu=n_lu,
            n_fev=s.n_fev + n_it,
            n_steps=s.n_steps + 1,
            bruised=jnp.where(accept, jnp.asarray(False), s.bruised | nfail),
            h_ncf=jnp.where(nfail & (~clamp), h,
                            jnp.where(accept, s.h_ncf * 1.5, s.h_ncf)))
        if _TRACE_STEPS:
            row = jnp.stack([
                t.astype(f32), h.astype(f32), order.astype(f32), err_norm,
                n_it.astype(f32), converged.astype(f32), accept.astype(f32),
                nfail.astype(f32)])
            s_new = s_new._replace(trace=lax.dynamic_update_slice(
                s.trace, row[None], (s.n_steps, jnp.asarray(0, jnp.int32))))
        too_many = s_new.n_steps >= max_steps
        # NaN/inf poisoning of the controller state never recovers, and —
        # because NaN comparisons are all False — it fails NEITHER the
        # h-underflow test NOR the refactor/convergence gates, so a
        # poisoned lane would spin at t0 until max_steps (observed on TPU
        # when a pre-fix range overflow NaN'd h_init: 6000 dead attempts,
        # ~3 min of device time). Abort the lane immediately instead.
        h_under = (s_new.h < h_min) | ~(jnp.isfinite(s_new.h)
                                        & jnp.isfinite(s_new.t))
        status = jnp.where(s_new.status == DONE, DONE,
                           jnp.where(too_many, FAIL_MAX_STEPS,
                                     jnp.where(h_under, FAIL_H_UNDERFLOW, RUNNING)))
        return s_new._replace(status=status.astype(jnp.int32))

    def loop_cond(s: BDFState):
        return s.status == RUNNING

    if chunked:
        def chunk_transition(s: BDFState) -> BDFState:
            """Per-lane advance to the next chunk, inside the loop body.

            The warm carry is the state itself: D/order/h/J/LU/h_ncf ride
            through unchanged (only D is rescaled in the rare case the
            carried h exceeds the chunk span). Local time resets to t0 and
            the save buffer is dumped into this chunk's ys_all slot.
            """
            ys_all = lax.dynamic_update_slice(
                s.ys_all, s.ys[None],
                (s.nc, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
            nc2 = s.nc + 1
            span = tf - t0
            h2 = jnp.minimum(s.h, span)
            shrink = h2 < s.h
            D2 = jnp.where(shrink,
                           _change_D(s.D, s.order, jnp.where(shrink,
                                                             h2 / s.h, 1.0)),
                           s.D)
            stop_ptr2 = (nc2 * n_stops_row
                         + row_ptr0[jnp.minimum(nc2, chunks - 1)])
            return s._replace(
                t=t0, h=h2, D=D2, nc=nc2,
                ys=jnp.zeros_like(s.ys), ys_all=ys_all,
                save_ptr=save_ptr0.astype(jnp.int32),
                stop_ptr=stop_ptr2.astype(jnp.int32),
                status=jnp.asarray(RUNNING, jnp.int32),
                n_equal_steps=jnp.where(shrink, 0,
                                        s.n_equal_steps).astype(jnp.int32))

        def loop_body(s: BDFState):
            s = lax.cond(s.status == RUNNING, step_attempt, lambda x: x, s)
            do_trans = (s.status == DONE) & (s.nc < chunks - 1)
            return lax.cond(do_trans, chunk_transition, lambda x: x, s)
    else:
        def loop_body(s: BDFState):
            # Guarded so vmapped lanes that are already done stay frozen.
            return lax.cond(s.status == RUNNING, step_attempt, lambda x: x, s)

    final = lax.while_loop(loop_cond, loop_body, state0)

    if chunked:
        # The final chunk (or the chunk a failed lane died in) is still in
        # the local buffer — dump it into its slot.
        ys_out = lax.dynamic_update_slice(
            final.ys_all, final.ys[None],
            (final.nc, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
    else:
        ys_out = final.ys

    return BDFResults(
        ys=ys_out, status=final.status, t=final.t, y_final=final.D[0],
        h=final.h, order=final.order,
        n_steps=final.n_steps, n_accepted=final.n_accepted,
        n_rejected=final.n_rejected, n_fev=final.n_fev,
        n_jev=final.n_jev, n_lu=final.n_lu,
        D=final.D, n_equal_steps=final.n_equal_steps, trace=final.trace)
