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
(B, ns). This keeps a single compiled program for the whole sweep;
:class:`EnsembleProblem` holds that program so repeated sweeps (exploration
loops, benchmarks) pay compilation once.
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..conditions.condition_set import ConditionSet
from ..core.network import RxData, SpeciesData
from ..models.mass_action import MassActionNetwork, build_mass_action
from ..ops import bdf
from ..solving.methods import (VariableODESolve, _chunk_local_stops,
                               _chunk_save_grid, _jac_dtype, _make_rhs_jac)
from ..solving.solutions import EnsembleSolution, retcode_from_status
from ..solving.solve_utils import (calculate_discrete_rates, make_u0,
                                   resolve_chunks_per_dispatch)
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
    # Host-side precompute: keep the per-member profile/calculator
    # evaluations on the CPU backend — with a remote accelerator attached,
    # each jnp call here would otherwise be a ~25-45 ms tunnel dispatch,
    # B of them per sweep build.
    cpu = jax.devices("cpu")[0]
    tstops_cpu = jax.device_put(tstops, cpu)
    for cs in conditions_list:
        bound = dict(cs.get_static_conditions())
        with jax.default_device(cpu):
            for sym, prof in cs.get_variable_profiles().items():
                bound[sym] = jnp.asarray(prof.value(tstops_cpu))
            kt = np.asarray(calculator(**bound))
        if kt.shape != (tstops.size, nr):
            raise ValueError(
                f"calculator returned k table of shape {kt.shape} for "
                f"{tstops.size} condition stops; expected ({tstops.size}, "
                f"{nr}) — on-the-fly calculators must broadcast over array-"
                "valued conditions (k[..., None]-style) to be sweepable")
        k_tables.append(kt)
    return tstops, np.stack(k_tables)


def build_condition_sweep_theta(conditions_list: list[ConditionSet],
                                template: ConditionSet):
    """Pack per-member profile parameters for a continuous-mode sweep.

    Every member must bind the same symbols to the same profile class (and
    the same trace-time static attributes) as ``template``; what may vary
    per member is the numeric parameter vector (``theta_fields``).

    Returns ``(thetas, member_stops)``: ``thetas[sym]`` is (B, p) and
    ``member_stops`` is a (B, n_stops) +inf-padded matrix of each member's
    profile-kink stop times (continuous mode needs stops only at genuine
    non-smooth points, not on a rate-update grid).
    """
    syms = list(template.symbols)
    thetas: dict = {}
    stops_list = []
    for cs in conditions_list:
        if list(cs.symbols) != syms:
            raise ValueError("Ensemble members must bind the same condition "
                             "symbols as the template")
    for sym in syms:
        ref_key = template.get_profile(sym).static_key()
        rows = []
        for cs in conditions_list:
            p = cs.get_profile(sym)
            if p.static_key() != ref_key:
                raise ValueError(
                    f"Profile for {sym!r} differs structurally across the "
                    f"ensemble ({p.static_key()} vs {ref_key}); continuous "
                    "batching requires one traced profile family")
            rows.append(np.asarray(p.theta()))
        thetas[sym] = np.stack(rows)
    for cs in conditions_list:
        ts = np.asarray(cs.get_tstops(), dtype=np.float64)
        stops_list.append(ts if ts.size else np.array([np.inf]))
    n_max = max(s.size for s in stops_list)
    member_stops = np.full((len(conditions_list), n_max), np.inf)
    for b, s in enumerate(stops_list):
        member_stops[b, :s.size] = s
    return thetas, member_stops


class EnsembleProblem:
    """Reusable compiled ensemble sweep over one CRN.

    Construction applies filters/setup once and traces a single
    chunk-scanned, vmapped BDF program; ``solve`` runs it for any member
    batch with matching shapes (no recompilation).
    """

    def __init__(self, method: VariableODESolve, sd: SpeciesData, rd: RxData,
                 chunk_mode: str = "auto", rate_mode: str = "discrete",
                 nr_multiple: int = 1, mesh=None):
        """``chunk_mode``: "scan" runs all chunks in one device program
        (lowest overhead; the right choice for CPU and for multi-chip
        dry-runs), "host" dispatches one device call per chunk, "group"
        scans ``pars.chunks_per_dispatch`` chunks (None = the shared
        auto value: all chunks on CPU, 32 on accelerators) per device
        call, "async" runs the whole horizon in one device program with
        per-lane in-loop chunk transitions (bdf chunks= mode) — lanes
        advance through chunks independently, avoiding the per-chunk
        slowest-lane synchronisation the other modes pay (measured
        1.49x of the production sweep's step iterations;
        scripts/attrib_sync_steps.py). "auto" picks group on
        accelerators and scan on CPU.
        Per-chunk ("host") dispatch relies on the runtime pipelining
        each dispatch's fixed overhead with the previous execution —
        true on a fast link (~3% of a wash vs group), but on a
        congested remote attachment the per-dispatch latency leaks
        straight into the critical path (measured 1.8x slower than
        group on the production sweep under a slow tunnel), so the
        auto default amortises dispatches in bounded groups.

        ``rate_mode``: "discrete" precomputes per-member k tables on a
        shared tstop grid (the reference's production formalism); the
        batch payload is (shared tstops, per-member table). "continuous"
        traces k(X(t, theta)) directly into the RHS with per-member profile
        parameter vectors (profiles must define ``theta_fields`` and the
        calculator must be continuous-capable): no rate-update stops are
        forced, which on slow-ramp long-horizon sweeps cuts the step count
        severalfold — the batched counterpart of the reference's
        variable/continuous solve variants (methods.jl:363-653)."""
        self.method = method
        pars = method.pars
        calc = method.calculator
        model_shards = 0
        if mesh is not None and "model" in mesh.axis_names:
            model_shards = int(mesh.shape["model"])
        if chunk_mode == "auto":
            if model_shards:
                chunk_mode = "scan"   # the shard_map program is scan-form
            elif jax.default_backend() == "cpu":
                chunk_mode = "scan"
            else:
                # accelerators: async beats group 123.5 -> 104.2
                # ms/profile on the production sweep (less per-chunk
                # slowest-lane synchronisation; scripts/attrib_production).
                # With pars.progress the horizon runs as a few async
                # chunk-range dispatches (warm method-state carry across
                # them) with a progress line between each — live
                # progress without group mode's per-chunk lane sync.
                chunk_mode = "async"
        if model_shards and chunk_mode != "scan":
            raise ValueError("model-axis sharded solves support "
                             "chunk_mode='scan' only")
        if chunk_mode not in ("scan", "host", "group", "async"):
            raise ValueError(f"unknown chunk_mode {chunk_mode!r}")
        self.chunk_mode = chunk_mode
        if rate_mode not in ("discrete", "continuous"):
            raise ValueError(f"unknown rate_mode {rate_mode!r}")
        if rate_mode == "continuous" and not calc.allows_continuous:
            raise ValueError(
                "Calculator does not support continuous rate evaluation; "
                "use rate_mode='discrete'.")
        self.rate_mode = rate_mode

        self.sd, self.rd = sd.copy(), rd.copy()
        mask = method.filter.get_filter_mask(self.sd, self.rd)
        ids = list(np.flatnonzero(mask))
        self.rd.splice(ids)
        if ids:
            calc.splice(ids)
        calc.setup_network(self.sd, self.rd)

        from ..models.mass_action import resolve_clip_delta
        self.dtype = jnp.float64 if pars.dtype == "float64" else jnp.float32
        self.net = build_mass_action(self.rd, self.sd.n, dtype=self.dtype,
                                     clip_delta=resolve_clip_delta(pars))
        # reaction-axis padding: make nr divisible by a model-axis mesh
        # size (reaction-sharded 2-D meshes; see ensemble_shardings).
        # Padded slots are inert and the per-step k vector is zero-padded
        # by the wrapped prepare hook below. With a constructor mesh the
        # multiple also covers the Pallas kernels' per-shard chunk size,
        # so every model shard holds whole DD_CHUNK reaction blocks.
        nr_multiple = max(int(nr_multiple), 1)
        if model_shards:
            from ..ops.pallas_matmul import DD_CHUNK
            per_shard = DD_CHUNK if self._will_use_pallas(pars) else 1
            req = model_shards * per_shard
            nr_multiple = nr_multiple * req // math.gcd(nr_multiple, req)
        self._nr_pad = (-self.net.nr) % nr_multiple
        if self._nr_pad:
            from ..models.mass_action import pad_reactions
            self.net = pad_reactions(self.net, self.net.nr + self._nr_pad)
        jdt = _jac_dtype(pars)
        from ..solving.methods import _resolve_contraction, _resolve_jac_form
        jac_form = _resolve_jac_form(pars, jdt)
        self._jac_form = jac_form
        contraction = _resolve_contraction(self.net, pars)
        self._contraction = contraction
        jac_net = (MassActionNetwork(self.net.reac_slots,
                                     self.net.N.astype(jdt),
                                     delta=self.net.delta)
                   if jdt != self.dtype else None)
        self._jac_net = jac_net
        if rate_mode == "discrete":
            self.rhs, self.jac, self.prepare = _make_rhs_jac(
                self.net, "discrete", jac_net=jac_net,
                analytic_jac=pars.jac, contraction=contraction,
                jac_form=jac_form)
            payload_axes = (None, 0)   # (shared tstops, per-member k table)
            stops_axes = None          # shared stop grid
        else:
            template = method.conditions
            self._theta_classes = {
                sym: (type(p), tuple(getattr(p, f) for f in p.static_attrs))
                for sym, p in ((s, template.get_profile(s))
                               for s in template.symbols)}
            classes = self._theta_classes

            def k_fn(t, payload):
                bound = {sym: cls.value_theta(t, payload[sym], sv)
                         for sym, (cls, sv) in classes.items()}
                return calc(**bound)

            if hasattr(calc, "rates_pair"):
                def k_fn_pair(t, payload):
                    bound = {sym: cls.value_theta(t, payload[sym], sv)
                             for sym, (cls, sv) in classes.items()}
                    return calc.rates_pair(**bound)
            else:
                k_fn_pair = None

            self._k_fn = k_fn
            self._k_fn_pair = k_fn_pair
            self.rhs, self.jac, self.prepare = _make_rhs_jac(
                self.net, "continuous_theta", k_fn=k_fn, jac_net=jac_net,
                analytic_jac=pars.jac, contraction=contraction,
                k_fn_pair=k_fn_pair, jac_form=jac_form)
            payload_axes = 0           # per-member theta dict
            stops_axes = 0             # per-member profile-kink stops
        if self._nr_pad and rate_mode == "continuous":
            # continuous k comes from the calculator at trace time: pad
            # its output — a single f64 vector, or the double-f32 pair
            # when a pair-mode contraction already split it. (Discrete
            # k-tables are padded in solve() so the SHARDED table axis
            # itself has the padded length.)
            inner_prepare = self.prepare
            npad = self._nr_pad

            def _padded_prepare(t_stage, t_start, a):
                k = inner_prepare(t_stage, t_start, a)
                if isinstance(k, tuple):
                    return tuple(jnp.pad(x, (0, npad)) for x in k)
                return jnp.pad(k, (0, npad))

            self.prepare = _padded_prepare
        self.chunkstep = pars.solve_chunkstep
        self.saveat_local, self.n_chunks = _chunk_save_grid(pars)
        self._saveat_j = jnp.asarray(self.saveat_local)
        self._chunk_ids = jnp.arange(self.n_chunks, dtype=self.dtype)
        self.pars = pars

        self._payload_axes = payload_axes
        self._stops_axes = stops_axes

        (member, member_chunk, member_group, member_async,
         member_async_seg) = \
            self._member_builders(self.rhs, self.jac, self.prepare)

        # tolerances are per-member (B,) vectors: the adaptive retry loop
        # tightens only the failed lanes (see solve()), so tol axes are 0
        self._solve_fn = jax.jit(
            jax.vmap(member, in_axes=(0, payload_axes, stops_axes,
                                      0, 0)))

        self._chunk_fn = jax.jit(
            jax.vmap(member_chunk,
                     in_axes=(0, 0, 0, payload_axes, stops_axes, None,
                              0, 0)))

        # stops rows are per-chunk: slice axis 0 (discrete/shared) or
        # axis 1 (continuous/per-member) when grouping
        self._group_fn = jax.jit(
            jax.vmap(member_group,
                     in_axes=(0, 0, 0, payload_axes,
                              None if stops_axes is None else 0,
                              None, 0, 0)))

        self._solve_fn_async = jax.jit(
            jax.vmap(member_async, in_axes=(0, payload_axes, stops_axes,
                                            0, 0)))

        # segmented async: chunk-range stops rows slice axis 0 (discrete,
        # shared) or stay per-member (continuous); segment offsets shared
        self._async_seg_fn = jax.jit(
            jax.vmap(member_async_seg,
                     in_axes=(0, 0, 0, payload_axes,
                              None if stops_axes is None else 0,
                              None, 0, 0)))

        self._mesh = mesh
        self._batch_multiple = 1
        self._solve_fn_sharded = None
        if mesh is not None and "model" in mesh.axis_names:
            self._batch_multiple = int(mesh.shape.get("batch", 1))
            self._build_sharded(mesh)

    def _member_builders(self, rhs, jac, prepare):
        """Single-member chunkwise solve closures over one (rhs, jac,
        prepare) triple — shared by the plain vmapped programs and the
        shard_map (model-sharded) program, whose rhs/jac close over
        per-shard reaction blocks."""
        pars_ref = self.pars
        chunkstep = self.chunkstep
        saveat_j = self._saveat_j
        chunk_ids = self._chunk_ids
        use_warm = getattr(pars_ref, "chunk_warm_start", True)

        def _segment(u, h_prev, warm, payload, stops_row, nc, abstol, reltol):
            """One chunk's bdf_solve with the (h, BDF-state) carry."""
            res = bdf.bdf_solve(
                rhs, jac, u, 0.0, chunkstep, saveat_j,
                rtol=reltol, atol=abstol, stops=stops_row,
                max_steps=int(pars_ref.maxiters),
                nonnegative=pars_ref.ban_negatives,
                nonnegative_project=pars_ref.project_negatives,
                lu_precision=pars_ref.lu_precision,
                linsolve=getattr(pars_ref, "linsolve", "auto"),
                lu_drift_tol=getattr(pars_ref, "lu_drift_tol", 0.1),
                jac_policy=getattr(pars_ref, "jac_policy", "lazy"),
                first_step=h_prev, prepare=prepare,
                warm_start=warm if use_warm else None,
                args=(nc * chunkstep, payload))
            warm_next = ((res.D, res.order, res.n_equal_steps) if use_warm
                         else warm)
            return res, warm_next

        def _warm0(u0):
            return (jnp.zeros((bdf.MAX_ORDER + 3, u0.shape[0]), u0.dtype),
                    jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))

        def member(u0, payload, stops_rows, abstol, reltol):
            def body(carry, xs):
                u, worst, h_prev, warm = carry
                nc, stops_row = xs
                res, warm = _segment(u, h_prev, warm, payload, stops_row,
                                     nc, abstol, reltol)
                return (res.y_final, jnp.minimum(worst, res.status),
                        res.h, warm), (res.ys, res.n_steps)

            (_, worst, _, _), (ys, steps) = jax.lax.scan(
                body, (u0, jnp.asarray(bdf.DONE, jnp.int32),
                       jnp.asarray(jnp.nan, bdf.time_dtype(u0.dtype)),
                       _warm0(u0)),
                (chunk_ids, stops_rows))
            return worst, ys, jnp.sum(steps)

        def member_chunk(u0, h_prev, warm, payload, stops_row, nc, abstol,
                         reltol):
            res, warm = _segment(u0, h_prev, warm, payload, stops_row, nc,
                                 abstol, reltol)
            return res.y_final, res.h, warm, res.status, res.ys, res.n_steps

        def member_group(u0, h0, warm0, payload, stops_rows, ncs, abstol,
                         reltol):
            def body(carry, xs):
                u, worst, h_prev, warm = carry
                nc, stops_row = xs
                res, warm = _segment(u, h_prev, warm, payload, stops_row,
                                     nc, abstol, reltol)
                return (res.y_final, jnp.minimum(worst, res.status),
                        res.h, warm), (res.ys, res.n_steps)

            (u_f, worst, h_f, warm_f), (ys, steps) = jax.lax.scan(
                body, (u0, jnp.asarray(bdf.DONE, jnp.int32), h0, warm0),
                (ncs, stops_rows))
            return u_f, h_f, warm_f, worst, ys, jnp.sum(steps)

        n_chunks = self.n_chunks
        chunk_offsets = jnp.asarray(chunk_ids * chunkstep)

        def member_async(u0, payload, stops_rows, abstol, reltol):
            """Whole-horizon solve in ONE while_loop (bdf chunks= mode).

            Unlike the scan/group/host members, lanes advance through
            their chunks independently — a vmapped batch pays
            max_lane(total steps) synchronous iterations instead of
            sum_chunks(max_lane steps), a measured 1.49x on the
            production sweep (scripts/attrib_sync_steps.py). maxiters
            bounds the TOTAL step count across the horizon here.
            """
            res = bdf.bdf_solve(
                rhs, jac, u0, 0.0, chunkstep, saveat_j,
                rtol=reltol, atol=abstol, stops=stops_rows,
                max_steps=int(pars_ref.maxiters),
                nonnegative=pars_ref.ban_negatives,
                nonnegative_project=pars_ref.project_negatives,
                lu_precision=pars_ref.lu_precision,
                linsolve=getattr(pars_ref, "linsolve", "auto"),
                lu_drift_tol=getattr(pars_ref, "lu_drift_tol", 0.1),
                jac_policy=getattr(pars_ref, "jac_policy", "lazy"),
                prepare=prepare, args=payload,
                chunks=n_chunks, chunk_offsets=chunk_offsets)
            return res.status, res.ys, res.n_steps

        def member_async_seg(u0, h0, warm0, payload, stops_rows_seg,
                             seg_offsets, abstol, reltol):
            """A contiguous chunk RANGE of the async whole-horizon loop.

            Same independent per-lane chunk advance as ``member_async``
            inside the range, but with the (h, BDF method state) carry at
            entry and exit so the horizon can be split into a few
            dispatches with host progress reporting between them — live
            progress in async mode (the reference drives ProgressLogging
            bars through its solve loop, methods.jl:248-254)."""
            res = bdf.bdf_solve(
                rhs, jac, u0, 0.0, chunkstep, saveat_j,
                rtol=reltol, atol=abstol, stops=stops_rows_seg,
                max_steps=int(pars_ref.maxiters),
                nonnegative=pars_ref.ban_negatives,
                nonnegative_project=pars_ref.project_negatives,
                lu_precision=pars_ref.lu_precision,
                linsolve=getattr(pars_ref, "linsolve", "auto"),
                lu_drift_tol=getattr(pars_ref, "lu_drift_tol", 0.1),
                jac_policy=getattr(pars_ref, "jac_policy", "lazy"),
                first_step=h0, prepare=prepare,
                warm_start=warm0 if use_warm else None,
                args=payload,
                chunks=seg_offsets.shape[0], chunk_offsets=seg_offsets)
            warm_next = ((res.D, res.order, res.n_equal_steps) if use_warm
                         else warm0)
            return (res.y_final, res.h, warm_next, res.status, res.ys,
                    res.n_steps)

        return (member, member_chunk, member_group, member_async,
                member_async_seg)

    @staticmethod
    def _warm0_batched(u0s_j):
        """Cold (order-0) warm-start carry for a (B, ns) state batch."""
        B, ns = u0s_j.shape
        return (jnp.zeros((B, bdf.MAX_ORDER + 3, ns), u0s_j.dtype),
                jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))

    @staticmethod
    def _will_use_pallas(pars) -> bool:
        """Predict whether ``_resolve_contraction`` will pick a Pallas
        kernel — needed BEFORE the network is padded, because the
        model-sharding pad multiple depends on the kernel chunk size.
        (A wrong guess only affects padding size, never correctness:
        inert reactions are exact no-ops on every path.)"""
        choice = getattr(pars, "rhs_contraction", "auto")
        if choice == "float64":
            return False
        if choice in ("fused", "dd"):
            return True
        return (jax.default_backend() != "cpu"
                and getattr(pars, "dtype", "float64") == "float64")

    def _build_sharded(self, mesh):
        """shard_map program for ``("batch", "model")`` meshes.

        Batch lanes shard over ``batch``; the REACTION axis — rate
        tables and the stoichiometry/slot operands — shards over
        ``model``. Each shard evaluates its local reaction block through
        the same contraction implementation (fused/dd Pallas kernels or
        the dense dot) and ``lax.psum`` over ``model`` assembles du/dt
        and the Jacobian; solver state stays replicated across model
        ranks (every rank runs the identical Newton/controller math on
        the psum'd values). The custom kernels have no GSPMD
        partitioning rule, so the split is explicit — shard_map +
        collectives — rather than relying on the partitioner
        (VERDICT r2 #3)."""
        from jax.sharding import PartitionSpec as P

        from ..models.mass_action import _clip_pos
        from ..ops.dd import pair_from_f64
        from ..ops.interp import left_constant_lookup

        pars = self.pars
        net = self.net
        contraction = self._contraction
        n_model = int(mesh.shape["model"])
        nr_g, ns = net.nr, net.ns
        if nr_g % n_model:
            raise ValueError(f"padded reaction count {nr_g} not divisible "
                             f"by {n_model} model shards")
        nr_loc = nr_g // n_model
        jdt = _jac_dtype(pars)
        pair_mode = contraction is not None and getattr(
            contraction, "supports_pair", False)
        fused = pair_mode and getattr(contraction, "supports_fused", False)

        if fused:
            from ..ops.pallas_matmul import make_local_fused_rhs
            local_rhs_one = make_local_fused_rhs(contraction, n_model)
            carrays = (contraction._NT, contraction._E)
            cspecs = (P(None, "model"), P(None, "model", None))
        elif pair_mode:
            from ..ops.pallas_matmul import make_local_dd_pair
            local_pair = make_local_dd_pair(contraction, n_model)
            carrays = (contraction._NT,)
            cspecs = (P(None, "model"),)
        else:
            carrays = ()
            cspecs = ()

        rate_mode = self.rate_mode
        npad = self._nr_pad
        k_fn = getattr(self, "_k_fn", None)
        k_fn_pair = getattr(self, "_k_fn_pair", None)
        analytic = pars.jac

        def make_fns(net_l, jnet_l, *car):
            """(rhs, jac, prepare) closing over one shard's reaction
            block — the local counterpart of solving.methods
            ._make_rhs_jac."""
            if rate_mode == "discrete":
                # the k-table operand is already reaction-sharded: the
                # lookup row IS the local k block
                def prepare_raw(t_stage, t_start, a):
                    tstops, ktab = a[1]
                    return left_constant_lookup(t_start + a[0], tstops, ktab)
            else:
                # continuous k comes from the (replicated) calculator at
                # full length; slice this shard's block by mesh position
                def prepare_raw(t_stage, t_start, a):
                    k = k_fn(t_stage + a[0], a[1])
                    if npad:
                        k = jnp.pad(k, (0, npad))
                    i = jax.lax.axis_index("model")
                    return jax.lax.dynamic_slice(k, (i * nr_loc,), (nr_loc,))

            if pair_mode and rate_mode != "discrete" and k_fn_pair is not None:
                # native pair rates: pad and shard-slice both words
                def prepare(t_stage, t_start, a):
                    kh, kl = k_fn_pair(t_stage + a[0], a[1])
                    if npad:
                        kh = jnp.pad(kh, (0, npad))
                        kl = jnp.pad(kl, (0, npad))
                    i = jax.lax.axis_index("model")
                    return (jax.lax.dynamic_slice(kh, (i * nr_loc,), (nr_loc,)),
                            jax.lax.dynamic_slice(kl, (i * nr_loc,), (nr_loc,)))
            elif pair_mode:
                def prepare(t_stage, t_start, a):
                    return pair_from_f64(prepare_raw(t_stage, t_start, a))
            else:
                prepare = prepare_raw

            if fused:
                NT_l, E_l = car
                delta = net.delta

                def rhs(t, u, k_pair):
                    u_aug = jnp.concatenate([_clip_pos(u, delta),
                                             jnp.ones((1,), u.dtype)])
                    uh, ul = pair_from_f64(u_aug)
                    du = local_rhs_one(uh, ul, k_pair[0], k_pair[1],
                                       NT_l, E_l)
                    return jax.lax.psum(du, "model")
            elif pair_mode:
                (NT_l,) = car

                def rhs(t, u, k_pair):
                    rh, rl = net_l.rates_pair(u, k_pair)
                    return jax.lax.psum(local_pair(rh, rl, NT_l), "model")
            else:
                def rhs(t, u, k):
                    return jax.lax.psum(net_l.rhs(u, k), "model")

            if pair_mode:
                if jdt == jnp.float32:
                    def k_for_jac(kp):
                        return kp[0]
                else:
                    def k_for_jac(kp):
                        return kp[0].astype(jdt) + kp[1].astype(jdt)
            else:
                def k_for_jac(k):
                    return k.astype(jdt)

            if analytic:
                jac_impl = (jnet_l.jac_matmul
                            if getattr(self, "_jac_form", "segsum") == "matmul"
                            else jnet_l.jac)

                def jac(t, u, k):
                    Jl = jac_impl(u.astype(jdt), k_for_jac(k))
                    return jax.lax.psum(Jl, "model")
            else:
                def jac(t, u, k):
                    kk = k_for_jac(k)
                    Jl = jax.jacfwd(
                        lambda uu: jnet_l.rhs(uu, kk))(u.astype(jdt))
                    return jax.lax.psum(Jl, "model")

            return rhs, jac, prepare

        payload_axes, stops_axes = self._payload_axes, self._stops_axes

        def body(u0_l, payload_l, stops_l, at_l, rt_l, net_l, jnet_l, *car):
            rhs, jac, prepare = make_fns(net_l, jnet_l, *car)
            member, _, _, _, _ = self._member_builders(rhs, jac, prepare)
            return jax.vmap(member,
                            in_axes=(0, payload_axes, stops_axes, 0, 0))(
                u0_l, payload_l, stops_l, at_l, rt_l)

        if rate_mode == "discrete":
            payload_spec = (P(), P("batch", None, "model"))
            stops_spec = P()
        else:
            payload_spec = P("batch")   # prefix spec over the theta dict
            stops_spec = P("batch")
        # the spec "network" must carry the SAME aux (delta) as the real
        # one: pytree-prefix matching in shard_map compares treedefs
        net_spec = MassActionNetwork(reac_slots=P("model"), N=P("model"),
                                     delta=net.delta)
        in_specs = (P("batch"), payload_spec, stops_spec, P("batch"),
                    P("batch"), net_spec, net_spec) + cspecs
        out_specs = (P("batch"), P("batch"), P("batch"))
        try:
            sm = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False)
        except TypeError:   # older shard_map signature
            sm = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_rep=False)

        jnet_g = self._jac_net if self._jac_net is not None else net
        self._solve_fn_sharded = jax.jit(
            lambda u0, pl, st, at, rt: sm(u0, pl, st, at, rt, net, jnet_g,
                                          *carrays))

    def _gather_lanes(self, u0s_j, payload, stops_rows, idx):
        """Compact selected ensemble lanes into a small retry batch.

        ``idx`` is a padded numpy index vector (failed lanes, then repeats
        of the first failed lane up to the retry batch size — repeated
        results are discarded on merge). Shared (non-batched) inputs pass
        through untouched.
        """
        take = jnp.asarray(idx)
        u0_r = u0s_j[take]
        if self.rate_mode == "discrete":
            payload_r = (payload[0], payload[1][take])
            stops_r = stops_rows        # shared stop grid
        else:
            payload_r = jax.tree_util.tree_map(lambda x: x[take], payload)
            stops_r = stops_rows[take]
        return u0_r, payload_r, stops_r

    def _retry_batch_size(self, n_failed, B):
        """Next power-of-two >= n_failed, capped at the full batch.

        Power-of-two padding bounds the number of distinct compiled retry
        programs at log2(B); the Pallas kernels self-pad sub-sublane
        batches so any size executes. Mesh-sharded solves additionally
        round up to the batch-axis device count so the retry batch still
        shards evenly.
        """
        Br = 1
        while Br < n_failed:
            Br *= 2
        m = self._batch_multiple
        Br = ((Br + m - 1) // m) * m
        return min(Br, B)

    def _run_batch(self, B, u0s_j, payload, stops_rows, abstol_j, reltol_j,
                   sharded=False):
        """One batched run at per-member tolerances -> (statuses, ys,
        steps).

        ``ys`` has shape (B, n_chunks, m, ns); ``statuses`` is the
        per-member worst chunk status and ``steps`` the per-member total
        integrator step count, both numpy (B,) int arrays. ``sharded``
        routes through the shard_map (model-axis) program.
        """
        steps = jnp.zeros((B,), jnp.int32)
        mode = self.chunk_mode
        if (mode == "async" and not sharded and self.rate_mode == "discrete"
                and not os.environ.get("KINETICA_UNSAFE_ASYNC_DISCRETE")):
            # Worker-fault guard, localised by the r5 bisect
            # (scripts/repro_async_discrete_fault.py): the async
            # whole-horizon program with DISCRETE k tables kernel-faults
            # the remote TPU worker when the per-member table
            # (B, n_stops, nr) is LARGE — the trigger is table BYTES,
            # not batch width: at nr=1095/fine stops, 218 MB (B=436)
            # faults reproducibly ("TPU worker process crashed or
            # restarted ... kernel fault"), 128 MB (B=256) is
            # state-dependent, 64 MB (B=128) is clean; the SAME B=436
            # passes with a 19 MB coarse-stops table or a 29 MB
            # small-CRN table, and CONTINUOUS async (no table) is clean
            # to B=1024. Guard above 64 MB (the largest measured-clean
            # size; override via KINETICA_ASYNC_TABLE_MB, bypass with
            # KINETICA_UNSAFE_ASYNC_DISCRETE=1 — reproduction only, CAN
            # crash the worker). Applies to BOTH the segmented-async
            # (progress) and whole-horizon async branches: the
            # segmented branch dispatches the same async chunk program.
            # Oversized tables take the group (progress) or scan
            # program; the guard's measured price at B=256/128 MB is
            # ~29% (warm scan 49.1 s vs async 38.2 s).
            table = payload[1] if isinstance(payload, tuple) else None
            table_mb = (float(table.size * table.dtype.itemsize) / 1e6
                        if hasattr(table, "size") else 0.0)
            limit_mb = float(os.environ.get("KINETICA_ASYNC_TABLE_MB", "64"))
            if table_mb > limit_mb:
                mode = "group" if self.pars.progress else "scan"
                logger.info(
                    "   - discrete k-table %.0f MB > %.0f MB async-safe "
                    "limit: using the %s chunk program (worker-fault "
                    "guard; see scripts/repro_async_discrete_fault.py)",
                    table_mb, limit_mb, mode)
        if mode == "host":
            u = u0s_j
            h = jnp.full((B,), jnp.nan, bdf.time_dtype(self.dtype))
            warm = self._warm0_batched(u0s_j)
            worst = None
            ys_chunks = []
            for nc in range(self.n_chunks):
                row = (stops_rows[nc] if self.rate_mode == "discrete"
                       else stops_rows[:, nc])
                u, h, warm, status, ys_c, st_c = self._chunk_fn(
                    u, h, warm, payload, row,
                    jnp.asarray(float(nc), self.dtype), abstol_j, reltol_j)
                ys_chunks.append(ys_c)
                steps = steps + st_c
                worst = status if worst is None else jnp.minimum(worst, status)
                if self.pars.progress:
                    logger.info("   - chunk %d/%d dispatched",
                                nc + 1, self.n_chunks)
            statuses = np.asarray(worst)
            ys = jnp.stack(ys_chunks, axis=1)  # (B, n_chunks, m, ns)
        elif mode == "group":
            cpd = resolve_chunks_per_dispatch(self.pars.chunks_per_dispatch,
                                              self.n_chunks)
            u = u0s_j
            h = jnp.full((B,), jnp.nan, bdf.time_dtype(self.dtype))
            warm = self._warm0_batched(u0s_j)
            worst = None
            ys_groups = []
            for lo in range(0, self.n_chunks, cpd):
                hi = min(lo + cpd, self.n_chunks)
                ncs = jnp.arange(lo, hi, dtype=self.dtype)
                rows = (stops_rows[lo:hi] if self.rate_mode == "discrete"
                        else stops_rows[:, lo:hi])
                u, h, warm, status, ys_g, st_g = self._group_fn(
                    u, h, warm, payload, rows, ncs, abstol_j, reltol_j)
                ys_groups.append(ys_g)   # (B, hi-lo, m, ns)
                steps = steps + st_g
                worst = status if worst is None else jnp.minimum(worst, status)
                if self.pars.progress:
                    logger.info("   - chunks %d-%d/%d dispatched",
                                lo + 1, hi, self.n_chunks)
            statuses = np.asarray(worst)
            ys = jnp.concatenate(ys_groups, axis=1)
        elif (mode == "async" and self.pars.progress
              and not sharded):
            # segmented async: a few whole-range async dispatches with a
            # progress line between them; lanes advance independently
            # WITHIN each range, so the per-chunk slowest-lane sync of
            # group mode is paid only n_segments-1 times
            cpd = resolve_chunks_per_dispatch(self.pars.chunks_per_dispatch,
                                              self.n_chunks)
            u = u0s_j
            h = jnp.full((B,), jnp.nan, bdf.time_dtype(self.dtype))
            warm = self._warm0_batched(u0s_j)
            worst = None
            ys_segs = []
            for lo in range(0, self.n_chunks, cpd):
                hi = min(lo + cpd, self.n_chunks)
                rows = (stops_rows[lo:hi] if self.rate_mode == "discrete"
                        else stops_rows[:, lo:hi])
                seg_offsets = self._chunk_ids[lo:hi] * self.chunkstep
                u, h, warm, status, ys_s, st_s = self._async_seg_fn(
                    u, h, warm, payload, rows, seg_offsets,
                    abstol_j, reltol_j)
                ys_segs.append(ys_s)   # (B, hi-lo, m, ns)
                steps = steps + st_s
                worst = status if worst is None else jnp.minimum(worst,
                                                                 status)
                logger.info("   - chunks %d-%d/%d solved (async range)",
                            lo + 1, hi, self.n_chunks)
            statuses = np.asarray(worst)
            ys = jnp.concatenate(ys_segs, axis=1)
        else:
            fn = (self._solve_fn_sharded if sharded
                  else self._solve_fn_async if mode == "async"
                  else self._solve_fn)
            statuses, ys, steps = fn(
                u0s_j, payload, stops_rows, abstol_j, reltol_j)
            statuses = np.asarray(statuses)
        return statuses, ys, np.asarray(steps)

    def solve(self, conditions_list: list[ConditionSet] | None = None,
              u0s: np.ndarray | None = None, sharding=None,
              k_tables: np.ndarray | None = None,
              tstops: np.ndarray | None = None) -> EnsembleSolution:
        pars = self.pars
        calc = self.method.calculator

        if self.rate_mode == "continuous":
            if k_tables is not None or tstops is not None:
                raise ValueError("k_tables/tstops are discrete-mode inputs")
            if conditions_list is None:
                conditions_list = [self.method.conditions]
            thetas, member_stops = build_condition_sweep_theta(
                conditions_list, self.method.conditions)
            B = member_stops.shape[0]
            payload = {sym: jnp.asarray(v, dtype=self.dtype)
                       for sym, v in thetas.items()}
            # per-member chunk-localised profile-kink stops
            rows = [_chunk_local_stops(member_stops[b], self.n_chunks,
                                       self.chunkstep) for b in range(B)]
            m_max = max(r.shape[1] for r in rows)
            stops_rows = np.full((B, self.n_chunks, m_max), np.inf)
            for b, r in enumerate(rows):
                stops_rows[b, :, :r.shape[1]] = r
            stops_rows = jnp.asarray(stops_rows)
        else:
            if k_tables is None:
                if conditions_list is None:
                    self.method.conditions.solve_variable_conditions(pars)
                    tstops, k_table = calculate_discrete_rates(
                        self.method.conditions, calc, self.rd.nr)
                    k_tables = k_table[None]
                else:
                    tstops, k_tables = build_condition_sweep(
                        conditions_list, calc, self.rd.nr, pars)
            B = k_tables.shape[0]

        if u0s is None:
            u0s = np.broadcast_to(make_u0(self.sd, pars), (B, self.sd.n))
        elif u0s.shape[0] != B:
            if B != 1:
                raise ValueError("u0s and condition batch sizes do not match")
            B = u0s.shape[0]
            if self.rate_mode == "discrete":
                k_tables = np.broadcast_to(
                    k_tables, (B,) + k_tables.shape[1:])
            else:
                payload = jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]), payload)
                stops_rows = jnp.broadcast_to(
                    stops_rows, (B,) + stops_rows.shape[1:])

        if self.rate_mode == "discrete":
            stops_rows = jnp.asarray(
                _chunk_local_stops(tstops, self.n_chunks, self.chunkstep))
            if self._nr_pad:
                k_tables = np.pad(np.asarray(k_tables),
                                  ((0, 0), (0, 0), (0, self._nr_pad)))
            payload = (jnp.asarray(tstops, dtype=self.dtype),
                       jnp.asarray(k_tables, dtype=self.dtype))
        u0s_j = jnp.asarray(u0s, dtype=self.dtype)
        use_sharded = False
        if sharding is not None:
            # ``sharding`` may be a NamedSharding (applied to every input —
            # the 1-D batch-DP form) or a Mesh: with a ("batch", "model")
            # mesh the discrete k-table also shards its reaction axis over
            # ``model`` (see parallel.sharding.ensemble_shardings).
            from jax.sharding import Mesh as _Mesh
            if isinstance(sharding, _Mesh):
                if "model" in sharding.axis_names:
                    if self._solve_fn_sharded is not None:
                        if sharding != self._mesh:
                            raise ValueError(
                                "solve() mesh differs from the mesh this "
                                "EnsembleProblem was constructed with")
                        if B % self._batch_multiple:
                            raise ValueError(
                                f"batch {B} not divisible by the mesh "
                                f"batch axis ({self._batch_multiple})")
                        use_sharded = True
                    elif self._contraction is not None:
                        # Pallas contractions have no GSPMD partitioning
                        # rule — input-placement propagation would gather/
                        # replicate (or fail) on hardware. Require the
                        # explicit shard_map program.
                        raise ValueError(
                            "model-axis sharding with a Pallas contraction "
                            "requires EnsembleProblem(..., mesh=mesh) so "
                            "the shard_map program is built; or set "
                            "rhs_contraction='float64' for the "
                            "partitioner-friendly dense dot")
                from .sharding import ensemble_shardings
                u0_sh, k_sh = ensemble_shardings(sharding)
            else:
                u0_sh = k_sh = sharding
            u0s_j = jax.device_put(u0s_j, u0_sh)
            if self.rate_mode == "discrete":
                payload = (payload[0], jax.device_put(payload[1], k_sh))
            else:
                payload = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, u0_sh), payload)

        logger.info(" - Solving %d-member ensemble (%d chunks each, %s/%s mode)...",
                    B, self.n_chunks, self.chunk_mode, self.rate_mode)

        # --- per-member adaptive-tolerance recovery ---
        # The batched mirror of the reference's adaptive_solve!
        # (solve_utils.jl:376-424): after a batch run, lanes that failed
        # are re-solved with x10-tightened tolerances, at most 5 attempts.
        # Retries are COMPACTED (VERDICT r2 #6): failed lanes are gathered
        # into a minimal power-of-two padded batch, so one sick lane in a
        # B=256 sweep re-dispatches ~1 lane of device time, not 256.
        # Results merge lane-wise; successful lanes keep their first
        # (requested-tolerance) answer. Compacted shapes retrace the jitted
        # program once per power-of-two size (persistent-cache friendly).
        abstol_v = np.full(B, float(pars.abstol))
        reltol_v = np.full(B, float(pars.reltol))
        mintol = np.finfo(np.float64).eps
        attempts = 0
        statuses = ys = None
        self.last_retry_batch = None  # telemetry: lanes dispatched on retry
        while True:
            attempts += 1
            if statuses is None:
                new_statuses, new_ys, new_steps = self._run_batch(
                    B, u0s_j, payload, stops_rows,
                    jnp.asarray(abstol_v), jnp.asarray(reltol_v),
                    sharded=use_sharded)
                # writable copies: retry merges scatter into these in place
                statuses = np.array(new_statuses)
                ys = np.array(new_ys)
                steps_v = np.array(new_steps)
            else:
                lanes = np.flatnonzero(statuses != bdf.DONE)
                Br = self._retry_batch_size(lanes.size, B)
                idx = np.concatenate(
                    [lanes, np.full(Br - lanes.size, lanes[0], lanes.dtype)])
                u0_r, payload_r, stops_r = self._gather_lanes(
                    u0s_j, payload, stops_rows, idx)
                self.last_retry_batch = int(Br)
                new_statuses, new_ys, new_steps = self._run_batch(
                    Br, u0_r, payload_r, stops_r,
                    jnp.asarray(abstol_v[idx]), jnp.asarray(reltol_v[idx]),
                    sharded=use_sharded)
                statuses[lanes] = new_statuses[:lanes.size]
                steps_v[lanes] = new_steps[:lanes.size]
                ys[lanes] = np.asarray(new_ys)[:lanes.size]
            failed = statuses != bdf.DONE
            if not failed.any() or not pars.adaptive_tols:
                break
            if attempts >= 5:
                logger.error(" - Too many attempts have been made to reduce "
                             "solver tolerance for %d ensemble member(s).",
                             int(failed.sum()))
                break
            if ((abstol_v[failed] / 10 <= mintol).any()
                    or (reltol_v[failed] / 10 <= mintol).any()):
                logger.error(" - Failed ensemble member(s) cannot be converged "
                             "by reducing solver tolerance any further.")
                break
            abstol_v[failed] /= 10
            reltol_v[failed] /= 10
            logger.warning("   - %d ensemble member(s) failed; retrying "
                           "%d compacted lane(s) with tolerances tightened "
                           "to abstol = %g reltol = %g",
                           int(failed.sum()),
                           self._retry_batch_size(int(failed.sum()), B),
                           abstol_v[failed].min(), reltol_v[failed].min())
        m = len(self.saveat_local)
        ys = np.asarray(ys).reshape(B, self.n_chunks * m, -1)
        ys = np.concatenate([np.asarray(u0s)[:, None, :], ys], axis=1)
        ts = np.concatenate([
            [0.0],
            (np.arange(self.n_chunks)[:, None] * self.chunkstep
             + self.saveat_local[None, :]).ravel()])

        vcs = {}
        if conditions_list is not None:
            # Evaluate the per-member condition traces on the HOST backend:
            # profile.value is jnp-traceable, so calling it per member with
            # the accelerator as default device issues B separate remote
            # dispatches (~25-45 ms each through the tunnel — ~2.9 s of the
            # production B=64 sweep, measured by device trace: 4.3 s device
            # vs 7.4 s wall). On the local CPU backend the same loop is
            # sub-millisecond per member.
            ts_cpu = jax.device_put(ts, jax.devices("cpu")[0])
            with jax.default_device(jax.devices("cpu")[0]):
                for sym in conditions_list[0].symbols:
                    if conditions_list[0].get_profile(sym).is_variable:
                        vcs[sym] = np.stack([
                            np.asarray(cs.get_profile(sym).value(ts_cpu))
                            for cs in conditions_list])

        return EnsembleSolution(
            t=ts, u=ys,
            retcodes=[retcode_from_status(s) for s in statuses],
            vcs=vcs, stats={"n_chunks": self.n_chunks, "batch": B,
                            "attempts": attempts,
                            "retry_batch": self.last_retry_batch,
                            "abstol": abstol_v, "reltol": reltol_v,
                            "n_steps": steps_v})


def solve_network_ensemble(method: VariableODESolve, sd: SpeciesData,
                           rd: RxData,
                           conditions_list: list[ConditionSet] | None = None,
                           u0s: np.ndarray | None = None,
                           sharding=None,
                           rate_mode: str = "discrete") -> EnsembleSolution:
    """One-shot chunkwise ensemble solve (compiles each call; use
    :class:`EnsembleProblem` to amortise compilation across sweeps)."""
    return EnsembleProblem(method, sd, rd, rate_mode=rate_mode).solve(
        conditions_list=conditions_list, u0s=u0s, sharding=sharding)
