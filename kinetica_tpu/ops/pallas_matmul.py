"""Pallas TPU kernel: f64-accurate mass-action RHS contraction du = r @ N.

Motivation (measured on TPU, nc=24 CRN: 1095 reactions, 73 species,
64-member vmapped batch): XLA emulates the f64 ``dot_general`` in the RHS
with an 8x4-way f32 splitting; in *isolation* that costs ~145 us/eval,
but inside the BDF Newton ``while_loop`` the same contraction degrades to
~7 ms/eval (~70% of the whole integrator's step cost — step-cost ablation
in scripts/ablate.py). The double emulation + loop context defeats XLA's
fusion and materialises the (8, B, nr, ns) splitting intermediate every
Newton iteration.

The TPU-native fix exploits CRN structure: the stoichiometry matrix N
holds SMALL INTEGERS (|N_ij| <= ~4, exactly representable in 3 bits), so
an f64-accurate product r_j * N_js needs no 53x53-bit multiply. Split
each f64 rate into three f32 slices

    r = r0 + r1 + r2,   r0/r1: 21-bit mantissas (chopped), r2: f32 rest

so every slice product with N is EXACT in f32 (21+3 <= 24 bits), and
accumulate over reactions on the VPU with TwoSum compensation for the two
leading slices (plain f32 accumulation suffices for r2: |r2| <= 2^-42 |r|).
Everything lives in VMEM; a host-side ``lax.scan`` chains one compiled
DD_CHUNK-reaction kernel over the reaction axis (compile time stays
constant in nr), carrying the f32 accumulator quadruple between launches.

Accuracy: |error| ~ n * u32^2 * max_j |r_j N_js| ~ 1e-13 relative to the
largest accumulated term — the same order as emulated-f64's ~3e-15 for
this contraction, and far below the integrator's Newton/error-test
tolerances (validated against the f64 path in tests/test_pallas_matmul.py
and end-to-end vs scipy BDF in bench.py).

Layout: the kernel computes the TRANSPOSED contraction

    duT[s, b] = sum_j NT[s, j] * rT[j, b]

with species on sublanes and batch members on lanes, so each (statically
unrolled) reaction step is a pure broadcast outer product
``NT[:, j:j+1] * rT[j:j+1, :]`` — no transposes, gathers, or dynamic
slices inside the kernel (Mosaic constraints as in pallas_linalg.py:
grid-less because the grid machinery captures i64 under x64; the
per-chunk reaction loop is unrolled over the static DD_CHUNK).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
# max |stoichiometry| that keeps 21-bit slice products exact in f32
MAX_EXACT_STOICH = 7


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def split3(r: jnp.ndarray):
    """f64 -> three f32 slices (r0, r1, r2); r0/r1 have 21-bit mantissas.

    Chopping (not rounding) the low 3 mantissa bits keeps each slice's
    product with a small-integer N exact in f32; the remainders are exact
    because each is representable in the next slice's width.

    Domain: exact for 1e-21 <~ |r| <~ 1e30 (f32 exponent range shifted
    by the slice offsets; XLA flushes f32 subnormals, so slices vanish
    below f32 min normal). Outside that the absolute error stays below
    ~1.2e-38 — negligible for mass-action rates, which are bounded by
    k_max * conc^2. Above ~1e30 the result would round at slice
    granularity; DDContraction callers keep rates far below this.
    """
    chop = jnp.int32(-8)  # ~0x7: clear low 3 mantissa bits

    def chop21(x32):
        return lax.bitcast_convert_type(
            lax.bitcast_convert_type(x32, jnp.int32) & chop, jnp.float32)

    r0 = chop21(r.astype(jnp.float32))
    rem1 = r - r0.astype(r.dtype)
    r1 = chop21(rem1.astype(jnp.float32))
    r2 = (rem1 - r1.astype(r.dtype)).astype(jnp.float32)
    return r0, r1, r2


# reactions per kernel launch: the kernel body is a static unroll, so the
# Mosaic program size (and compile time) scales with CHUNK, not nr —
# a host-side lax.scan chains launches, carrying the accumulators.
# Env-tunable (KINETICA_DD_CHUNK) for launch-count/compile-time ablation:
# larger chunks mean fewer chained launches per RHS eval (~13 us fixed
# cost each on a remote-attached chip) at the cost of a bigger unrolled
# Mosaic program. Read once at import; all padded geometries derive
# from it, so it must not change mid-process.
import os as _os

DD_CHUNK = int(_os.environ.get("KINETICA_DD_CHUNK", "128"))


def _dd_chunk_kernel(chunk: int, nt_ref, r0_ref, r1_ref, r2_ref,
                     hi_in, lo_in, er_in, sl_in,
                     hi_out, lo_out, er_out, sl_out):
    """One CHUNK of the compensated contraction duT += NT_c @ rT_c.

    nt_ref: (ns_pad, chunk); r*_ref: (chunk, B); accumulators (ns_pad, B).
    The reaction loop is a python unroll (static chunk) of broadcast outer
    products; TwoSum (Knuth) tracks the exact rounding error of the two
    leading slices' running sums. Zero-padded reactions are exact no-ops.
    """
    hi = hi_in[:]
    lo = lo_in[:]
    err_acc = er_in[:]
    sl = sl_in[:]

    for j in range(chunk):
        ncol = nt_ref[:, j:j + 1]            # (ns_pad, 1) static lane slice
        p = ncol * r0_ref[j:j + 1, :]        # exact products, slice 0
        q = ncol * r1_ref[j:j + 1, :]        # exact products, slice 1
        # TwoSum(hi, p): s = hi + p with exact error e
        s = hi + p
        bp = s - hi
        e = (hi - (s - bp)) + (p - bp)
        hi = s
        # TwoSum(lo, q)
        t = lo + q
        bq = t - lo
        f = (lo - (t - bq)) + (q - bq)
        lo = t
        err_acc = err_acc + (e + f)
        sl = sl + ncol * r2_ref[j:j + 1, :]

    hi_out[:] = hi
    lo_out[:] = lo
    er_out[:] = err_acc
    sl_out[:] = sl


def _dd_call(NT32: jnp.ndarray, rT: jnp.ndarray, nr: int,
             interpret: bool = False):
    """(ns_pad, nr_pad) x (nr_pad, B) -> f64 (B, ns_pad).

    nr_pad must be a multiple of DD_CHUNK; the scan compiles ONE chunk
    kernel and reuses it across all reaction chunks.
    """
    del nr
    return _dd_call_slices(NT32, *split3(rT), interpret=interpret)


def _dd_call_slices(NT32: jnp.ndarray, r0, r1, r2, interpret: bool = False):
    """Kernel driver taking the three f32 slices directly — shared by the
    f64 entry (split3) and the pair entry (dd.pair_chop_slices)."""
    ns_pad, nr_pad = NT32.shape
    B = r0.shape[1]
    assert nr_pad % DD_CHUNK == 0
    nchunk = nr_pad // DD_CHUNK

    acc_shape = jax.ShapeDtypeStruct((ns_pad, B), jnp.float32)
    kernel = pl.pallas_call(
        functools.partial(_dd_chunk_kernel, DD_CHUNK),
        out_shape=(acc_shape,) * 4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4,
        interpret=interpret,
    )

    nt_c = NT32.reshape(ns_pad, nchunk, DD_CHUNK).transpose(1, 0, 2)
    r0_c = r0.reshape(nchunk, DD_CHUNK, B)
    r1_c = r1.reshape(nchunk, DD_CHUNK, B)
    r2_c = r2.reshape(nchunk, DD_CHUNK, B)

    zero = jnp.zeros((ns_pad, B), jnp.float32)

    def body(carry, xs):
        ntc, a, b, c = xs
        return kernel(ntc, a, b, c, *carry), None

    (hi, lo, er, sl), _ = lax.scan(body, (zero, zero, zero, zero),
                                   (nt_c, r0_c, r1_c, r2_c))
    du = (hi.astype(jnp.float64) + lo.astype(jnp.float64)
          + er.astype(jnp.float64) + sl.astype(jnp.float64))
    return du.T


@functools.lru_cache(maxsize=64)
def _make_dd_matmul(nr: int, ns: int, nr_pad: int, max_batch: int,
                    interpret: bool = False):
    """Build the (r, NT) -> du primitive pair for one problem geometry.

    Cached per (nr, ns, nr_pad, max_batch) so identical network shapes
    share one custom_vmap/custom_jvp identity (and its compiled kernels).
    """

    @jax.custom_jvp
    def matmul_b(rb, NT):                  # (B, nr) f64 -> (B, ns) f64
        # zero-pad via lax.pad (NOT .at[:nr].set): a full-slice scatter
        # creates a (1, 0) index CONSTANT that batched-cond broadcasting
        # turns into a batched const of the custom_vmap call, tripping
        # its consts-unbatched assertion (hit by the model-sharded path
        # where nr == nr_pad)
        rT = jnp.pad(rb.T, ((0, nr_pad - nr), (0, 0)))
        return _dd_call(NT, rT, nr, interpret=interpret)[:, :ns]

    @matmul_b.defjvp
    def _jvp(primals, tangents):
        (rb, NT), (drb, _) = primals, tangents
        # linear map: tangent is the same contraction; plain f64 dot is
        # fine off the hot path (and exact to f64 for tangents)
        return (matmul_b(rb, NT),
                drb @ NT.T[:nr, :ns].astype(drb.dtype))

    @jax.custom_batching.custom_vmap
    def matmul(r, NT):                     # (nr,) f64 -> (ns,) f64
        return matmul_b(r[None], NT)[0]

    @matmul.def_vmap
    def _vmap_rule(axis_size, in_batched, rb, NT):
        del axis_size
        assert in_batched[0], in_batched
        if in_batched[1]:
            # batched lax.cond broadcasts every branch operand, including
            # the (lane-invariant) stoichiometry — undo the broadcast
            NT = NT[0]
        lead = rb.shape[:-1]
        flat = rb.reshape((-1, rb.shape[-1]))
        if flat.shape[0] > max_batch:
            nchunk = -(-flat.shape[0] // max_batch)
            Bp = nchunk * max_batch
            pad = jnp.zeros((Bp, flat.shape[1]), flat.dtype)
            pad = pad.at[:flat.shape[0]].set(flat)
            out = lax.map(lambda a: matmul_b(a, NT),
                          pad.reshape(nchunk, max_batch, -1))
            out = out.reshape(Bp, -1)[:flat.shape[0]]
        else:
            out = matmul_b(flat, NT)
        return out.reshape(lead + (ns,)), in_batched[0]

    def pair_b(rh, rl, NT):                # (B, nr) f32 pair -> (B, ns) f64
        from . import dd as _dd
        s0, s1, s2 = _dd.pair_chop_slices(rh.T, rl.T)
        pad = ((0, nr_pad - nr), (0, 0))   # lax.pad, not .at[].set — see
        return _dd_call_slices(NT, jnp.pad(s0, pad),  # matmul_b comment
                               jnp.pad(s1, pad),
                               jnp.pad(s2, pad), interpret=interpret)[:, :ns]

    @jax.custom_batching.custom_vmap
    def matmul_pair(rh, rl, NT):           # (nr,) f32 pair -> (ns,) f64
        return pair_b(rh[None], rl[None], NT)[0]

    @matmul_pair.def_vmap
    def _pair_vmap_rule(axis_size, in_batched, rh, rl, NT):
        del axis_size
        assert in_batched[0] and in_batched[1], in_batched
        if in_batched[2]:
            NT = NT[0]                     # batched-cond broadcast: undo
        lead = rh.shape[:-1]
        fh = rh.reshape((-1, rh.shape[-1]))
        fl = rl.reshape((-1, rl.shape[-1]))
        if fh.shape[0] > max_batch:
            nchunk = -(-fh.shape[0] // max_batch)
            Bp = nchunk * max_batch
            padh = jnp.zeros((Bp, fh.shape[1]), fh.dtype).at[:fh.shape[0]].set(fh)
            padl = jnp.zeros((Bp, fl.shape[1]), fl.dtype).at[:fl.shape[0]].set(fl)
            out = lax.map(lambda ab: pair_b(ab[0], ab[1], NT),
                          (padh.reshape(nchunk, max_batch, -1),
                           padl.reshape(nchunk, max_batch, -1)))
            out = out.reshape(Bp, -1)[:fh.shape[0]]
        else:
            out = pair_b(fh, fl, NT)
        return out.reshape(lead + (ns,)), True

    return matmul, matmul_pair


class DDContraction:
    """Precompiled f64-accurate ``r @ N`` for one stoichiometry matrix.

    Built once per network (host side); ``__call__(r)`` accepts (nr,) or
    (B, nr) f64 rates and returns f64 (.., ns). Under vmap the batch is
    vectorized inside one kernel launch (lanes); under forward-mode AD the
    tangent uses the linearity of the contraction.

    Lane-invariance contract: the stoichiometry operand is a trace-time
    constant of ONE network — when batching machinery (e.g. a batched
    ``lax.cond`` broadcasting branch operands) hands the vmap rule a
    batched NT, the rule takes ``NT[0]`` on the assumption that every
    lane carries the same matrix. A genuinely per-lane stoichiometry is
    NOT supported (every lane would silently use lane 0's network);
    batch over networks with separate DDContraction instances instead.
    """

    def __init__(self, N: jnp.ndarray, max_batch: int = 512,
                 interpret: bool = False):
        import numpy as np
        Nh = np.asarray(N, dtype=np.float64)
        if Nh.size and np.abs(Nh).max() > MAX_EXACT_STOICH:
            raise ValueError(
                f"stoichiometry magnitudes above {MAX_EXACT_STOICH} break "
                "the exact-product slice width; use the f64 path")
        if Nh.size and np.any(Nh != np.round(Nh)):
            raise ValueError("DDContraction requires integer stoichiometry")
        nr, ns = Nh.shape
        self.nr, self.ns = nr, ns
        self.nr_pad = _pad_up(max(nr, DD_CHUNK), DD_CHUNK)
        self.ns_pad = _pad_up(max(ns, SUBLANE), SUBLANE)
        self.max_batch = max_batch
        self.interpret = interpret
        NT = np.zeros((self.ns_pad, self.nr_pad), dtype=np.float32)
        NT[:ns, :nr] = Nh.T
        self._NT = jnp.asarray(NT)

        # NT rides through every closure as an explicit ARGUMENT, never a
        # captured const: cond/while batching closure-converts captured
        # arrays into (possibly batched) consts of the custom_vmap call,
        # which the custom_vmap machinery rejects (assert consts_batched).
        self._matmul, self._matmul_pair = _make_dd_matmul(
            nr, ns, self.nr_pad, max_batch, interpret)

    supports_pair = True

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        if r.ndim == 1:
            return self._matmul(r, self._NT)
        return jax.vmap(self._matmul, in_axes=(0, None))(
            r.reshape((-1, r.shape[-1])), self._NT).reshape(
                r.shape[:-1] + (self.ns,))

    def contract_pair(self, r_hi: jnp.ndarray, r_lo: jnp.ndarray):
        """du (f64) from (nr,) double-f32 pair rates — no f64 inputs at
        all; pairs come from MassActionNetwork.rates_pair."""
        return self._matmul_pair(r_hi, r_lo, self._NT)


def _fused_rates_slices(chunk, arity, e_refs, kh_ref, kl_ref, uh_ref, ul_ref):
    """In-kernel mass-action rates for one reaction chunk, as slices.

    e_refs[s]: (chunk, ns_aug_pad) one-hot slot matrices; uh/ul:
    (ns_aug_pad, B) clipped-augmented concentration pairs; kh/kl:
    (chunk, B) rate-constant pairs. The slot gathers run as one-hot
    matmuls on the MXU — exact at HIGHEST precision, because every
    product is 1.0 * u or 0.0 * u and the f32 operand splitting
    reassembles u exactly — and the arity product + k scaling use the
    same error-free pair transforms as models.mass_action.rates_pair.
    Returns the three chopped f32 slices ((chunk, B) each) feeding the
    compensated contraction.
    """
    from . import dd

    rh, rl = kh_ref[:], kl_ref[:]
    for s in range(arity):
        suh = jax.lax.dot_general(
            e_refs[s][:], uh_ref[:], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        sul = jax.lax.dot_general(
            e_refs[s][:], ul_ref[:], (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        rh, rl = dd.pair_mul(rh, rl, suh, sul, guard=False)
    return dd.pair_chop_slices(rh, rl)


def _accumulate_chunk(chunk, nt_ref, s0, s1, s2, hi, lo, err_acc, sl):
    """The unrolled TwoSum accumulation loop shared by all chunk kernels."""
    for j in range(chunk):
        ncol = nt_ref[:, j:j + 1]            # (ns_pad, 1) static lane slice
        p = ncol * s0[j:j + 1, :]
        q = ncol * s1[j:j + 1, :]
        s = hi + p
        bp = s - hi
        e = (hi - (s - bp)) + (p - bp)
        hi = s
        t = lo + q
        bq = t - lo
        f = (lo - (t - bq)) + (q - bq)
        lo = t
        err_acc = err_acc + (e + f)
        sl = sl + ncol * s2[j:j + 1, :]
    return hi, lo, err_acc, sl


def _fused_grid_kernel(chunk, arity, *refs):
    """Grid-mode fused kernel: one launch, nchunk sequential grid steps.

    TPU grid iterations run sequentially on the core, so the accumulator
    OUTPUT blocks (constant index_map) stay resident in VMEM across steps
    — the scan-of-launches carry becomes free, collapsing nchunk kernel
    launches (~13 us fixed cost each on a remote-attached chip) into one.
    """
    nt_ref = refs[0]
    e_refs = refs[1:1 + arity]
    kh_ref, kl_ref, uh_ref, ul_ref = refs[1 + arity:5 + arity]
    hi_ref, lo_ref, er_ref, sl_ref = refs[5 + arity:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        zero = jnp.zeros(hi_ref.shape, hi_ref.dtype)
        hi_ref[:] = zero
        lo_ref[:] = zero
        er_ref[:] = zero
        sl_ref[:] = zero

    s0, s1, s2 = _fused_rates_slices(chunk, arity, e_refs,
                                     kh_ref, kl_ref, uh_ref, ul_ref)
    hi, lo, er, sl = _accumulate_chunk(
        chunk, nt_ref, s0, s1, s2,
        hi_ref[:], lo_ref[:], er_ref[:], sl_ref[:])
    hi_ref[:] = hi
    lo_ref[:] = lo
    er_ref[:] = er
    sl_ref[:] = sl


def _fused_scan_kernel(chunk, arity, *refs):
    """Scan-mode fused kernel: accumulators carried between launches
    (fallback when the grid machinery is unavailable)."""
    nt_ref = refs[0]
    e_refs = refs[1:1 + arity]
    kh_ref, kl_ref, uh_ref, ul_ref = refs[1 + arity:5 + arity]
    hi_in, lo_in, er_in, sl_in = refs[5 + arity:9 + arity]
    hi_ref, lo_ref, er_ref, sl_ref = refs[9 + arity:]

    s0, s1, s2 = _fused_rates_slices(chunk, arity, e_refs,
                                     kh_ref, kl_ref, uh_ref, ul_ref)
    hi, lo, er, sl = _accumulate_chunk(
        chunk, nt_ref, s0, s1, s2,
        hi_in[:], lo_in[:], er_in[:], sl_in[:])
    hi_ref[:] = hi
    lo_ref[:] = lo
    er_ref[:] = er
    sl_ref[:] = sl


class FusedMassActionRHS:
    """One-launch Pallas evaluation of the full mass-action RHS on TPU.

    Fuses the entire hot path of ``du = (k * prod_s u[slot_s]) @ N`` —
    slot gathers, arity products, rate-constant scaling (all in
    error-free double-f32 pair arithmetic), slice chopping, and the
    sliced-compensated reaction contraction — into a single Pallas grid
    launch. Compared with the XLA pipeline feeding :class:`DDContraction`
    (measured nc=24, B=64: ~10 elementwise fusion kernels for the rates
    plus ``nr_pad/DD_CHUNK`` chained contraction launches per RHS eval,
    each launch costing ~13 us of fixed latency inside the Newton
    while-loop), this removes every intermediate HBM round-trip and all
    but one launch.

    Inputs per lane: clipped-augmented concentration pair (uh, ul) of
    length ns+1 (trailing constant 1.0) and rate-constant pair (kh, kl)
    of length nr; output f64 (ns,) du. Batched via custom_vmap into the
    lane axis of one kernel. Accuracy identical to DDContraction's pair
    path (~2^-45 relative; the one-hot MXU gathers are exact).

    Lane-invariance contract (as in :class:`DDContraction`): the NT and
    E operands describe ONE network; when a batched ``lax.cond``
    broadcast hands the vmap rule batched copies, it takes index 0 —
    per-lane-varying stoichiometry/slot matrices are not supported.
    """

    supports_pair = True
    supports_fused = True

    def __init__(self, N: jnp.ndarray, reac_slots, max_batch: int = 512,
                 mode: str = "auto", interpret: bool = False):
        import numpy as np
        Nh = np.asarray(N, dtype=np.float64)
        if Nh.size and np.abs(Nh).max() > MAX_EXACT_STOICH:
            raise ValueError(
                f"stoichiometry magnitudes above {MAX_EXACT_STOICH} break "
                "the exact-product slice width; use the f64 path")
        if Nh.size and np.any(Nh != np.round(Nh)):
            raise ValueError("fused RHS requires integer stoichiometry")
        slots = np.asarray(reac_slots)
        nr, ns = Nh.shape
        arity = slots.shape[1]
        if slots.shape[0] != nr:
            raise ValueError("reac_slots/N reaction count mismatch")
        self.nr, self.ns, self.arity = nr, ns, arity
        self.nr_pad = _pad_up(max(nr, DD_CHUNK), DD_CHUNK)
        self.ns_pad = _pad_up(max(ns, SUBLANE), SUBLANE)
        # augmented species axis (constant-1 column lives at index ns)
        self.ns_aug_pad = _pad_up(ns + 1, SUBLANE)
        self.max_batch = max_batch
        if mode == "auto":
            # resolved HERE (host side, before any trace): the probe runs
            # an eager pallas_call, which must not happen mid-trace
            mode = ("grid" if (not interpret and fused_grid_supported())
                    else "scan")
        self.mode = mode
        self.interpret = interpret

        NT = np.zeros((self.ns_pad, self.nr_pad), dtype=np.float32)
        NT[:ns, :nr] = Nh.T
        self._NT = jnp.asarray(NT)
        E = np.zeros((arity, self.nr_pad, self.ns_aug_pad), dtype=np.float32)
        for s in range(arity):
            E[s, np.arange(nr), slots[:, s]] = 1.0
        # padding reactions gather the constant-1 column (exact no-ops
        # because their k pair is zero and their NT column is zero)
        E[:, nr:, ns] = 1.0
        self._E = jnp.asarray(E)

        self._rhs = _make_fused_rhs(nr, ns, arity, self.nr_pad,
                                    self.ns_aug_pad, max_batch, mode,
                                    interpret)

    def rhs_pair(self, uh, ul, kh, kl):
        """du (f64, (ns,)) from augmented-u and k double-f32 pairs."""
        return self._rhs(uh, ul, kh, kl, self._NT, self._E)


def _fused_call(NT32, E, uhT, ulT, khT, klT, arity, mode: str,
                interpret: bool = False):
    """Kernel driver: (ns_aug_pad, B) u pairs + (nr_pad, B) k pairs ->
    f64 (B, ns_pad) du. ``mode`` "grid" runs one launch with a
    sequential grid; "scan" chains per-chunk launches with carried
    accumulators."""
    ns_pad, nr_pad = NT32.shape
    ns_aug_pad = uhT.shape[0]
    B = uhT.shape[1]
    assert nr_pad % DD_CHUNK == 0
    nchunk = nr_pad // DD_CHUNK

    acc = jax.ShapeDtypeStruct((ns_pad, B), jnp.float32)
    if mode == "grid":
        kernel = pl.pallas_call(
            functools.partial(_fused_grid_kernel, DD_CHUNK, arity),
            grid=(nchunk,),
            in_specs=(
                [pl.BlockSpec((ns_pad, DD_CHUNK), lambda i: (0, i))]
                + [pl.BlockSpec((DD_CHUNK, ns_aug_pad), lambda i: (i, 0))
                   ] * arity
                + [pl.BlockSpec((DD_CHUNK, B), lambda i: (i, 0))] * 2
                + [pl.BlockSpec((ns_aug_pad, B), lambda i: (0, 0))] * 2),
            out_specs=(pl.BlockSpec((ns_pad, B), lambda i: (0, 0)),) * 4,
            out_shape=(acc,) * 4,
            interpret=interpret,
        )
        hi, lo, er, sl = kernel(NT32, *[E[s] for s in range(arity)],
                                khT, klT, uhT, ulT)
    else:
        kernel = pl.pallas_call(
            functools.partial(_fused_scan_kernel, DD_CHUNK, arity),
            out_shape=(acc,) * 4,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (9 + arity),
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4,
            interpret=interpret,
        )
        nt_c = NT32.reshape(ns_pad, nchunk, DD_CHUNK).transpose(1, 0, 2)
        e_c = E.reshape(arity, nchunk, DD_CHUNK, ns_aug_pad)
        kh_c = khT.reshape(nchunk, DD_CHUNK, B)
        kl_c = klT.reshape(nchunk, DD_CHUNK, B)
        zero = jnp.zeros((ns_pad, B), jnp.float32)

        def body(carry, xs):
            ntc, ec, a, b = xs
            return kernel(ntc, *[ec[s] for s in range(arity)], a, b,
                          uhT, ulT, *carry), None

        (hi, lo, er, sl), _ = lax.scan(
            body, (zero, zero, zero, zero),
            (nt_c, e_c.transpose(1, 0, 2, 3), kh_c, kl_c))

    du = (hi.astype(jnp.float64) + lo.astype(jnp.float64)
          + er.astype(jnp.float64) + sl.astype(jnp.float64))
    return du.T


@functools.lru_cache(maxsize=64)
def _make_fused_rhs(nr: int, ns: int, arity: int, nr_pad: int,
                    ns_aug_pad: int, max_batch: int, mode: str,
                    interpret: bool = False):
    """Build the per-geometry fused-RHS primitive (cached per shape)."""

    def rhs_b(uh, ul, kh, kl, NT, E):       # (B, *) f32 -> (B, ns) f64
        # lax.pad, not .at[].set — see matmul_b comment
        upad = ((0, ns_aug_pad - (ns + 1)), (0, 0))
        kpad = ((0, nr_pad - nr), (0, 0))
        return _fused_call(NT, E, jnp.pad(uh.T, upad), jnp.pad(ul.T, upad),
                           jnp.pad(kh.T, kpad), jnp.pad(kl.T, kpad),
                           arity, mode, interpret=interpret)[:, :ns]

    @jax.custom_batching.custom_vmap
    def rhs_one(uh, ul, kh, kl, NT, E):     # per-lane -> (ns,) f64
        return rhs_b(uh[None], ul[None], kh[None], kl[None], NT, E)[0]

    @rhs_one.def_vmap
    def _vmap_rule(axis_size, in_batched, uh, ul, kh, kl, NT, E):
        del axis_size
        assert in_batched[0] and in_batched[2], in_batched
        if in_batched[4]:
            NT = NT[0]                      # batched-cond broadcast: undo
        if in_batched[5]:
            E = E[0]
        lead = uh.shape[:-1]
        fu = uh.reshape((-1, uh.shape[-1]))
        fl = ul.reshape((-1, ul.shape[-1]))
        fkh = kh.reshape((-1, kh.shape[-1]))
        fkl = kl.reshape((-1, kl.shape[-1]))
        if fu.shape[0] > max_batch:
            nch = -(-fu.shape[0] // max_batch)
            Bp = nch * max_batch

            def padto(x):
                return jnp.zeros((Bp, x.shape[1]), x.dtype).at[:x.shape[0]].set(x)

            out = lax.map(
                lambda ab: rhs_b(ab[0], ab[1], ab[2], ab[3], NT, E),
                (padto(fu).reshape(nch, max_batch, -1),
                 padto(fl).reshape(nch, max_batch, -1),
                 padto(fkh).reshape(nch, max_batch, -1),
                 padto(fkl).reshape(nch, max_batch, -1)))
            out = out.reshape(Bp, -1)[:fu.shape[0]]
        else:
            out = rhs_b(fu, fl, fkh, fkl, NT, E)
        return out.reshape(lead + (ns,)), True

    return rhs_one


def make_local_fused_rhs(fused: "FusedMassActionRHS", n_shards: int):
    """Shard-local fused-RHS callable for reaction-axis (model) sharding.

    Under a ``("batch", "model")`` mesh the reaction axis of the rate
    tables — and of the stoichiometry/slot operands ``fused._NT`` /
    ``fused._E`` — shards over ``model``; each shard runs this local
    kernel on its reaction block and the caller ``psum``s the partial
    du over the mesh axis (parallel.batching builds the shard_map).

    Returns ``rhs_local(uh, ul, kh, kl, NT_local, E_local) -> (ns,) f64``
    where the k pair and the NT/E blocks have the per-shard reaction
    length ``fused.nr_pad // n_shards`` (must be a DD_CHUNK multiple —
    EnsembleProblem pads the network accordingly).
    """
    if fused.nr_pad % n_shards:
        raise ValueError(f"nr_pad {fused.nr_pad} not divisible by "
                         f"{n_shards} model shards")
    nr_loc = fused.nr_pad // n_shards
    if nr_loc % DD_CHUNK:
        raise ValueError(f"per-shard reaction count {nr_loc} is not a "
                         f"DD_CHUNK ({DD_CHUNK}) multiple; pad the network "
                         f"with nr_multiple={DD_CHUNK * n_shards}")
    return _make_fused_rhs(nr_loc, fused.ns, fused.arity, nr_loc,
                           fused.ns_aug_pad, fused.max_batch, fused.mode,
                           fused.interpret)


def make_local_dd_pair(dd: "DDContraction", n_shards: int):
    """Shard-local pair-contraction callable for reaction-axis sharding.

    Returns ``contract_local(rh, rl, NT_local) -> (ns,) f64`` over the
    per-shard reaction block (same psum contract as
    :func:`make_local_fused_rhs`).
    """
    if dd.nr_pad % n_shards:
        raise ValueError(f"nr_pad {dd.nr_pad} not divisible by "
                         f"{n_shards} model shards")
    nr_loc = dd.nr_pad // n_shards
    if nr_loc % DD_CHUNK:
        raise ValueError(f"per-shard reaction count {nr_loc} is not a "
                         f"DD_CHUNK ({DD_CHUNK}) multiple; pad the network "
                         f"with nr_multiple={DD_CHUNK * n_shards}")
    _, matmul_pair = _make_dd_matmul(nr_loc, dd.ns, nr_loc, dd.max_batch,
                                     dd.interpret)
    return matmul_pair


_FUSED_GRID_OK: bool | None = None


def fused_grid_supported() -> bool:
    """Probe (once per process) whether the Pallas grid machinery works
    on this backend/config — under x64 some jax versions capture i64
    values in the grid lowering and crash Mosaic (see pallas_linalg.py).
    Falls back to scan mode when the probe fails."""
    global _FUSED_GRID_OK
    if _FUSED_GRID_OK is None:
        if jax.default_backend() == "cpu":
            _FUSED_GRID_OK = False          # CPU callers use interpret/scan
        else:
            try:
                x = jnp.zeros((SUBLANE, LANE), jnp.float32)

                def k(x_ref, o_ref):
                    @pl.when(pl.program_id(0) == 0)
                    def _():
                        o_ref[:] = jnp.zeros_like(o_ref)
                    o_ref[:] = o_ref[:] + x_ref[:]

                out = pl.pallas_call(
                    k, grid=(2,),
                    in_specs=[pl.BlockSpec((SUBLANE, LANE), lambda i: (0, 0))],
                    out_specs=pl.BlockSpec((SUBLANE, LANE), lambda i: (0, 0)),
                    out_shape=jax.ShapeDtypeStruct((SUBLANE, LANE),
                                                   jnp.float32),
                )(x + 1.0)
                _FUSED_GRID_OK = bool(abs(float(out[0, 0]) - 2.0) < 1e-6)
            except Exception:
                _FUSED_GRID_OK = False
    return _FUSED_GRID_OK


def dd_reference(r: jnp.ndarray, N: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA reference of the sliced-compensated contraction (any
    backend; used by tests and as the CPU fallback path)."""
    r0, r1, r2 = split3(r)
    N32 = N.astype(jnp.float32)

    def acc_slice(rs):
        # f32 products are exact; accumulate in f64 (CPU: native f64)
        return (rs.astype(jnp.float64) @ N32.astype(jnp.float64))

    return acc_slice(r0) + acc_slice(r1) + acc_slice(r2)
