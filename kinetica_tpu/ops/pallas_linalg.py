"""Pallas TPU kernels for the Newton linear algebra of the stiff solver.

Motivation (measured on TPU, 64-member batch, 49-species CRN): XLA lowers
``lu_factor``/``triangular_solve`` to internal HLO while-loops with ~n
sequential iterations, each a handful of tiny kernels. At the shapes a CRN
solve lives at, every kernel launch costs ~30-40 us, so one Newton factor
is ~1.1 ms and every back-substitution ~0.9 ms — pure launch latency, with
the arithmetic itself essentially free. That made the linear solve the
dominant per-step cost of :mod:`kinetica_tpu.ops.bdf`.

The TPU-native fix is to compute the *explicit inverse* of the Newton
matrix A = I - c J for the WHOLE batch in ONE grid-less Pallas launch
(Gauss-Jordan with partial pivoting on an augmented [M | Inv] block in
VMEM, all members eliminated in lockstep via mask arithmetic), after which
every Newton iteration's solve is a single fused MXU matvec instead of two
sequential triangular solves. Numerically this is the same mixed-precision
scheme as the LU path: the f32 inverse is only a preconditioner — f64
residual refinement against the exact Jacobian (ops/linalg.py) recovers
full accuracy, and the BDF Newton loop judges convergence on the true f64
residual.

Implementation constraints discovered on this stack (jax 0.8 / Mosaic,
x64 enabled — the solver needs f64 elsewhere):
* any 64-bit value inside a kernel crashes the Mosaic lowering, and BOTH
  the fori/while loop lowerings and the *grid* machinery (including
  vmap-of-pallas_call batching) capture i64 values under x64 → the kernel
  is grid-less, the column loop is unrolled over the static n, and the
  batch is vectorized inside the kernel rather than gridded;
* per-member pivot rows differ, so row swaps use one-hot row masks instead
  of dynamic slices — everything is lockstep vector arithmetic.

Limits: f32 values and n <= MAX_PALLAS_N (512) species — each half of the
augmented block is ceil(n/128) lane tiles wide (the mask-arithmetic
elimination is width-generic), and the batch is chunked so the block
stays within VMEM (members/launch shrinks as the width grows). Larger
systems use the XLA LU path (ops/linalg.py picks).
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
# Multi-tile widths: systems up to MAX_PALLAS_N species run the Pallas
# Gauss-Jordan inverse with the A/Inv halves each ceil(n/128) lane tiles
# wide; the mask-arithmetic elimination is width-generic, VMEM chunking
# shrinks members-per-launch as the width grows. Beyond this, XLA LU.
MAX_PALLAS_N = 512
# legacy alias for the widest batch (n_pad == 8); see _max_batch
MAX_PALLAS_BATCH = 64


def _max_batch(n_pad: int, wa: int = LANE) -> int:
    """Members per launch so the augmented scratch + in/out blocks stay
    well inside VMEM (~16 MB): bytes/member = n_pad * (2+1+1) * wa * 4."""
    budget = 10 * 1024 * 1024
    per_member = n_pad * 4 * wa * 4
    return max(8, (budget // per_member) // 8 * 8)


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _gj_batch_kernel(n: int, wa: int, a_ref, inv_ref, aug_ref):
    """Invert the top-left (n, n) block of every batch member in lockstep.

    ``aug_ref``: (B, n_pad, 2*wa) augmented [M | Inv], where ``wa`` is the
    width of each half in lanes (one or more 128-lane tiles). The column
    loop is an i32 while_loop; only the per-member pivot row is
    data-dependent and handled with one-hot row masks.
    """
    Bb, n_pad, W = aug_ref.shape
    ri = lax.broadcasted_iota(jnp.int32, (Bb, n_pad, 1), 1)
    li = lax.broadcasted_iota(jnp.int32, (Bb, n_pad, W), 2)
    rdiag = lax.broadcasted_iota(jnp.int32, (Bb, n_pad, W), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    tiny = jnp.float32(1e-30)

    # left half: A with identity on padded rows; right half: identity
    left = li < wa
    diag_l = (rdiag == li) & (rdiag >= n) & left
    diag_r = (rdiag == (li - wa)) & (~left)
    src = jnp.concatenate([a_ref[:], jnp.zeros_like(a_ref[:])], axis=2)
    aug_ref[:] = jnp.where(diag_l | diag_r, one, jnp.where(left, src, zero))

    # lane/row selector masks are mask arithmetic throughout: dynamic lane
    # indexing is not TPU-native, and dynamic-slice loads inside the kernel
    # fail to lower on this stack. The column loop is an int32-only
    # while_loop (fori_loop captures i64 bounds under x64).
    lane_k = li[:, :1, :]                                # (B, 1, W)

    def col(kk):
        Aug = aug_ref[:]
        kmask = (li == kk) & left                        # (B, n_pad, W)
        ck = jnp.sum(jnp.where(kmask, Aug, zero), axis=2,
                     keepdims=True)                      # (B, n_pad, 1)
        rvalid = (ri >= kk) & (ri < n)
        score = jnp.where(rvalid, jnp.abs(ck), -one)
        maxv = jnp.max(score, axis=1, keepdims=True)     # (B, 1, 1)
        mrow = jnp.min(jnp.where(score >= maxv, ri, jnp.int32(n_pad)),
                       axis=1, keepdims=True)            # (B, 1, 1)

        mask_k = ri == kk                                # (B, n_pad, 1)
        mask_m = ri == mrow
        row_k = jnp.sum(jnp.where(mask_k, Aug, zero), axis=1, keepdims=True)
        row_m = jnp.sum(jnp.where(mask_m, Aug, zero), axis=1, keepdims=True)

        kl = lane_k == kk                                # (B, 1, W)
        piv = jnp.sum(jnp.where(kl, row_m, zero), axis=2,
                      keepdims=True)                     # (B, 1, 1)
        # clamp vanishing pivots: a singular member yields a huge-but-
        # finite inverse and fails Newton honestly instead of NaN-ing out
        piv = jnp.where(jnp.abs(piv) < tiny,
                        jnp.where(piv < zero, -tiny, tiny), piv)
        row_p = row_m * (one / piv)                      # scaled pivot row

        # swap m <- old row k, eliminate with f = post-swap column kk
        # (row m's entry becomes old row k's), set row k to the pivot row
        ckk = jnp.sum(jnp.where(kl, row_k, zero), axis=2, keepdims=True)
        f = jnp.where(mask_m, ckk, ck)
        f = jnp.where(mask_k, zero, f)
        base = Aug + jnp.where(mask_m, row_k - row_m, zero)
        new = base - f * row_p
        aug_ref[:] = jnp.where(mask_k, row_p, new)
        return kk + jnp.int32(1)

    lax.while_loop(lambda kk: kk < jnp.int32(n), col, jnp.int32(0))
    inv_ref[:] = aug_ref[:, :, wa:]


def _gj_call(Ab: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Batched Gauss-Jordan: (B, n, n) -> (B, n, n) f32 inverses.

    Batches beyond the VMEM member budget run as a GRID over batch
    chunks inside ONE pallas_call: Mosaic pipelines the per-chunk
    input/output DMAs against the elimination compute, where the old
    ``lax.map`` formulation serialised one full launch per chunk
    (measured as the B=512 "factor cliff": 39.9 ms/step ungated vs
    23.2 gated — BASELINE.md round-4 late II — and 8 serial launches
    per factor at multi-tile width even at B=64).
    """
    B, n = Ab.shape[0], Ab.shape[-1]
    if n > MAX_PALLAS_N:
        raise ValueError(f"gj_inverse supports n <= {MAX_PALLAS_N}, got {n}")
    wa = _pad_up(max(n, LANE), LANE)
    n_pad = _pad_up(max(n, SUBLANE), SUBLANE)
    bmax = _max_batch(n_pad, wa)
    bchunk = min(B, bmax)
    nchunk = -(-B // bchunk)
    Bp = nchunk * bchunk
    Ap = jnp.zeros((Bp, n_pad, wa), jnp.float32)
    Ap = Ap.at[:B, :n, :n].set(Ab.astype(jnp.float32))
    if Bp != B:
        # pad members with the identity so the elimination stays regular
        Ap = Ap.at[B:, :n, :n].add(jnp.eye(n, dtype=jnp.float32))
    # Gridded pallas_call lowering captures i64 grid indices under x64
    # and Mosaic fails to legalize ('func.return'); everything here is
    # f32, so trace the call with x64 scoped off (safe mid-trace: no
    # x64 value crosses the boundary).
    with jax.enable_x64(False):
        inv = pl.pallas_call(
            functools.partial(_gj_batch_kernel, n, wa),
            grid=(nchunk,),
            out_shape=jax.ShapeDtypeStruct((Bp, n_pad, wa), jnp.float32),
            in_specs=[pl.BlockSpec((bchunk, n_pad, wa), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bchunk, n_pad, wa), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bchunk, n_pad, 2 * wa),
                                       jnp.float32)],
            interpret=interpret,
        )(Ap)
    return inv[:B, :n, :n]


@jax.custom_batching.custom_vmap
def _gj_inverse_f32(A: jnp.ndarray) -> jnp.ndarray:
    return _gj_call(A[None], interpret=False)[0]


@_gj_inverse_f32.def_vmap
def _gj_inverse_vmap_rule(axis_size, in_batched, A):
    del axis_size
    lead = A.shape[:-2]
    n = A.shape[-1]
    out = _gj_call(A.reshape((-1, n, n)), interpret=False)
    return out.reshape(lead + (n, n)), in_batched[0]


@jax.custom_jvp
def _gj_inverse_diff(A: jnp.ndarray) -> jnp.ndarray:
    return _gj_inverse_f32(A)


@_gj_inverse_diff.defjvp
def _gj_inverse_jvp(primals, tangents):
    """d(A^-1) = -A^-1 dA A^-1 — makes forward-sensitivity solves
    (jax.jacfwd through the BDF Newton loop) work on the TPU Pallas path;
    a pallas_call has no JVP rule of its own."""
    (A,), (dA,) = primals, tangents
    Minv = _gj_inverse_diff(A)
    dMinv = -(Minv @ dA.astype(Minv.dtype) @ Minv)
    return Minv, dMinv


@functools.partial(jax.jit, static_argnames=("interpret",))
def gj_inverse(A: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Explicit f32 inverse of a square matrix via one Pallas launch.

    ``A`` is (n, n) with n <= MAX_PALLAS_N (512); any dtype (cast to
    f32). Returns the
    (n, n) f32 inverse. Under vmap the batch is vectorized inside the
    kernel (lockstep elimination) through a custom_vmap rule; under
    forward-mode autodiff the analytic inverse differential is used.
    """
    if interpret:
        return _gj_call(A[None], interpret=True)[0]
    return _gj_inverse_diff(A)


def schur_inverse(A: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """f32 inverse for LANE < n <= MAX_PALLAS_N via recursive 2x2 block
    elimination: one-tile Pallas Gauss-Jordan on the diagonal blocks +
    MXU matmuls for the coupling terms.

    The widened multi-tile GJ kernel does O(n^3) VPU mask arithmetic
    over the full augmented block; splitting at the 128-lane tile turns
    all the cross-tile work into HIGHEST-precision MXU matmuls (~100x
    the VPU's flop rate), leaving only <=128-wide GJ eliminations on the
    VPU. Pivoting is confined within diagonal blocks — equilibration
    upstream plus the Newton-Schulz refinement downstream (which
    verifies the factor against its own residual) cover the Newton-
    preconditioner use case; this is NOT a general pivoted inverse.

    With M = [[A11, A12], [A21, A22]], S = A22 - A21 A11^-1 A12:
      M^-1 = [[A11^-1 - M12 T,  M12], [M21, S^-1]]
      where T = A21 A11^-1, M12 = -(A11^-1 A12) S^-1, M21 = -S^-1 T.
    Under vmap the block GJ vectorizes through gj_inverse's batch rule
    and the matmuls batch natively.
    """
    n = A.shape[-1]
    if n <= LANE:
        return gj_inverse(A, interpret=interpret)
    n1 = LANE * max(1, (n // 2) // LANE)
    A11, A12 = A[..., :n1, :n1], A[..., :n1, n1:]
    A21, A22 = A[..., n1:, :n1], A[..., n1:, n1:]
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    I11 = schur_inverse(A11, interpret=interpret)
    T = mm(A21, I11)
    S = A22 - mm(T, A12)
    Sinv = schur_inverse(S, interpret=interpret)
    M12 = -mm(mm(I11, A12), Sinv)
    M21 = -mm(Sinv, T)
    M11 = I11 - mm(M12, T)
    top = jnp.concatenate([M11, M12], axis=-1)
    bot = jnp.concatenate([M21, Sinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Fused Newton solve: preconditioner matvec + f64-equivalent iterative
# refinement + adaptive stopping in ONE Pallas launch.
# ---------------------------------------------------------------------------

def _ns_matvec(m, v):
    """In-kernel batched matvec: (B, n, n) f32 x (B, n) f32 -> (B, n).

    Formulated as a broadcast-multiply + lane-axis reduction — Mosaic has
    no batched dot_general, and per-lane matrices rule out a single MXU
    matmul; at n ~ 10^2 the VPU reduction is a few hundred kflop, far
    below launch cost."""
    return jnp.sum(m * v[:, None, :], axis=2)


def _newton_solve_kernel(n_sweeps: int, m_ref, j_ref, bh_ref, bl_ref,
                         ch_ref, cl_ref, dyh_ref, dyl_ref, act_ref):
    """Solve (I - c J) dy = b for the whole batch in one launch.

    ``m_ref`` holds the (scale-folded, possibly stale-c) f32 inverse
    preconditioner; refinement sweeps recompute the residual of the
    CURRENT (I - c J) in double-f32 pair precision, mirroring
    linalg.newton_solve's f64 refinement: sweep 1 is mandatory, later
    sweeps run per-lane only while the correction remains a significant
    (>1e-4) fraction of the solution. All pair arithmetic is f32
    (ops/dd.py error-free transforms); b and c enter as (hi, lo) pairs.

    The extra sweeps run in an in-kernel i32 while_loop (scalar carry +
    ref mutation — the Mosaic-safe pattern from the Gauss-Jordan kernel)
    with a jump-to-exit when no lane's correction is still significant,
    so the common well-conditioned case pays ONE sweep's arithmetic, not
    ``n_sweeps`` statically-unrolled ones.
    """
    from . import dd

    M = m_ref[:]
    J = j_ref[:]
    bh, bl = bh_ref[:], bl_ref[:]
    ch, cl = ch_ref[:], cl_ref[:]                     # (B, 1)
    zero = jnp.zeros_like(bh)
    tiny = jnp.float32(1e-30)

    dyh_ref[:] = _ns_matvec(M, bh + bl)
    dyl_ref[:] = zero
    act_ref[:] = jnp.ones_like(act_ref)

    def sweep():
        dyh, dyl = dyh_ref[:], dyl_ref[:]
        active = act_ref[:] > 0.0
        dy32 = dyh + dyl
        Jdy = _ns_matvec(J, dy32)
        ph, pl_ = dd.pair_mul(ch, cl, Jdy, zero, guard=False)      # c * (J @ dy)
        th, tl = dd.pair_add(dyh, dyl, -ph, -pl_, guard=False)     # dy - c J dy
        rh, rl = dd.pair_add(bh, bl, -th, -tl, guard=False)        # b - (dy - c J dy)
        corr = _ns_matvec(M, rh + rl)
        uh, ul = dd.pair_add(dyh, dyl, corr, zero, guard=False)
        dyh = jnp.where(active, uh, dyh)
        dyl = jnp.where(active, ul, dyl)
        dyh_ref[:] = dyh
        dyl_ref[:] = dyl
        dy32 = dyh + dyl
        ncorr = jnp.sqrt(jnp.sum(corr * corr, axis=1, keepdims=True))
        ndy = jnp.sqrt(jnp.sum(dy32 * dy32, axis=1, keepdims=True))
        act = active & (ncorr > 1e-4 * jnp.maximum(ndy, tiny))
        act_ref[:] = act.astype(jnp.float32)
        return jnp.max(act_ref[:]) > 0.0

    sweep()                                           # mandatory sweep

    def body(it):
        more = sweep()
        return jnp.where(more, it + jnp.int32(1), jnp.int32(n_sweeps))

    lax.while_loop(lambda it: it < jnp.int32(n_sweeps), body, jnp.int32(1))


def _fused_solve_max_batch(n_pad: int) -> int:
    """Members per launch: M + J resident plus ~2 (B, n, n) temporaries."""
    budget = 10 * 1024 * 1024
    per_member = 4 * n_pad * max(n_pad, LANE) * 4
    return max(8, (budget // per_member) // 8 * 8)


@functools.lru_cache(maxsize=64)
def _make_fused_solve(n: int, n_pad: int, n_sweeps: int, interpret: bool):
    max_batch = _fused_solve_max_batch(n_pad)

    def solve_b(M, J, b, c):
        """(B, n_pad, n_pad) f32 x2, (B, n) f64, (B,) f64 -> (B, n) f64.

        M and J arrive PRE-padded from the caller (the BDF loop pads the
        Jacobian once per gated refresh, and the factor inherits it):
        per-solve XLA zero-padding cost two (B, n, n) copies per Newton
        iteration, while passing unpadded operands costs Mosaic an
        on-stack relayout copy per matrix (VMEM-stack OOM at
        B=64/ns=73). Only the small rhs vectors are padded here."""
        from . import dd
        B = b.shape[0]
        # Mosaic rejects sub-sublane batches (a (1, n) operand hits an
        # "invalid relayout" on replicated dims) — pad tiny batches up
        # to one sublane tile (identity rows; outputs sliced back)
        B_pad = max(B, SUBLANE)
        if B_pad != B:
            M = jnp.concatenate(
                [M, jnp.broadcast_to(jnp.eye(n_pad, dtype=M.dtype),
                                     (B_pad - B, n_pad, n_pad))])
            J = jnp.concatenate(
                [J, jnp.zeros((B_pad - B, n_pad, n_pad), J.dtype)])
            b = jnp.concatenate([b, jnp.zeros((B_pad - B, n), b.dtype)])
            c = jnp.concatenate([c, jnp.zeros((B_pad - B,), c.dtype)])
        bh, bl = dd.pair_from_f64(b)
        if n_pad != n:
            bh = jnp.zeros((B_pad, n_pad), jnp.float32).at[:, :n].set(bh)
            bl = jnp.zeros((B_pad, n_pad), jnp.float32).at[:, :n].set(bl)
        ch, cl = dd.pair_from_f64(c)
        out = jax.ShapeDtypeStruct((B_pad, n_pad), jnp.float32)
        # raise the scoped-VMEM ceiling: M + J + the sweep loop's two
        # (B, n, n) broadcast temporaries exceed the 16M default at
        # B=64/n=80 (the in-kernel while_loop blocks XLA's cross-phase
        # temp sharing); the kernel's true working set still fits VMEM
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        dyh, dyl = pl.pallas_call(
            functools.partial(_newton_solve_kernel, n_sweeps),
            out_shape=(out, out),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            scratch_shapes=[pltpu.VMEM((B_pad, 1), jnp.float32)],
            interpret=interpret,
            **kwargs,
        )(M, J.astype(jnp.float32), bh, bl, ch[:, None], cl[:, None])
        return (dyh[:B, :n].astype(b.dtype) + dyl[:B, :n].astype(b.dtype))

    @jax.custom_batching.custom_vmap
    def solve_one(M, J, b, c):
        return solve_b(M[None], J[None], b[None], c[None])[0]

    @solve_one.def_vmap
    def _vmap_rule(axis_size, in_batched, M, J, b, c):
        del axis_size
        assert all(in_batched), in_batched
        lead = b.shape[:-1]
        Mf = M.reshape((-1, n_pad, n_pad))
        Jf = J.reshape((-1,) + J.shape[-2:])
        bf = b.reshape((-1, n))
        cf = c.reshape((-1,))
        B = bf.shape[0]
        if B > max_batch:
            nch = -(-B // max_batch)
            Bp = nch * max_batch

            def padto(x):
                return jnp.zeros((Bp,) + x.shape[1:], x.dtype
                                 ).at[:x.shape[0]].set(x)

            out = lax.map(
                lambda t: solve_b(*t),
                (padto(Mf).reshape((nch, max_batch) + Mf.shape[1:]),
                 padto(Jf).reshape((nch, max_batch) + Jf.shape[1:]),
                 padto(bf).reshape((nch, max_batch, n)),
                 padto(cf).reshape((nch, max_batch))))
            out = out.reshape(Bp, n)[:B]
        else:
            out = solve_b(Mf, Jf, bf, cf)
        return out.reshape(lead + (n,)), True

    return solve_one


@functools.partial(jax.custom_jvp, nondiff_argnums=(4, 5))
def _fused_solve_diff(M, J, b, c, n_sweeps, interpret):
    fn = _make_fused_solve(b.shape[-1], M.shape[-1], n_sweeps, interpret)
    return fn(M, J, b, c)


@_fused_solve_diff.defjvp
def _fused_solve_jvp(n_sweeps, interpret, primals, tangents):
    """Approximate forward-mode rule: the solve acts as b -> A^-1 b with
    A = I - c J (refined to ~1e-4 by the kernel), so
    d(dy) = A^-1 (db + dc (J dy) + c (dJ dy)); the preconditioner
    tangent dM only perturbs the (already sub-tolerance) refinement
    error and is dropped — same approximation order as the primal."""
    (M, J, b, c), (dM, dJ, db, dc) = primals, tangents
    del dM
    n = b.shape[-1]
    dy = _fused_solve_diff(M, J, b, c, n_sweeps, interpret)
    Jn = J[..., :n, :n]                    # J may be tile-padded
    dJn = dJ[..., :n, :n]
    Jdy = (Jn @ dy[..., None].astype(J.dtype))[..., 0].astype(b.dtype)
    dJdy = (dJn @ dy[..., None].astype(dJ.dtype))[..., 0].astype(b.dtype)
    rhs_t = db + dc[..., None] * Jdy + c[..., None] * dJdy
    return dy, _fused_solve_diff(M, J, rhs_t, c, n_sweeps, interpret)


def fused_newton_solve(M, J, b, c, n_sweeps: int = 4,
                       interpret: bool = False):
    """One-launch Newton solve (I - c J) dy = b with pair-precision
    refinement (see :func:`_newton_solve_kernel`).

    ``M``: f32 preconditioner inverse (scales folded, possibly stale-c),
    ``J``: Jacobian (f32 or f64, cast to f32 in-kernel), ``b``: f64
    residual, ``c``: f64 per-solve scalar. Differentiable (forward mode,
    via a registered analytic rule) and vmappable; batches chunk
    automatically to stay inside VMEM.
    """
    return _fused_solve_diff(M, J, b, c, n_sweeps, interpret)
