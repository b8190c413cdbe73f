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

Limits: f32 values, one 128-lane tile wide (n <= 128 species), and the
batch is chunked so the augmented block stays within VMEM; larger systems
use the XLA LU path (ops/linalg.py picks).
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
MAX_PALLAS_N = 128
# legacy alias for the widest batch (n_pad == 8); see _max_batch
MAX_PALLAS_BATCH = 64


def _max_batch(n_pad: int) -> int:
    """Members per launch so the augmented scratch + in/out blocks stay
    well inside VMEM (~16 MB): bytes/member = n_pad * (2+1+1) * LANE * 4."""
    budget = 10 * 1024 * 1024
    per_member = n_pad * 4 * LANE * 4
    return max(8, (budget // per_member) // 8 * 8)


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _gj_batch_kernel(n: int, a_ref, inv_ref, aug_ref):
    """Invert the top-left (n, n) block of every batch member in lockstep.

    ``aug_ref``: (B, n_pad, 2*LANE) augmented [M | Inv]. The column loop is
    unrolled (static n), so lane index ``kk`` is static and column reads
    are static slices; only the per-member pivot row is data-dependent and
    handled with one-hot row masks.
    """
    Bb, n_pad, W = aug_ref.shape
    ri = lax.broadcasted_iota(jnp.int32, (Bb, n_pad, 1), 1)
    li = lax.broadcasted_iota(jnp.int32, (Bb, n_pad, W), 2)
    rdiag = lax.broadcasted_iota(jnp.int32, (Bb, n_pad, W), 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    tiny = jnp.float32(1e-30)

    # left half: A with identity on padded rows; right half: identity
    left = li < LANE
    diag_l = (rdiag == li) & (rdiag >= n) & left
    diag_r = (rdiag == (li - LANE)) & (~left)
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
    inv_ref[:] = aug_ref[:, :, LANE:]


def _gj_call(Ab: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Batched Gauss-Jordan: (B, n, n) -> (B, n, n) f32 inverses.

    Chunks the batch so each grid-less launch fits VMEM.
    """
    B, n = Ab.shape[0], Ab.shape[-1]
    if n > MAX_PALLAS_N:
        raise ValueError(f"gj_inverse supports n <= {MAX_PALLAS_N}, got {n}")
    n_pad = _pad_up(max(n, SUBLANE), SUBLANE)
    bmax = _max_batch(n_pad)
    if B > bmax:
        nchunk = -(-B // bmax)
        Bp = nchunk * bmax
        Apad = jnp.zeros((Bp, n, n), jnp.float32)
        Apad = Apad.at[:B].set(Ab.astype(jnp.float32))
        Apad = Apad.at[B:, :, :].add(jnp.eye(n, dtype=jnp.float32))
        chunks = Apad.reshape(nchunk, bmax, n, n)
        out = lax.map(lambda a: _gj_call(a, interpret), chunks)
        return out.reshape(Bp, n, n)[:B]

    Ap = jnp.zeros((B, n_pad, LANE), jnp.float32)
    Ap = Ap.at[:, :n, :n].set(Ab.astype(jnp.float32))
    inv = pl.pallas_call(
        functools.partial(_gj_batch_kernel, n),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, n_pad, 2 * LANE), jnp.float32)],
        interpret=interpret,
    )(Ap)
    return inv[:, :n, :n]


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

    ``A`` is (n, n) with n <= 128; any dtype (cast to f32). Returns the
    (n, n) f32 inverse. Under vmap the batch is vectorized inside the
    kernel (lockstep elimination) through a custom_vmap rule; under
    forward-mode autodiff the analytic inverse differential is used.
    """
    if interpret:
        return _gj_call(A[None], interpret=True)[0]
    return _gj_inverse_diff(A)
