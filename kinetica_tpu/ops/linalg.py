"""Mixed-precision dense linear solves for Newton iterations on TPU.

TPU XLA implements LU decomposition only in F32 (``LuDecompositionExpander``
rejects f64), and the MXU has no native f64 path. The TPU-native design for
a stiff integrator's Newton solve is therefore *mixed precision with
iterative refinement*:

* factor ``A = I - c J`` once per step-size/Jacobian change in **float32**
  (native, fast, O(n^3)),
* back-substitute the **float64** Newton residual through the f32 factors,
* recover full f64 accuracy with refinement sweeps
  ``r = b - A dy;  dy += solve32(r)`` — each sweep is only an O(n^2)
  f64 matvec (cheap even emulated) and multiplies the error by
  ~eps_f32 * cond(A), so 1-2 sweeps reach f64-level residuals for the
  conditioning regimes mass-action Newton matrices live in.

When the solve dtype is already f32 (or on CPU where f64 LU is native and
``precision='full'`` is requested) this degrades gracefully to a plain LU.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import lu_factor, lu_solve

from .pallas_linalg import (LANE as MAX_PALLAS_LANE, MAX_PALLAS_N,
                            gj_inverse, schur_inverse)


class NewtonFactors(NamedTuple):
    lu: jnp.ndarray    # LU factors ("lu") or equilibrated inverse ("inv")
    piv: jnp.ndarray   # pivots ("lu") / dummy zeros ("inv")
    J: jnp.ndarray     # Jacobian used (solve dtype) — kept for refinement
    c: jnp.ndarray     # scalar c in A = I - c J


def resolve_linsolve(method: str, ns: int) -> str:
    """Resolve "auto" to a concrete Newton linear-solve method.

    "inv_gated" (explicit inverse via the Pallas Gauss-Jordan kernel +
    matvec back-substitutions, with the vmap batch rule compacting the
    factor rebuild to the lanes whose c drifted) is the TPU-native
    choice — XLA's LU/triangular solves lower to ~n-iteration HLO while
    loops whose launch latency dominates the whole integrator, and the
    ungated "inv" pays the full-batch Gauss-Jordan almost every step
    because the collective ANY-lane refactor gate fires even though
    per-lane refresh rates are ~0.2/step. Measured (round 4, v5e):
    1095 rxns/73 sp/B=64 30.9 vs 44.4 ms/profile; 4473 rxns/181 sp
    199.1 vs 322.1 ms/profile. CPU keeps "lu" (native f64 LAPACK path,
    no Pallas backend), as do systems wider than MAX_PALLAS_N.
    """
    if method != "auto":
        return method
    if jax.default_backend() == "cpu" or ns > MAX_PALLAS_N:
        return "lu"
    # "inv_fused" (whole solve in one Pallas launch) wins ~8% on
    # saturated/ill-conditioned regimes where refinement sweeps run
    # deep, but loses ~10% on the production bench where Newton
    # converges shallow and XLA pipelines the batched MXU matvecs
    # across the step's dataflow — the gated inverse keeps that XLA
    # solve and only compacts the factor *rebuild*.
    return "inv_gated"


def _newton_matrix(J, c):
    dtype = J.dtype
    ns = J.shape[0]
    # honour J's dtype: an f32 Jacobian (jac_dtype="float32") must not be
    # promoted back to f64 by the scalar c under x64 semantics
    return jnp.eye(ns, dtype=dtype) - jnp.asarray(c, dtype) * J


def _equilibrate(A):
    """Ruiz-style row/column max-norm scaling of A (f32).

    Mass-action Newton matrices are extremely badly SCALED (rows span ~1
    for inert species to c*k*u ~ 1e9 for saturated channels) rather than
    intrinsically singular: factoring Dr*A*Dc with entries normalised to
    O(1) keeps the reduced-precision factorisation's effective condition
    number small. Measured on the k_max-saturated getting-started CRN,
    the unequilibrated f32 factor stalled Newton at contraction rates
    ~0.5 (each solve ~50% error after refinement), tripping the
    divergence test on most steps; with equilibration the mixed path
    recovers the full-f64-LU step profile.

    Deterministic in A alone, so callers may recompute the scales
    instead of carrying them in solver state.
    """
    f32 = jnp.float32
    A32 = A.astype(f32)
    tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)
    dr = 1.0 / jnp.maximum(jnp.max(jnp.abs(A32), axis=1), tiny)
    As = A32 * dr[:, None]
    dc = 1.0 / jnp.maximum(jnp.max(jnp.abs(As), axis=0), tiny)
    return As * dc[None, :], dr, dc


def _inv_factor_one(A):
    """Equilibrate -> Pallas Gauss-Jordan inverse -> Newton-Schulz refine
    -> fold the scales back: the full "inv"-method factor build for ONE
    Newton matrix (vmap batches it; see ``_inv_factor_gated`` for the
    lane-compacted batch rule).

    Newton-Schulz with pair-precision residuals: the f32 inversion
    error is ~eps32 * cond(As); for saturated-rate CRNs cond can
    reach 1e7+ even after equilibration, leaving 10%+ solve errors
    that stall the integrator's Newton iteration (its 2nd iterate
    becomes solve error, tripping the divergence test). Quadratic
    refinement drives the factor residual below 3e-5 in 0-4 cheap
    f32 matmul sweeps (ops/dd.py).
    """
    from .dd import newton_schulz_refine
    As, dr, dc = _equilibrate(A)
    # explicit inv on the CPU backend (debug/verification; "auto"
    # never picks it there) runs the kernel in interpret mode
    interpret = jax.default_backend() == "cpu"
    ns = A.shape[-1]
    if ns > MAX_PALLAS_LANE and os.environ.get(
            "KINETICA_MULTITILE_INV", "schur") == "schur":
        # past one lane tile the block-Schur composition (one-tile GJ
        # diagonal blocks + MXU coupling matmuls) replaces the widened
        # VPU kernel — measured 13.5 -> see design.md round-4 notes;
        # KINETICA_MULTITILE_INV=wide restores the single-kernel path
        minv32 = schur_inverse(As, interpret=interpret)
    else:
        minv32 = gj_inverse(As, interpret=interpret)
    minv32, _ = newton_schulz_refine(minv32, As)
    return dc[:, None] * minv32 * dr[None, :]


@jax.custom_batching.custom_vmap
def _inv_factor_gated(A, need):
    del need
    return _inv_factor_one(A)


@_inv_factor_gated.def_vmap
def _inv_factor_gated_vmap(axis_size, in_batched, A, need):
    """Lane-compacted batch rule for the gated factor refresh.

    The BDF step gates its refactor behind a zero-trip while_loop, but
    vmap batches that loop as run-while-ANY-lane-needs-it: with per-lane
    refresh rates ~0.2/step, the ANY-lane probability at B=64 is ~1, so
    the full-batch Gauss-Jordan + Newton-Schulz runs nearly every step
    even though each lane uses ~20% of the results. This rule gathers
    the needing lanes into a B/4- (or B/2-) sized sub-batch, factors
    only those, and scatters back. Lanes with ``need=False`` receive
    EITHER zeros (lanes outside the bucket) OR arbitrary fill-in values
    (the bucket is padded with up to bucket-minus-count non-needing
    lanes, whose valid-but-unrequested inverses are scattered back too)
    — callers MUST mask by ``need``; the batched while_loop's per-lane
    carry masking does, keeping non-needing lanes' old factors. Falls
    back to the full batch when more than B/2 lanes need a refresh.
    """
    del axis_size
    a_b, n_b = in_batched
    assert a_b, "A must carry the batch axis"
    single = jax.vmap(_inv_factor_one)
    B = A.shape[0]
    if (not n_b) or B < 16:
        # unbatched need = every lane in the same state: nothing to compact
        return single(A), True

    def bucketed(bucket):
        idx = jnp.argsort(~need)[:bucket]
        sub = single(A[idx])
        return jnp.zeros((B,) + A.shape[-2:], sub.dtype).at[idx].set(sub)

    tiers = sorted({b for b in (_pad8(-(-B // 4)), _pad8(-(-B // 2)))
                    if b < B})
    if not tiers:
        return single(A), True
    count = jnp.sum(need)

    def dispatch(remaining):
        if not remaining:
            return single(A)
        b = remaining[0]
        return lax.cond(count <= b, lambda _: bucketed(b),
                        lambda _: dispatch(remaining[1:]), operand=None)

    return dispatch(tiers), True


def _pad8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


@jax.custom_jvp
def _inv_factor_diff(A, need):
    return _inv_factor_gated(A, need)


@_inv_factor_diff.defjvp
def _inv_factor_jvp(primals, tangents):
    """d(A^-1) = -A^-1 dA A^-1 — the factor is a (refined) approximate
    inverse, so the analytic inverse differential is the right tangent
    (same rule as ``pallas_linalg._gj_inverse_jvp``); ``need`` is a
    gating flag with no tangent."""
    (A, need), (dA, _) = primals, tangents
    M = _inv_factor_diff(A, need)
    dM = -(M @ dA.astype(M.dtype) @ M)
    return M, dM


def warm_factor_refresh(J: jnp.ndarray, c, M_prev: jnp.ndarray, need,
                        tol: float = 3e-4, sweeps: int = 3):
    """Refresh an explicit-inverse Newton factor by Newton-Schulz sweeps
    from the PREVIOUS inverse instead of a full rebuild.

    A c-drift refactor (the dominant refresh trigger, ~0.2/lane-step)
    changes the Newton matrix only by A_new = (c_new/c_old) A_old +
    (1 - c_new/c_old) I, so the old inverse starts within ~lu_drift_tol
    (0.3) of A_new^-1 — quadratic NS contraction reaches the factor
    tolerance (3e-4) in ~3 sweeps of plain HIGHEST-precision MXU
    matmuls, skipping the equilibrate + Pallas Gauss-Jordan + refine
    chain entirely. Works unscaled: the stored factor has its
    equilibration scales folded in, and R = I - A M is scale-free.

    Returns ``(M_warm, need_full)``: the swept factor and the lanes
    whose residual is still above ``tol`` (J refreshes, saturated
    conditioning, divergent sweeps — NaN/inf residuals count as
    failures) which must take the full build. Lanes with ``need`` False
    produce garbage and MUST be discarded by the caller.
    """
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    A = _newton_matrix(J, c).astype(f32)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=f32)
    M = M_prev.astype(f32)
    for _ in range(sweeps):
        R = eye - jnp.matmul(A, M, precision=hi)
        M = M + jnp.matmul(M, R, precision=hi)
    rn = jnp.max(jnp.abs(eye - jnp.matmul(A, M, precision=hi)))
    ok = jnp.isfinite(rn) & (rn <= tol)
    return M, jnp.asarray(need, bool) & ~ok


def newton_factor(J: jnp.ndarray, c, lu_dtype=jnp.float32,
                  method: str = "lu", need=None) -> NewtonFactors:
    """Factor A = I - c J at ``lu_dtype`` precision (equilibrated).

    ``method`` "lu": LAPACK-style LU factors of the equilibrated matrix
    (the scales are re-derived in newton_solve — they are deterministic
    in (J, c), so no extra state rides in the integrator carry).
    "inv": explicit f32 inverse computed by one Pallas launch
    (ops/pallas_linalg.py) with the scales FOLDED into the stored matrix
    (A^-1 = Dc (Dr A Dc)^-1 Dr), so each back-substitution stays a
    single fused matvec. "inv_gated": same factor, but under vmap the
    build is compacted to the lanes whose ``need`` flag is set (see
    ``_inv_factor_gated_vmap``); lanes with ``need=False`` get zeros or
    arbitrary bucket fill-in values and MUST be masked out by the
    caller (the BDF refactor while_loop is).
    """
    dtype = J.dtype
    ns = J.shape[0]
    A = _newton_matrix(J, c)

    if method == "inv_gated":
        need_arr = (jnp.asarray(True) if need is None
                    else jnp.asarray(need, bool))
        minv = _inv_factor_diff(A, need_arr)
        return NewtonFactors(lu=minv, piv=jnp.zeros((ns,), jnp.int32),
                             J=J, c=jnp.asarray(c, dtype))
    if method in ("inv", "inv_fused"):
        minv = _inv_factor_one(A)
        return NewtonFactors(lu=minv, piv=jnp.zeros((ns,), jnp.int32),
                             J=J, c=jnp.asarray(c, dtype))
    if lu_dtype == jnp.float32:
        As, _, _ = _equilibrate(A)
        lu, piv = lu_factor(As)
        return NewtonFactors(lu=lu, piv=piv, J=J, c=jnp.asarray(c, dtype))
    lu, piv = lu_factor(A.astype(lu_dtype))
    return NewtonFactors(lu=lu, piv=piv, J=J, c=jnp.asarray(c, dtype))


def newton_solve(f: NewtonFactors, b: jnp.ndarray, refine: int = 1,
                 method: str = "lu", max_refine: int = 4) -> jnp.ndarray:
    """Solve (I - c J) dy = b with f32 factors + f64 iterative refinement.

    Refinement is residual-adaptive: after the mandatory ``refine``
    sweep(s), further sweeps run only while the correction is still a
    significant fraction of the solution (each sweep multiplies the error
    by ~eps_f32 * cond(A), so well-conditioned systems stop immediately
    while badly scaled mass-action Newton matrices — concentrations
    spanning ~10 decades against k ~ 1e12 — get the extra sweeps they
    need). Measured on the k_max-saturated getting-started CRN: fixed
    refine=1 left the f32-factor error large enough to fail Newton
    chronically (776 steps, 19% rejections for a 0.5 s chunk vs 322
    steps / 4% with a full f64 LU); adaptive refinement recovers the
    f64-LU step profile at f32-factor cost.
    """
    dtype = b.dtype
    lu_dtype = f.lu.dtype

    if method == "inv_fused":
        # Entire solve (matvec + pair-precision refinement + adaptive
        # stopping) in one Pallas launch — the XLA formulation below
        # costs ~6 launches through matvecs, norm reductions and the
        # adaptive while_loop, which dominate at CRN sizes.
        from .pallas_linalg import fused_newton_solve
        return fused_newton_solve(f.lu, f.J, b, jnp.asarray(f.c, dtype),
                                  n_sweeps=max_refine,
                                  interpret=jax.default_backend() == "cpu")

    if method in ("inv", "inv_gated"):
        def solve32(v):
            return (f.lu @ v.astype(lu_dtype)).astype(dtype)
    elif lu_dtype == jnp.float32:
        # the factors are of the equilibrated matrix: re-derive the
        # deterministic scales from (J, c) and unscale each solve
        _, dr, dc = _equilibrate(_newton_matrix(f.J, f.c))

        def solve32(v):
            z = lu_solve((f.lu, f.piv), v.astype(jnp.float32) * dr)
            return (z * dc).astype(dtype)
    else:
        def solve32(v):
            return lu_solve((f.lu, f.piv), v.astype(lu_dtype)).astype(dtype)

    dy = solve32(b)
    if lu_dtype == dtype and method not in ("inv", "inv_gated"):
        return dy
    jdt = f.J.dtype
    c = jnp.asarray(f.c, dtype)

    def sweep(dy):
        # the J matvec runs in J's own dtype (f32 when jac_dtype="float32"
        # — J is a preconditioner; the Newton fixed point is anchored by
        # the f64 rhs residual, so refinement only needs to *approximate*
        # (I - cJ)^-1 well, not reproduce it to f64)
        Jdy = (f.J @ dy.astype(jdt)).astype(dtype)
        r = b - (dy - c * Jdy)
        corr = solve32(r)
        return dy + corr, corr

    # KINETICA_REFINE: "unroll:N" runs exactly N sweeps with no norms or
    # loop machinery; "adaptive" runs the residual-adaptive while_loop
    # below; "auto" (default) picks unroll:2 on accelerators for the
    # explicit-inverse paths and adaptive otherwise. Rationale: under
    # vmap the adaptive loop runs while ANY lane's correction is big
    # (B=64 -> nearly always the max trip count), so its norms +
    # closed-call boundaries are pure overhead — the r4 trace
    # attribution measured ~35 small kernels (~0.45 ms) per solve at
    # multi-tile width, ~19-35% of the nc=60 window. A fixed unrolled
    # schedule is the same arithmetic XLA can fuse straight-line:
    # measured (r5, v5e, flagship 1095rxn/73sp B=64) 1.918 -> 1.739
    # ms/step with identical accuracy and slightly FEWER steps (two
    # unconditional sweeps solve more accurately than the 1e-4-relative
    # adaptive exit); unroll:1 under-solves (1.852, more steps) and
    # unroll:3 buys nothing (1.786). A straight-line solve is also
    # reverse-differentiable, which the while_loop was not.
    _refine_mode = os.environ.get("KINETICA_REFINE", "auto")
    if _refine_mode == "auto":
        _refine_mode = ("unroll:2"
                        if (method in ("inv", "inv_gated")
                            and jax.default_backend() != "cpu")
                        else "adaptive")
    if _refine_mode.startswith("unroll"):
        n_sw = int(_refine_mode.split(":")[1]) if ":" in _refine_mode else 2
        for _ in range(max(n_sw, 1)):
            dy, _ = sweep(dy)
        return dy

    for _ in range(max(refine, 1)):
        dy, corr = sweep(dy)

    if max_refine > refine:
        f32 = jnp.float32
        tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)

        def norm32(v):
            return jnp.linalg.norm(v.astype(f32))

        def cond(carry):
            dy, corr, it = carry
            still_big = norm32(corr) > 1e-4 * jnp.maximum(norm32(dy), tiny)
            return still_big & (it < max_refine)

        def body(carry):
            dy, _, it = carry
            dy, corr = sweep(dy)
            return dy, corr, it + 1

        dy, _, _ = jax.lax.while_loop(
            cond, body, (dy, corr, jnp.asarray(refine, jnp.int32)))
    return dy
