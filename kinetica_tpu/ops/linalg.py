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

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

from .pallas_linalg import MAX_PALLAS_N, gj_inverse


class NewtonFactors(NamedTuple):
    lu: jnp.ndarray    # LU factors ("lu" method) or explicit inverse ("inv")
    piv: jnp.ndarray   # pivots ("lu") / dummy zeros ("inv")
    J: jnp.ndarray     # Jacobian used (solve dtype) — kept for refinement
    c: jnp.ndarray     # scalar c in A = I - c J


def resolve_linsolve(method: str, ns: int) -> str:
    """Resolve "auto" to a concrete Newton linear-solve method.

    "inv" (explicit inverse via the Pallas Gauss-Jordan kernel + matvec
    back-substitutions) is the TPU-native choice — XLA's LU/triangular
    solves lower to ~n-iteration HLO while loops whose launch latency
    dominates the whole integrator. CPU keeps "lu" (native f64 LAPACK
    path, no Pallas backend), as do systems wider than one lane tile.
    """
    if method != "auto":
        return method
    if jax.default_backend() == "cpu" or ns > MAX_PALLAS_N:
        return "lu"
    return "inv"


def newton_factor(J: jnp.ndarray, c, lu_dtype=jnp.float32,
                  method: str = "lu") -> NewtonFactors:
    """Factor A = I - c J at ``lu_dtype`` precision.

    ``method`` "lu": LAPACK-style LU factors. "inv": explicit f32 inverse
    computed by one Pallas launch (ops/pallas_linalg.py) so that each
    back-substitution is a single fused matvec.
    """
    dtype = J.dtype
    ns = J.shape[0]
    # honour J's dtype: an f32 Jacobian (jac_dtype="float32") must not be
    # promoted back to f64 by the scalar c under x64 semantics
    A = jnp.eye(ns, dtype=dtype) - jnp.asarray(c, dtype) * J
    if method == "inv":
        minv = gj_inverse(A)
        return NewtonFactors(lu=minv, piv=jnp.zeros((ns,), jnp.int32),
                             J=J, c=jnp.asarray(c, dtype))
    lu, piv = lu_factor(A.astype(lu_dtype))
    return NewtonFactors(lu=lu, piv=piv, J=J, c=jnp.asarray(c, dtype))


def newton_solve(f: NewtonFactors, b: jnp.ndarray, refine: int = 1,
                 method: str = "lu") -> jnp.ndarray:
    """Solve (I - c J) dy = b with f32 factors + f64 iterative refinement."""
    dtype = b.dtype
    lu_dtype = f.lu.dtype

    if method == "inv":
        def solve32(v):
            return (f.lu @ v.astype(lu_dtype)).astype(dtype)
    else:
        def solve32(v):
            return lu_solve((f.lu, f.piv), v.astype(lu_dtype)).astype(dtype)

    dy = solve32(b)
    if lu_dtype == dtype and method != "inv":
        return dy
    jdt = f.J.dtype
    c = jnp.asarray(f.c, dtype)
    for _ in range(refine):
        # the J matvec runs in J's own dtype (f32 when jac_dtype="float32"
        # — J is a preconditioner; the Newton fixed point is anchored by
        # the f64 rhs residual, so refinement only needs to *approximate*
        # (I - cJ)^-1 well, not reproduce it to f64)
        Jdy = (f.J @ dy.astype(jdt)).astype(dtype)
        r = b - (dy - c * Jdy)
        dy = dy + solve32(r)
    return dy
