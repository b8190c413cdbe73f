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

import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve


class NewtonFactors(NamedTuple):
    lu: jnp.ndarray    # LU factors (possibly f32)
    piv: jnp.ndarray   # pivots
    J: jnp.ndarray     # Jacobian used (solve dtype) — kept for refinement
    c: jnp.ndarray     # scalar c in A = I - c J


def newton_factor(J: jnp.ndarray, c, lu_dtype=jnp.float32) -> NewtonFactors:
    """Factor A = I - c J at ``lu_dtype`` precision."""
    dtype = J.dtype
    ns = J.shape[0]
    A = jnp.eye(ns, dtype=dtype) - c * J
    lu, piv = lu_factor(A.astype(lu_dtype))
    return NewtonFactors(lu=lu, piv=piv, J=J, c=jnp.asarray(c, dtype))


def newton_solve(f: NewtonFactors, b: jnp.ndarray, refine: int = 1) -> jnp.ndarray:
    """Solve (I - c J) dy = b with f32 factors + f64 iterative refinement."""
    dtype = b.dtype
    lu_dtype = f.lu.dtype
    dy = lu_solve((f.lu, f.piv), b.astype(lu_dtype)).astype(dtype)
    if lu_dtype == dtype:
        return dy
    for _ in range(refine):
        r = b - (dy - f.c * (f.J @ dy))
        dy = dy + lu_solve((f.lu, f.piv), r.astype(lu_dtype)).astype(dtype)
    return dy
