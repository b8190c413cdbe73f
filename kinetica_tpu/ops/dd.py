"""Double-f32 ("double-double lite") pair arithmetic for TPU hot paths.

A value x is represented as an (hi, lo) pair of f32 with x ~= hi + lo and
|lo| <= ulp(hi)/2, giving ~48 bits of effective mantissa — enough for the
stiff integrator's RHS pipeline (its tolerance targets are rtol >= 1e-10)
at plain-f32 elementwise cost, where genuine f64 on TPU is ~12x slower
elementwise and catastrophically slower in emulated matmuls inside loop
bodies (see ops/pallas_matmul.py).

Classic error-free transformations (Dekker/Knuth; cf. Hida, Li & Bailey's
QD and the JAX ecosystem's double-double implementations): TwoSum,
Veltkamp splitting, TwoProd (no FMA assumed — TPU VPU multiply-add
contraction is not guaranteed through XLA), renormalised pair multiply.

These run as plain jnp elementwise ops (XLA fuses them); the companion
Pallas kernel consumes pairs for the reaction-axis contraction.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# 2^12 + 1 (Veltkamp split of 24-bit f32). A plain Python float (weakly
# typed: stays f32 against f32 operands) — a jnp scalar here would be
# closure-captured as a device constant, which Pallas kernels reject.
_SPLITTER = 4097.0


def two_sum(a, b):
    """s, e with s = fl(a+b) and a+b = s+e exactly (Knuth)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def fast_two_sum(a, b):
    """TwoSum assuming |a| >= |b| (Dekker) — 3 ops instead of 6."""
    s = a + b
    e = b - (s - a)
    return s, e


def veltkamp(a):
    """a = hi + lo with hi carrying the top 12 mantissa bits (exact)."""
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """p, e with p = fl(a*b) and a*b = p+e exactly (Dekker, FMA-free)."""
    p = a * b
    ah, al = veltkamp(a)
    bh, bl = veltkamp(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def pair_from_f64(x):
    """f64 -> (hi, lo) f32 pair (both conversions exact)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def pair_to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def pair_mul(xh, xl, yh, yl):
    """Renormalised pair product: (xh+xl)*(yh+yl) to ~2^-45 relative."""
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e)


def pair_add(xh, xl, yh, yl):
    """Renormalised pair sum: (xh+xl)+(yh+yl) to ~2^-45 relative
    (Dekker's "sloppy" add — sufficient here: consumers tolerate
    relative error well above pair width)."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def pair_neg(xh, xl):
    return -xh, -xl


def pair_chop_slices(hi, lo):
    """(hi, lo) pair -> three f32 slices (s0, s1, s2) for the contraction
    kernel: s0/s1 carry 21-bit mantissas (exact products with small-int
    stoichiometry), s2 the rest. Mirrors pallas_matmul.split3 without a
    f64 round-trip; relative coverage ~2^-45 (the pair's own width).
    """
    chopm = jnp.int32(-8)

    def chop21(x):
        return lax.bitcast_convert_type(
            lax.bitcast_convert_type(x, jnp.int32) & chopm, jnp.float32)

    s0 = chop21(hi)
    d = hi - s0                    # exact: <= 3 bits
    t = d + lo                     # rounds at 2^-45 of the pair
    s1 = chop21(t)
    s2 = t - s1                    # exact
    return s0, s1, s2


def residual_eye_pair(A32, M32):
    """R = I - A @ M for f32 square A, M, accurate to ~1e-13 absolute.

    The straight f32 product would round at eps32 ~ 6e-8 — useless for
    measuring a residual that Newton-Schulz needs to drive below 1e-4
    from an f32 inverse with eps32*cond(A) ~ O(1) error. Products are
    made exact with TwoProd and accumulated with TwoSum compensation
    (one fori_loop over the contraction axis); the final I - hi
    subtraction is exact by Sterbenz (A@M ~ I), leaving |error| ~ |lo|
    rounding ~ 1e-13.
    """
    n = A32.shape[0]
    zeros = jnp.zeros_like(A32)

    def body(kk, carry):
        hi, lo = carry
        p, e = two_prod(lax.dynamic_slice_in_dim(A32, kk, 1, 1),
                        lax.dynamic_slice_in_dim(M32, kk, 1, 0))
        s, e2 = two_sum(hi, p)
        return s, lo + (e + e2)

    hi, lo = lax.fori_loop(0, n, body, (zeros, zeros))
    eye = jnp.eye(n, dtype=jnp.float32)
    return (eye - hi) - lo


def newton_schulz_refine(minv, A32, tol=3e-4, proxy_tol=1e-3,
                         max_sweeps: int = 4):
    """Quadratically refine an approximate f32 inverse of A32 WHEN NEEDED.

    Newton-Schulz iteration M <- M + M @ R with the residual R = I - A M
    measured in pair precision (residual_eye_pair): error 0.1 -> 0.01 ->
    1e-4 -> ... down to the ~1e-13 residual floor.

    The pair residual is O(n^3) compensated VPU work (~0.9 ms at
    n=80/B=64 on TPU) — too expensive to spend on every factor — so the
    loop is entered through a FREE condition proxy: for an equilibrated
    A (entries ~O(1)), the f32 inversion error max|R| ~ eps32 * cond(A)
    ~ eps32 * max|A^-1| (calibrated within ~3x on both the benchmark CRN
    and the saturated getting-started CRN). Factors whose proxy is below
    ``proxy_tol`` skip everything; bad ones compute the true residual
    inside the loop and sweep until max|R| <= tol. Under vmap the
    while_loop runs zero iterations when NO lane trips the proxy, so the
    common batched-sweep path pays only the max|minv| reduction.

    ``tol`` = 3e-4 caps the Newton linear-solve relative error at a
    level where the integrator's convergence-rate tests are unimpeded
    (rate ~ tol << 1); per-solve iterative refinement (newton_solve)
    takes accuracy the rest of the way.
    """
    eps32 = jnp.asarray(1.2e-7, jnp.float32)
    need = eps32 * jnp.max(jnp.abs(minv)) > proxy_tol

    def rnorm(R):
        return jnp.max(jnp.abs(R))

    def cond(carry):
        _, rn, it = carry
        return (rn > tol) & (it < max_sweeps)

    def body(carry):
        minv, _, it = carry
        R = residual_eye_pair(A32, minv)
        rn = rnorm(R)
        minv = jnp.where(
            rn > tol,
            minv + jnp.dot(minv, R, precision=lax.Precision.HIGHEST),
            minv)
        return minv, rn, it + 1

    rn0 = jnp.where(need, jnp.asarray(jnp.inf, jnp.float32),
                    jnp.asarray(0.0, jnp.float32))
    minv, rn, _ = lax.while_loop(cond, body,
                                 (minv, rn0, jnp.asarray(0, jnp.int32)))
    return minv, rn
