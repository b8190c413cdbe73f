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

_SPLITTER = jnp.float32(4097.0)   # 2^12 + 1 (Veltkamp split of 24-bit f32)


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
