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

# ``guard``: error-free transformations are algebraically trivial —
# (a+b)-a "is" b — and XLA's simplifier exploits exactly that when the
# surrounding computation gives it the pattern (measured: the pair
# exponent pipeline silently degraded from ~5e-13 to f32 half-ulp under
# jit; the isolated functions survive, larger fusions do not). An
# optimization_barrier on the rounded intermediate makes the identity
# unprovable. Pallas kernel bodies must pass guard=False: Mosaic has no
# optimization_barrier lowering, and (verified by the on-hardware kernel
# accuracy tests) does not perform the offending simplification.


def _opaque(x, guard):
    return lax.optimization_barrier(x) if guard else x


def two_sum(a, b, guard: bool = True):
    """s, e with s = fl(a+b) and a+b = s+e exactly (Knuth)."""
    s = _opaque(a + b, guard)
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def fast_two_sum(a, b, guard: bool = True):
    """TwoSum assuming |a| >= |b| (Dekker) — 3 ops instead of 6."""
    s = _opaque(a + b, guard)
    e = b - (s - a)
    return s, e


def veltkamp(a, guard: bool = True):
    """a = hi + lo with hi carrying the top 12 mantissa bits (exact)."""
    c = _opaque(_SPLITTER * a, guard)
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b, guard: bool = True):
    """p, e with p = fl(a*b) and a*b = p+e exactly (Dekker, FMA-free)."""
    p = _opaque(a * b, guard)
    ah, al = veltkamp(a, guard)
    bh, bl = veltkamp(b, guard)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def pair_from_f64(x):
    """f64 -> (hi, lo) f32 pair (both conversions exact)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def pair_to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def pair_mul(xh, xl, yh, yl, guard: bool = True):
    """Renormalised pair product: (xh+xl)*(yh+yl) to ~2^-45 relative."""
    p, e = two_prod(xh, yh, guard)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e, guard)


def pair_add(xh, xl, yh, yl, guard: bool = True):
    """Renormalised pair sum: (xh+xl)+(yh+yl) to ~2^-45 relative
    (Dekker's "sloppy" add — sufficient here: consumers tolerate
    relative error well above pair width)."""
    s, e = two_sum(xh, yh, guard)
    e = e + (xl + yl)
    return fast_two_sum(s, e, guard)


def pair_neg(xh, xl):
    return -xh, -xl


def pair_recip(xh, xl):
    """1 / (xh+xl) to ~2^-45 relative (one Newton correction on 1/xh)."""
    q = 1.0 / xh
    p, e = two_prod(xh, q)
    r = ((1.0 - p) - e) - xl * q          # 1 - x*q, exact-dominant terms
    return fast_two_sum(q, q * r)


# --- pair-precision exp ---------------------------------------------------
# Range-safe exp for TPU-resident rate evaluation. XLA's f64-on-TPU is a
# double-f32 emulation: its exp UNDERFLOWS THE F32 RANGE for arguments
# below ~-87 (a rate constant k = A*exp(-Ea/RT) with A*N_A ~ 1e40 and
# exponent -88 silently evaluates to 0 instead of ~40), and for results
# below ~2^-102 the pair's low word flushes, leaving only f32-level
# accuracy (measured 2.4e-4 relative on the (-87, -70] exponent band).
# Both effects wreck a ramping CRN solve: rate constants jump
# discontinuously in t and carry noise far above the BDF error test's
# tolerance band (measured +45% step attempts on the production sweep).
# Callers evaluate ln k in pair precision (no range issue: |ln k| is
# O(100)) and exponentiate with pair_exp, which never materialises an
# out-of-range intermediate.
#
# Algorithm: reduction e = n*ln2 + r with |r| <= ln2/2 (ln2 as an f32
# pair, n via two_prod so the reduction is error-free), degree-5 Taylor
# in pair arithmetic + degree-12 f32 tail, exact 2^n scaling by exponent
# bit manipulation. Relative accuracy ~5e-13 (tested against f64 exp),
# smooth in the argument at that level; |e| <= 88 covers k ratios of
# ~1e76 — far beyond any physical rate span once the caller's k_max cap
# and low-k cutoffs apply.
_EXP_LN2_HI = 0.6931471824645996
_EXP_LN2_LO = -1.9046542121259336e-09
_EXP_INV_LN2 = 1.4426950408889634
_EXP_C = (  # (hi, lo) pairs of 1/k! for k = 5, 4, 3, 2
    (0.008333333767950535, -4.34617203337595e-10),
    (0.0416666679084301, -1.2417634698280722e-09),
    (0.1666666716337204, -4.967053879312289e-09),
    (0.5, 0.0),
)
_EXP_TAIL = (  # 1/k! for k = 12 .. 6 (f32 Horner)
    2.0876755879584152e-09, 2.5052107943679403e-08, 2.755731998149713e-07,
    2.7557318844628753e-06, 2.4801587642286904e-05, 0.00019841270113829523,
    0.0013888889225199819,
)
# Hi clamp at 80, NOT the f32-max-bound 88: downstream pair arithmetic
# (harmonic k_max caps, falloff blends) runs these values through
# two_prod, whose Veltkamp split computes 4097*x and overflows f32 for
# x > ~8.3e34. exp(80) = 5.5e34 keeps every split finite; the induced
# error on a harmonically capped rate is ~k_max/5.5e34 (utterly
# negligible), and uncapped rates above 5.5e34 are unphysical.
_EXP_MAX = 80.0
_EXP_MIN = -87.0   # exp(-87) = 1.6e-38 ~ f32 min normal; below -> 0


def pair_exp(eh, el):
    """exp(eh + el) as a renormalised f32 pair, ~5e-13 relative.

    Inputs are f32 (pair or plain f32 with el = 0). Arguments above
    +88 clamp (result 1.65e38 — callers capping k downstream see "huge");
    below -87 the result is exactly (0, 0) (true value < 1.7e-38, below
    any physically meaningful rate; avoids subnormal-flush noise).
    """
    e_approx = eh + el
    clamped = jnp.clip(e_approx, jnp.float32(_EXP_MIN), jnp.float32(_EXP_MAX))
    shift = clamped - e_approx            # 0 in range; pushes eh in range
    eh = eh + shift                       # keeps pair consistent when clamped
    n = jnp.round((eh + el) * jnp.float32(_EXP_INV_LN2))
    # r = e - n*ln2, error-free: two_prod makes n*LN2_HI exact, two_sum
    # keeps the large cancellation exact, and the residual terms are all
    # <= ~5e-6 so their f32 accumulation errs at ~1e-13 absolute.
    t1, e1 = two_prod(n, jnp.float32(_EXP_LN2_HI))
    s1, s2 = two_sum(eh, -t1)
    lo = ((s2 + el) - e1) - n * jnp.float32(_EXP_LN2_LO)
    rh, rl = fast_two_sum(s1, lo)

    # degree-12 f32 tail: g = sum_{k=6..12} r^(k-6)/k!, tail = r^6 * g
    g = jnp.float32(_EXP_TAIL[0])
    for c in _EXP_TAIL[1:]:
        g = g * rh + jnp.float32(c)
    p2h, p2l = pair_mul(rh, rl, rh, rl)   # r^2
    tail = p2h * p2h * p2h * g            # r^6 g: <= 2.4e-6, f32 suffices

    # pair Horner for 1 + r + r^2/2 + ... + r^5/120
    qh = jnp.full_like(rh, jnp.float32(_EXP_C[0][0]))
    ql = jnp.full_like(rh, jnp.float32(_EXP_C[0][1]))
    for ch, cl in _EXP_C[1:]:
        qh, ql = pair_mul(qh, ql, rh, rl)
        qh, ql = pair_add(qh, ql, jnp.float32(ch), jnp.float32(cl))
    for _ in range(2):                    # ... * r + 1, twice
        qh, ql = pair_mul(qh, ql, rh, rl)
        qh, ql = pair_add(qh, ql, jnp.float32(1.0), jnp.float32(0.0))
    qh, ql = pair_add(qh, ql, tail, jnp.zeros_like(tail))

    # exact 2^n scaling via the f32 exponent field; n in [-126, 127]
    two_n = lax.bitcast_convert_type(
        (n.astype(jnp.int32) + 127) << 23, jnp.float32)
    kh = qh * two_n
    kl = ql * two_n
    dead = e_approx < jnp.float32(_EXP_MIN)
    zero = jnp.zeros_like(kh)
    return jnp.where(dead, zero, kh), jnp.where(dead, zero, kl)


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


def residual_eye_f64dot(A32, M32):
    """R = I - A @ M via the emulated-f64 MXU dot (accelerator path).

    f32 -> f64 casts are exact, so the only error is the emulated-f64
    accumulation: ~eps64 * n * max|M| ~ 1e-10 for the refine loop's
    operating range — three decades tighter than the pair form, at MXU
    (not VPU) cost. Unlike the RHS contraction (ops/pallas_matmul.py),
    this op is small enough ((B, n, n) with n ~ 10^2) that the emulation's
    splitting intermediates stay modest, and measured in-situ it beats
    the compensated-VPU form ~...x per eval (scripts/profile_trace.py).
    """
    n = A32.shape[-1]
    R = (jnp.eye(n, dtype=jnp.float64)
         - jnp.matmul(A32.astype(jnp.float64), M32.astype(jnp.float64),
                      precision=lax.Precision.HIGHEST))
    return R.astype(jnp.float32)


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

    # Residual implementation (env-selectable for ablation,
    # KINETICA_NS_RESIDUAL = auto | pair | f64dot): the compensated-VPU
    # pair form costs ~16 full-matrix VPU ops per contraction column
    # (~28% of the production step cost in-situ, scripts/profile_trace
    # .py), while the emulated-f64 MXU dot does the same job at matmul
    # cost with ~1e-10 accuracy — "auto" picks it on accelerators.
    # CPU keeps the pair form (native f64 dots there are cheap, but the
    # pair form is the bit-reproducible reference the tests pin).
    import os as _os

    import jax as _jax
    choice = _os.environ.get("KINETICA_NS_RESIDUAL", "auto")
    if choice == "auto":
        choice = "f64dot" if _jax.default_backend() != "cpu" else "pair"
    residual_fn = (residual_eye_f64dot if choice == "f64dot"
                   else residual_eye_pair)

    def rnorm(R):
        return jnp.max(jnp.abs(R))

    # Phase 1 (accelerators): CHEAP f32/HIGHEST residual sweeps. The plain
    # MXU residual measures R only down to its accumulation floor
    # ~eps32 * sqrt(n) * max|M| (partial sums of A @ M reach ~max|M| before
    # cancelling to I), but above that floor its direction is good, and an
    # NS sweep with a noisy residual still contracts the TRUE error to
    # ~max(rn^2, floor). Sweeping here first means the expensive accurate
    # residual (phase 2) starts from ~floor instead of ~eps32*cond, so it
    # usually needs ONE sweep + verify instead of 3-4 — the accurate
    # residual dominates the production refactor path (~25-30% of step
    # cost at nc=24/B=64, scripts/profile_trace.py), the f32 one is ~free.
    if choice == "f64dot":
        n = A32.shape[-1]

        # Phase-1 schedule (KINETICA_NS_PHASE1 = auto | unroll:N |
        # adaptive): measured r5 (v5e, in-process A/B) — unroll:2
        # under-refines (nc=60 steps 892 -> 936, flagship 1.739 -> 1.798
        # ms/step) and unroll:3 is EXACTLY equal to adaptive in both
        # steps and ms/step (161.9 ms/profile both), i.e. unlike the
        # per-solve refinement chain (ops/linalg.newton_solve) this
        # loop's overhead is not measurable — so "auto" keeps the
        # adaptive while_loop; the unrolled form stays selectable.
        p1 = _os.environ.get("KINETICA_NS_PHASE1", "auto")
        if p1 == "auto":
            p1 = "adaptive"
        if p1.startswith("unroll"):
            n_p1 = int(p1.split(":")[1]) if ":" in p1 else 2
            rn_cheap = jnp.asarray(jnp.inf, jnp.float32)
            for _ in range(n_p1):
                R = jnp.eye(n, dtype=jnp.float32) - jnp.matmul(
                    A32, minv, precision=lax.Precision.HIGHEST)
                rn_cheap = rnorm(R)
                do = need & (rn_cheap > tol)
                minv = jnp.where(
                    do,
                    minv + jnp.dot(minv, R, precision=lax.Precision.HIGHEST),
                    minv)
        else:
            def cheap_cond(carry):
                minv, rn, it = carry
                del minv, rn
                return need & (it < 3)

            def cheap_body(carry):
                minv, _, it = carry
                R = jnp.eye(n, dtype=jnp.float32) - jnp.matmul(
                    A32, minv, precision=lax.Precision.HIGHEST)
                rn = rnorm(R)
                # sweep while the (noise-floored) measurement still
                # exceeds tol; at the floor the noisy direction neither
                # helps nor hurts (true rn ~ max(rn^2, floor)), so cap
                # at 3 sweeps
                do = rn > tol
                minv = jnp.where(
                    do,
                    minv + jnp.dot(minv, R, precision=lax.Precision.HIGHEST),
                    minv)
                return (minv, rn,
                        jnp.where(do, it + 1, jnp.asarray(3, jnp.int32)))

            minv, rn_cheap, _ = lax.while_loop(
                cheap_cond, cheap_body,
                (minv, jnp.asarray(jnp.inf, jnp.float32),
                 jnp.asarray(0, jnp.int32)))

        if _os.environ.get("KINETICA_NS_PHASE2", "gated") == "gated":
            # Phase-2 gate: the accurate residual dominates the factor
            # path (~14 ms/fire at n=181/B=64, ~30% of the whole step;
            # ~25-30% at n=73 — profile_trace r4). The f32 measurement's
            # floor is ~eps32*sqrt(n)*max|M|, so certify at
            # tol_eff = clamp(4*floor, tol, 0.03) instead: factors whose
            # cheap-phase residual measures below that are accepted
            # without an accurate eval — a factor left at ~floor costs at
            # most a couple of extra adaptive per-solve refinement sweeps
            # downstream (matvecs), never correctness. The 0.03 cap keeps
            # genuinely bad factors (saturated lanes, cond ~1e7, whose
            # floor estimate explodes past any meaningful measurement) on
            # the accurate path. Measured (accuracy-gated bench): nc=60
            # 184.4 -> 159.9 ms/profile; KINETICA_NS_PHASE2=always
            # restores the unconditional accurate phase.
            floor_est = (eps32 * jnp.sqrt(jnp.asarray(float(n), jnp.float32))
                         * jnp.max(jnp.abs(minv)))
            cap = float(_os.environ.get("KINETICA_NS_CAP", "0.03"))
            tol_eff = jnp.clip(4.0 * floor_est, tol, cap)
            need = need & (rn_cheap > tol_eff)

    # Phase 2: accurate residual, with a PREDICTED-convergence exit: the
    # body always sweeps when rn > tol, and the loop stops once the
    # just-measured rn satisfies rn^2 <= 0.3 tol — the sweep applied with
    # that residual lands quadratically below tol, so re-measuring only
    # to confirm it would double the accurate-residual count (the
    # dominant refactor-path cost; profile_trace). A factor left slightly
    # above tol in the worst case costs one extra adaptive refinement
    # sweep per Newton solve downstream, never correctness (Newton
    # convergence is judged on true f64 residuals).
    exit_rn = jnp.asarray((0.3 * tol) ** 0.5, jnp.float32)

    def cond(carry):
        _, rn, it = carry
        return (rn > jnp.maximum(exit_rn, jnp.asarray(tol, jnp.float32))) \
            & (it < max_sweeps)

    def body(carry):
        minv, _, it = carry
        R = residual_fn(A32, minv)
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
    # report the predicted post-sweep residual when the exit was taken
    # on prediction (rn in (tol, exit_rn]): the sweep above still applied
    rn = jnp.where(rn > tol, jnp.minimum(rn, rn * rn), rn)
    return minv, rn
