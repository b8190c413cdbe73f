"""Built-in kinetic calculators: Dummy, precalculated Arrhenius, Lindemann.

Capability parity with /root/reference/src/solving/calculator.jl:72-321,
vectorised over reactions as jnp arrays and traceable in conditions so the
continuous variable-rate mode can embed k(T(t), P(t)) directly in the ODE
right-hand side.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..utils.time_units import tconvert
from .base import KineticCalculator

# log-space stand-in for ln(0) prefactors: far below pair_exp's -87
# underflow-to-zero threshold, but finite so pair arithmetic stays NaN-free
_LN_ZERO = -1.0e4


def _f32_pair_const(x):
    """Host f64 array -> (hi, lo) f32 pair jnp constants.

    Built eagerly (ensure_compile_time_eval) so values cached across
    traces are concrete arrays, never trace-scoped tracers."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    with jax.ensure_compile_time_eval():
        return jnp.asarray(hi), jnp.asarray(lo)


def _pair_split_time_scalar(s):
    """Split a traced f64 scalar/array into an f32 pair (f32 passthrough)."""
    from ..ops.dd import pair_from_f64
    if s.dtype == jnp.float64:
        return pair_from_f64(s)
    s = s.astype(jnp.float32)
    return s, jnp.zeros_like(s)


class DummyKineticCalculator(KineticCalculator):
    """Returns fixed rates; debugging only (reference calculator.jl:72-158).

    Accepts conditions T (K) and V (dm^3), ignoring their values.
    """
    allows_continuous = True

    def __init__(self, rates, k_max=None, t_unit: str = "s"):
        self.rates = jnp.asarray(rates)
        self.k_max = k_max
        self.t_unit = t_unit
        self.t_mult = tconvert(t_unit, "s")

    def setup_network(self, sd, rd) -> None:
        if len(self.rates) != rd.nr:
            raise ValueError(
                f"Number of rates ({len(self.rates)}) does not match number "
                f"of reactions in RxData ({rd.nr})")

    def splice(self, rids) -> None:
        keep = np.setdiff1d(np.arange(self.rates.shape[0]), np.asarray(list(rids), dtype=int))
        self.rates = self.rates[keep]

    def has_conditions(self, symbols) -> bool:
        return all(s in ("T", "V") for s in symbols)

    def __call__(self, T=None, V=None, **_):
        k = self.rates * self.t_mult
        return self._apply_k_max(k, self.k_max) if self.k_max is not None else k


class PrecalculatedArrheniusCalculator(KineticCalculator):
    """k = A exp(-Ea / R T) * N_A * t_mult with optional harmonic k_max cap.

    Parity with reference calculator.jl:164-238 including the N_A factor and
    unit conventions (Ea in J/mol, A in mol dm^-3 s^-1 for bimolecular).
    Conditions: T (K). ``T`` may be a traced scalar or an array (batched /
    time-dependent evaluation); the result broadcasts to
    ``T.shape + (nr,)``.
    """
    allows_continuous = True

    def __init__(self, Ea, A, k_max=None, t_unit: str = "s"):
        self.Ea = jnp.asarray(Ea, dtype=jnp.result_type(float))
        self.A = jnp.asarray(A, dtype=jnp.result_type(float))
        self.k_max = k_max
        self.t_unit = t_unit
        self.t_mult = tconvert(t_unit, "s")

    def setup_network(self, sd, rd) -> None:
        if len(self.Ea) != rd.nr or len(self.A) != rd.nr:
            raise ValueError(
                f"Number of parameters (Ea: {len(self.Ea)}, A: {len(self.A)}) "
                f"does not match number of reactions in RxData ({rd.nr})")

    def splice(self, rids) -> None:
        keep = np.setdiff1d(np.arange(self.Ea.shape[0]), np.asarray(list(rids), dtype=int))
        self.Ea = self.Ea[keep]
        self.A = self.A[keep]

    def has_conditions(self, symbols) -> bool:
        return all(s in ("T",) for s in symbols)

    def __call__(self, T, **_):
        T = jnp.asarray(T)
        if jax.default_backend() != "cpu":
            # XLA's f64-on-TPU is a double-f32 emulation whose exp
            # underflows the F32 range: A*exp(-Ea/RT) with A*N_A ~ 1e40
            # and exponent < -87 evaluates to 0 instead of O(10), and
            # exponents in (-87, -71] lose their low word (~2e-4 relative
            # noise) — discontinuous, noisy k(T(t)) that wrecked ramping
            # solves (+45% step attempts). Route through the log-space
            # pair pipeline (rates_pair), which never materialises an
            # out-of-range intermediate; ~5e-13 relative.
            from ..ops.dd import pair_to_f64
            kh, kl = self.rates_pair(T)
            dt = jnp.result_type(float)
            if dt == jnp.float64:
                return pair_to_f64(kh, kl)
            return kh
        expo = -self.Ea / (constants.R * T[..., None] if T.ndim else constants.R * T)
        k = self.A * jnp.exp(expo) * constants.N_A * self.t_mult
        return self._apply_k_max(k, self.k_max)

    def _pair_consts(self):
        """Cached f32-pair constants of the log-space form
        ln k_raw = ln(A N_A t_mult) - (Ea/R) / T."""
        n = int(self.Ea.shape[0])
        cache = getattr(self, "_pc_cache", None)
        if cache is not None and cache[0] == n:
            return cache[1]
        A = np.asarray(self.A, np.float64)
        Ea = np.asarray(self.Ea, np.float64)
        with np.errstate(divide="ignore"):
            ln_total = np.log(A) + np.log(constants.N_A) + np.log(self.t_mult)
        ln_total = np.where(A > 0.0, ln_total, _LN_ZERO)
        consts = (*_f32_pair_const(ln_total),
                  *_f32_pair_const(Ea / constants.R))
        self._pc_cache = (n, consts)
        return consts

    def rates_pair(self, T, **_):
        """Rate constants as a renormalised f32 (hi, lo) pair, computed
        range-safely in log space (see __call__); ~5e-13 relative.

        ``T`` scalar -> (nr,) pairs; ``T`` of shape (...,) -> (..., nr).
        """
        from ..ops.dd import pair_add, pair_exp, pair_mul, pair_recip
        lnA_h, lnA_l, c_h, c_l = self._pair_consts()
        T = jnp.asarray(T)
        s = 1.0 / (T[..., None] if T.ndim else T)
        sh, sl = _pair_split_time_scalar(s)
        ph, pl = pair_mul(c_h, c_l, sh, sl)
        eh, el = pair_add(lnA_h, lnA_l, -ph, -pl)
        kh, kl = pair_exp(eh, el)
        if self.k_max is not None:
            # harmonic cap 1/(1/k_max + 1/k) in pair arithmetic. k = 0
            # (underflowed-dead rates) must stay 0: pair_recip(0) is a
            # 0/0 NaN, so guard with a sacrificial 1.0 and mask after.
            dead = kh <= 0.0
            ih, il = pair_recip(jnp.where(dead, 1.0, kh),
                                jnp.where(dead, 0.0, kl))
            km_h, km_l = _f32_pair_const(1.0 / np.float64(self.k_max))
            dh, dl = pair_add(ih, il, km_h, km_l)
            ch2, cl2 = pair_recip(dh, dl)
            zero = jnp.zeros_like(kh)
            kh = jnp.where(dead, zero, ch2)
            kl = jnp.where(dead, zero, cl2)
        return kh, kl


class PrecalculatedLindemannCalculator(KineticCalculator):
    """Pressure-dependent unimolecular falloff (Lindemann-Hinshelwood).

    The reference declares this calculator but leaves the rate formula
    unimplemented (calculator.jl:307-314 throws). Here the standard
    Lindemann form is implemented:

        k0    = A_0  exp(-Ea / R T)          (low-pressure limit)
        k_inf = A_inf exp(-Ea / R T)         (high-pressure limit)
        [M]   = P / (R T)  (ideal gas, mol dm^-3)
        k     = k_inf * Pr / (1 + Pr),  Pr = k0 [M] / k_inf

    Conditions: T (K), P (Pa). Set ``strict_reference_parity=True`` to get
    the reference's NotImplementedError behaviour instead.
    """
    allows_continuous = True

    def __init__(self, Ea, A_0, A_inf, k_max=None, t_unit: str = "s",
                 strict_reference_parity: bool = False):
        self.Ea = jnp.asarray(Ea, dtype=jnp.result_type(float))
        self.A_0 = jnp.asarray(A_0, dtype=jnp.result_type(float))
        self.A_inf = jnp.asarray(A_inf, dtype=jnp.result_type(float))
        self.k_max = k_max
        self.t_unit = t_unit
        self.t_mult = tconvert(t_unit, "s")
        self.strict_reference_parity = strict_reference_parity

    def setup_network(self, sd, rd) -> None:
        for name, p in (("Ea", self.Ea), ("A_0", self.A_0), ("A_inf", self.A_inf)):
            if len(p) != rd.nr:
                raise ValueError(
                    f"Number of parameters ({name}: {len(p)}) does not match "
                    f"number of reactions in RxData ({rd.nr})")

    def splice(self, rids) -> None:
        keep = np.setdiff1d(np.arange(self.Ea.shape[0]), np.asarray(list(rids), dtype=int))
        self.Ea = self.Ea[keep]
        self.A_0 = self.A_0[keep]
        self.A_inf = self.A_inf[keep]

    def has_conditions(self, symbols) -> bool:
        return all(s in ("T", "P") for s in symbols)

    def __call__(self, T, P, **_):
        if self.strict_reference_parity:
            raise NotImplementedError("Lindemann rate constants not implemented yet.")
        T = jnp.asarray(T)
        P = jnp.asarray(P)
        if jax.default_backend() != "cpu":
            # same TPU f64-emulation range hazard as the Arrhenius
            # calculator (see its __call__): route through log space
            from ..ops.dd import pair_to_f64
            kh, kl = self.rates_pair(T, P)
            dt = jnp.result_type(float)
            return pair_to_f64(kh, kl) if dt == jnp.float64 else kh
        Tb = T[..., None] if T.ndim else T
        Pb = P[..., None] if P.ndim else P
        boltz = jnp.exp(-self.Ea / (constants.R * Tb))
        k0 = self.A_0 * boltz
        k_inf = self.A_inf * boltz
        M = Pb / (constants.R * Tb) / 1000.0  # mol m^-3 -> mol dm^-3
        pr = k0 * M / k_inf
        k = k_inf * pr / (1.0 + pr) * constants.N_A * self.t_mult
        return self._apply_k_max(k, self.k_max)

    def _pair_consts(self):
        """(ln(A_inf N_A t_mult), ln(A_0 N_A t_mult), Ea/R, A_0/A_inf)
        as f32 pair constants.

        The Boltzmann factor cancels inside Pr = k0 [M] / k_inf, so the
        falloff blend needs no exp at all. rates_pair anchors the single
        exponential on whichever limit dominates (k_inf for Pr > 1, k0
        for Pr <= 1) so the remaining linear-space factor always lies in
        [0.5, 1] — full pair accuracy with no dynamic-range hazard."""
        n = int(self.Ea.shape[0])
        cache = getattr(self, "_pc_cache", None)
        if cache is not None and cache[0] == n:
            return cache[1]
        A_0 = np.asarray(self.A_0, np.float64)
        A_inf = np.asarray(self.A_inf, np.float64)
        Ea = np.asarray(self.Ea, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ln_na = np.log(constants.N_A) + np.log(self.t_mult)
            ln_inf = np.log(A_inf) + ln_na
            ln_0 = np.log(A_0) + ln_na
            ratio = np.where(A_inf > 0.0, A_0 / A_inf, 0.0)
        ln_inf = np.where(A_inf > 0.0, ln_inf, _LN_ZERO)
        ln_0 = np.where(A_0 > 0.0, ln_0, _LN_ZERO)
        consts = (*_f32_pair_const(ln_inf), *_f32_pair_const(ln_0),
                  *_f32_pair_const(Ea / constants.R),
                  *_f32_pair_const(ratio))
        self._pc_cache = (n, consts)
        return consts

    def rates_pair(self, T, P, **_):
        """Lindemann rates as f32 pairs via the range-safe pipeline."""
        from ..ops.dd import pair_add, pair_exp, pair_mul, pair_recip
        (li_h, li_l, l0_h, l0_l, c_h, c_l,
         q_h, q_l) = self._pair_consts()
        T = jnp.asarray(T)
        P = jnp.asarray(P)
        Tb = T[..., None] if T.ndim else T
        Pb = P[..., None] if P.ndim else P
        s = 1.0 / Tb
        sh, sl = _pair_split_time_scalar(s)
        ph, pl = pair_mul(c_h, c_l, sh, sl)        # (Ea/R)/T
        # Pr = (A_0/A_inf) * [M], [M] = P/(R T)/1000 — scalar-per-lane f64
        M = Pb / (constants.R * Tb) / 1000.0
        mh, ml = _pair_split_time_scalar(M)
        prh, prl = pair_mul(q_h, q_l, mh, ml)
        # k = k_inf Pr/(1+Pr) = k0 [M] / (1+Pr): anchor the exponent on
        # the dominant limit so the linear factor stays in [0.5, 1]
        lnM_h, lnM_l = _pair_split_time_scalar(jnp.log(M))
        big = prh > 1.0
        e0h, e0l = pair_add(l0_h, l0_l, lnM_h, lnM_l)   # + ln [M]
        base_h = jnp.where(big, li_h, e0h)
        base_l = jnp.where(big, li_l, e0l)
        eh, el = pair_add(base_h, base_l, -ph, -pl)
        kh, kl = pair_exp(eh, el)
        dh, dl = pair_add(prh, prl, jnp.float32(1.0), jnp.float32(0.0))
        ih, il = pair_recip(dh, dl)                    # 1/(1+Pr)
        # Pr/(1+Pr) = 1 - 1/(1+Pr) (pair-exact complement)
        gh, gl = pair_add(jnp.float32(1.0), jnp.float32(0.0), -ih, -il)
        bh = jnp.where(big, gh, ih)
        bl = jnp.where(big, gl, il)
        kh, kl = pair_mul(kh, kl, bh, bl)
        if self.k_max is not None:
            dead = kh <= 0.0
            ih, il = pair_recip(jnp.where(dead, 1.0, kh),
                                jnp.where(dead, 0.0, kl))
            km_h, km_l = _f32_pair_const(1.0 / np.float64(self.k_max))
            ch2, cl2 = pair_add(ih, il, km_h, km_l)
            fh, fl = pair_recip(ch2, cl2)
            zero = jnp.zeros_like(kh)
            kh = jnp.where(dead, zero, fh)
            kl = jnp.where(dead, zero, fl)
        return kh, kl
