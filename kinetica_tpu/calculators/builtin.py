"""Built-in kinetic calculators: Dummy, precalculated Arrhenius, Lindemann.

Capability parity with /root/reference/src/solving/calculator.jl:72-321,
vectorised over reactions as jnp arrays and traceable in conditions so the
continuous variable-rate mode can embed k(T(t), P(t)) directly in the ODE
right-hand side.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..utils.time_units import tconvert
from .base import KineticCalculator


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
        expo = -self.Ea / (constants.R * T[..., None] if T.ndim else constants.R * T)
        k = self.A * jnp.exp(expo) * constants.N_A * self.t_mult
        return self._apply_k_max(k, self.k_max)


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
        Tb = T[..., None] if T.ndim else T
        Pb = P[..., None] if P.ndim else P
        boltz = jnp.exp(-self.Ea / (constants.R * Tb))
        k0 = self.A_0 * boltz
        k_inf = self.A_inf * boltz
        M = Pb / (constants.R * Tb) / 1000.0  # mol m^-3 -> mol dm^-3
        pr = k0 * M / k_inf
        k = k_inf * pr / (1.0 + pr) * constants.N_A * self.t_mult
        return self._apply_k_max(k, self.k_max)
