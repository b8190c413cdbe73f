"""Transition-state-theory rate calculation — vectorised, traceable.

Mathematics is identical to the reference's ASE-NEB calculator thermo core
(/root/reference/src/ase/calculator.jl:567-778):

* :func:`entropy` — translational + rotational (by geometry class:
  0 monatomic / 1 linear / 2 nonlinear) + electronic + harmonic
  vibrational + pressure-correction terms (calculator.jl:606-651),
* :func:`enthalpy` — potential energy + ZPE + translational/rotational/
  vibrational heat capacities + kB*T (calculator.jl:658-706),
* Eyring equation k = (k_b T / h) exp(dS/R) exp(-dH/RT) with optional
  harmonic k_max cap (calculator.jl:758-772).

Redesigned TPU-first: all per-species/per-TS quantities live in padded
arrays (vibrational modes padded with a mask), so ``k(T, P)`` is one fused
vectorised expression over every reaction — traceable in T and P. This
makes TST rates usable in *continuous* variable-rate solves, which the
reference's Python-bridged implementation cannot do
(``allows_continuous = false``, calculator.jl:778); discrete mode remains
the default for parity.

Units follow ASE conventions: energies in eV, masses in amu, inertias in
amu Å^2; dS/dH are converted to J/mol/K and J/mol before the Eyring step,
exactly as the reference (calculator.jl:738-741).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..utils.time_units import tconvert
from .base import KineticCalculator

GEOM_MONATOMIC, GEOM_LINEAR, GEOM_NONLINEAR = 0, 1, 2


def entropy(mass, inertias, geometry, symmetry, mult, vib_energies, vib_mask,
            T, P):
    """Ideal-gas entropy in eV/K (vectorised over leading axes).

    Args (broadcastable): mass (amu), inertias (..., 3) (amu Å^2), geometry
    class int, symmetry number, multiplicity, vib_energies (..., V) in eV
    with boolean vib_mask. T (K) and P (Pa) may be traced scalars.
    """
    mass = jnp.asarray(mass)
    T = jnp.asarray(T)
    # translational
    mass_kg = mass * constants.amu
    S_t = (2.0 * jnp.pi * mass_kg * constants.k * T / constants.hplanck ** 2) ** 1.5
    S_t = S_t * constants.k * T / constants.ref_P
    S_t = constants.kB * (jnp.log(S_t) + 2.5)

    # rotational
    inertias_conv = jnp.asarray(inertias) * constants.amu / (1e10) ** 2
    inertia_max = jnp.max(inertias_conv, axis=-1)
    S_r_lin = (8.0 * jnp.pi ** 2 * inertia_max * constants.k * T
               / symmetry / constants.hplanck ** 2)
    S_r_lin = constants.kB * (jnp.log(jnp.maximum(S_r_lin, 1e-300)) + 1.0)
    prod_inertia = jnp.prod(jnp.maximum(inertias_conv, 1e-300), axis=-1)
    S_r_nonlin = jnp.sqrt(jnp.pi * prod_inertia) / symmetry
    S_r_nonlin = S_r_nonlin * (8.0 * jnp.pi ** 2 * constants.k * T
                               / constants.hplanck ** 2) ** 1.5
    S_r_nonlin = constants.kB * (jnp.log(jnp.maximum(S_r_nonlin, 1e-300)) + 1.5)
    geometry = jnp.asarray(geometry)
    S_r = jnp.where(geometry == GEOM_LINEAR, S_r_lin,
                    jnp.where(geometry == GEOM_NONLINEAR, S_r_nonlin, 0.0))

    # electronic
    S_e = constants.kB * jnp.log(jnp.asarray(mult, dtype=S_t.dtype))

    # vibrational (harmonic), masked over padded modes
    kT = constants.kB * T
    x = jnp.asarray(vib_energies) / kT
    x = jnp.where(vib_mask, jnp.maximum(x, 1e-12), 1.0)
    terms = x / jnp.expm1(x) - jnp.log1p(-jnp.exp(-x))
    S_v = constants.kB * jnp.sum(jnp.where(vib_mask, terms, 0.0), axis=-1)

    # pressure correction
    S_p = -constants.kB * jnp.log(jnp.asarray(P) / constants.ref_P)

    return S_t + S_r + S_e + S_v + S_p


def enthalpy(energy, vib_energies, vib_mask, geometry, T):
    """Ideal-gas enthalpy in eV (vectorised over leading axes)."""
    T = jnp.asarray(T)
    vib = jnp.asarray(vib_energies)
    zpe = 0.5 * jnp.sum(jnp.where(vib_mask, vib, 0.0), axis=-1)
    kT = constants.kB * T
    x = jnp.where(vib_mask, jnp.maximum(vib / kT, 1e-12), 1.0)
    Cv_vib = jnp.sum(jnp.where(vib_mask, vib / jnp.expm1(x), 0.0), axis=-1)
    geometry = jnp.asarray(geometry)
    Cv_rot = jnp.where(geometry == GEOM_LINEAR, constants.kB * T,
                       jnp.where(geometry == GEOM_NONLINEAR,
                                 1.5 * constants.kB * T, 0.0))
    return (jnp.asarray(energy) + zpe + 1.5 * constants.kB * T + Cv_rot
            + Cv_vib + constants.kB * T)


@dataclass
class ThermoTable:
    """Padded per-system thermochemistry inputs (species or TS ensemble)."""
    mass: np.ndarray            # (n,)
    inertias: np.ndarray        # (n, 3)
    geometry: np.ndarray        # (n,) int 0/1/2
    symmetry: np.ndarray        # (n,)
    mult: np.ndarray            # (n,)
    energy: np.ndarray          # (n,) potential energy, eV
    vib_energies: np.ndarray    # (n, Vmax) eV
    vib_mask: np.ndarray        # (n, Vmax) bool

    @classmethod
    def from_lists(cls, mass, inertias, geometry, symmetry, mult, energy,
                   vib_lists):
        n = len(mass)
        vmax = max([1] + [len(v) for v in vib_lists])
        vibs = np.zeros((n, vmax))
        mask = np.zeros((n, vmax), dtype=bool)
        for i, v in enumerate(vib_lists):
            vibs[i, : len(v)] = v
            mask[i, : len(v)] = True
        return cls(np.asarray(mass, dtype=np.float64),
                   np.asarray(inertias, dtype=np.float64).reshape(n, 3),
                   np.asarray(geometry, dtype=np.int32),
                   np.asarray(symmetry, dtype=np.float64),
                   np.asarray(mult, dtype=np.float64),
                   np.asarray(energy, dtype=np.float64),
                   vibs, mask)


class TSTCalculator(KineticCalculator):
    """Eyring TST rates from tabulated species + TS thermochemistry.

    ``species`` is a ThermoTable over all species; ``ts`` a ThermoTable over
    all reactions' transition states; ``id_reacs``/``stoic_reacs`` give each
    reaction's reactant IDs and stoichiometries (ragged lists, padded
    internally). Conditions: T (K), P (Pa); fully traceable — this
    calculator supports both discrete and continuous variable-rate solves.
    """
    allows_continuous = True

    def __init__(self, species: ThermoTable, ts: ThermoTable,
                 id_reacs, stoic_reacs, k_max=None, t_unit: str = "s"):
        self.species = species
        self.ts = ts
        nr = len(id_reacs)
        arity = max([1] + [len(r) for r in id_reacs])
        self.reac_ids = np.zeros((nr, arity), dtype=np.int32)
        self.reac_stoic = np.zeros((nr, arity), dtype=np.float64)
        for j, (ids, sts) in enumerate(zip(id_reacs, stoic_reacs)):
            self.reac_ids[j, : len(ids)] = ids
            self.reac_stoic[j, : len(sts)] = sts
        self.k_max = k_max
        self.t_unit = t_unit
        self.t_mult = tconvert(t_unit, "s")

    @property
    def nr(self) -> int:
        return self.reac_ids.shape[0]

    def setup_network(self, sd, rd) -> None:
        if rd.nr != self.nr:
            raise ValueError(
                f"TST tables cover {self.nr} reactions but RxData has {rd.nr}")

    def splice(self, rids) -> None:
        keep = np.setdiff1d(np.arange(self.nr), np.asarray(list(rids), dtype=int))
        self.reac_ids = self.reac_ids[keep]
        self.reac_stoic = self.reac_stoic[keep]
        ts = self.ts
        self.ts = ThermoTable(ts.mass[keep], ts.inertias[keep],
                              ts.geometry[keep], ts.symmetry[keep],
                              ts.mult[keep], ts.energy[keep],
                              ts.vib_energies[keep], ts.vib_mask[keep])

    def has_conditions(self, symbols) -> bool:
        return all(s in ("T", "P") for s in symbols)

    def calculate_entropy_enthalpy(self, T, P):
        """(dS, dH) over all reactions in J/mol/K and J/mol
        (calculator.jl:717-744)."""
        sp = self.species
        S_spec = entropy(sp.mass, sp.inertias, sp.geometry, sp.symmetry,
                         sp.mult, sp.vib_energies, sp.vib_mask, T, P)
        H_spec = enthalpy(sp.energy, sp.vib_energies, sp.vib_mask,
                          sp.geometry, T)
        # reactant sums via padded gathers (stoich 0 padding contributes 0)
        S_reacs = jnp.sum(self.reac_stoic * S_spec[self.reac_ids], axis=1)
        H_reacs = jnp.sum(self.reac_stoic * H_spec[self.reac_ids], axis=1)
        ts = self.ts
        S_ts = entropy(ts.mass, ts.inertias, ts.geometry, ts.symmetry,
                       ts.mult, ts.vib_energies, ts.vib_mask, T, P)
        H_ts = enthalpy(ts.energy, ts.vib_energies, ts.vib_mask,
                        ts.geometry, T)
        conv = constants.J / constants.mol  # eV -> J/mol divisor
        dS = (S_ts - S_reacs) / conv
        dH = (H_ts - H_reacs) / conv
        return dS, dH

    def _rates_scalar(self, T, P):
        dS, dH = self.calculate_entropy_enthalpy(T, P)
        k_r = (constants.k_b * T / constants.h
               * jnp.exp(dS / constants.R)
               * jnp.exp(-dH / (constants.R * T)))
        k = self._apply_k_max(k_r, self.k_max)
        return k * self.t_mult

    def __call__(self, T, P, **_):
        import jax
        T = jnp.asarray(T, dtype=jnp.result_type(float))
        P = jnp.asarray(P, dtype=jnp.result_type(float))
        if T.ndim == 0 and P.ndim == 0:
            return self._rates_scalar(T, P)
        shape = jnp.broadcast_shapes(T.shape, P.shape)
        Tb = jnp.broadcast_to(T, shape).ravel()
        Pb = jnp.broadcast_to(P, shape).ravel()
        out = jax.vmap(self._rates_scalar)(Tb, Pb)
        return out.reshape(shape + (self.nr,))
