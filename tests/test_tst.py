"""TST thermochemistry and Eyring-rate tests.

Validates the vectorised traceable implementation against a direct scalar
transcription of the ideal-gas formulas (the same math the reference
cross-checks against ASE's IdealGasThermo, asethermo_interface.jl:1-4).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinetica_tpu import constants
from kinetica_tpu.calculators.tst import (GEOM_LINEAR, GEOM_MONATOMIC,
                                          GEOM_NONLINEAR, ThermoTable,
                                          TSTCalculator, enthalpy, entropy)


def scalar_entropy(mass, inertias, geometry, symmetry, mult, vibs, T, P):
    S = 0.0
    mass_kg = mass * constants.amu
    S_t = (2 * math.pi * mass_kg * constants.k * T / constants.hplanck ** 2) ** 1.5
    S_t *= constants.k * T / constants.ref_P
    S += constants.kB * (math.log(S_t) + 2.5)
    if geometry == 1:
        iconv = max(inertias) * constants.amu / 1e20
        S_r = 8 * math.pi ** 2 * iconv * constants.k * T / symmetry / constants.hplanck ** 2
        S += constants.kB * (math.log(S_r) + 1.0)
    elif geometry == 2:
        iconv = [x * constants.amu / 1e20 for x in inertias]
        S_r = math.sqrt(math.pi * iconv[0] * iconv[1] * iconv[2]) / symmetry
        S_r *= (8 * math.pi ** 2 * constants.k * T / constants.hplanck ** 2) ** 1.5
        S += constants.kB * (math.log(S_r) + 1.5)
    S += constants.kB * math.log(mult)
    kT = constants.kB * T
    for e in vibs:
        x = e / kT
        S += constants.kB * (x / (math.exp(x) - 1) - math.log(1 - math.exp(-x)))
    S += -constants.kB * math.log(P / constants.ref_P)
    return S


def scalar_enthalpy(energy, vibs, geometry, T):
    H = energy + sum(0.5 * e for e in vibs)
    H += 1.5 * constants.kB * T
    if geometry == 1:
        H += constants.kB * T
    elif geometry == 2:
        H += 1.5 * constants.kB * T
    kT = constants.kB * T
    for e in vibs:
        H += e / (math.exp(e / kT) - 1)
    H += constants.kB * T
    return H


CASES = [
    # (mass, inertias, geometry, symmetry, mult, energy, vibs)
    (16.04, [3.1, 3.1, 3.1], GEOM_NONLINEAR, 12, 1, -24.0,
     [0.38, 0.38, 0.38, 0.19, 0.19, 0.17, 0.17, 0.17, 0.39]),
    (2.016, [0.277, 0.277, 0.0], GEOM_LINEAR, 2, 1, -6.7, [0.546]),
    (1.008, [0.0, 0.0, 0.0], GEOM_MONATOMIC, 1, 2, -1.1, []),
]


class TestThermo:
    @pytest.mark.parametrize("case", CASES)
    @pytest.mark.parametrize("T,P", [(300.0, 1e5), (1000.0, 2e5), (550.0, 5e4)])
    def test_entropy_matches_scalar(self, case, T, P):
        mass, inertias, geom, sym, mult, energy, vibs = case
        table = ThermoTable.from_lists([mass], [inertias], [geom], [sym],
                                       [mult], [energy], [vibs])
        S_vec = float(entropy(table.mass, table.inertias, table.geometry,
                              table.symmetry, table.mult, table.vib_energies,
                              table.vib_mask, T, P)[0])
        S_ref = scalar_entropy(mass, inertias, geom, sym, mult, vibs, T, P)
        assert S_vec == pytest.approx(S_ref, rel=1e-12)

    @pytest.mark.parametrize("case", CASES)
    def test_enthalpy_matches_scalar(self, case):
        mass, inertias, geom, sym, mult, energy, vibs = case
        table = ThermoTable.from_lists([mass], [inertias], [geom], [sym],
                                       [mult], [energy], [vibs])
        for T in (300.0, 900.0):
            H_vec = float(enthalpy(table.energy, table.vib_energies,
                                   table.vib_mask, table.geometry, T)[0])
            H_ref = scalar_enthalpy(energy, vibs, geom, T)
            assert H_vec == pytest.approx(H_ref, rel=1e-12)


def build_tst_calculator(k_max=None):
    # species: CH4, H2, H (CASES order)
    species = ThermoTable.from_lists(
        [c[0] for c in CASES], [c[1] for c in CASES], [c[2] for c in CASES],
        [c[3] for c in CASES], [c[4] for c in CASES], [c[5] for c in CASES],
        [c[6] for c in CASES])
    # 2 reactions: CH4 -> products (TS1); CH4 + H -> products (TS2)
    ts = ThermoTable.from_lists(
        [16.04, 17.05],
        [[3.5, 3.6, 3.8], [4.0, 4.1, 4.5]],
        [GEOM_NONLINEAR, GEOM_NONLINEAR],
        [1, 1], [1, 2],
        [-22.0, -24.6],
        [[0.35, 0.2, 0.18, 0.17, 0.15, 0.30, 0.28, 0.25],
         [0.36, 0.21, 0.19, 0.18, 0.16, 0.31, 0.29, 0.26, 0.1]])
    return TSTCalculator(species, ts, id_reacs=[[0], [0, 2]],
                         stoic_reacs=[[1], [1, 1]], k_max=k_max)


class TestTSTCalculator:
    def test_eyring_rates_match_manual(self):
        calc = build_tst_calculator()
        T, P = 800.0, 1e5
        k = np.asarray(calc(T=T, P=P))
        # manual: reaction 2 (CH4 + H)
        S_reac = (scalar_entropy(*CASES[0][:5], CASES[0][6], T, P)
                  + scalar_entropy(*CASES[2][:5], CASES[2][6], T, P))
        H_reac = (scalar_enthalpy(CASES[0][5], CASES[0][6], CASES[0][2], T)
                  + scalar_enthalpy(CASES[2][5], CASES[2][6], CASES[2][2], T))
        S_ts = scalar_entropy(17.05, [4.0, 4.1, 4.5], GEOM_NONLINEAR, 1, 2,
                              [0.36, 0.21, 0.19, 0.18, 0.16, 0.31, 0.29, 0.26, 0.1],
                              T, P)
        H_ts = scalar_enthalpy(-24.6, [0.36, 0.21, 0.19, 0.18, 0.16, 0.31,
                                       0.29, 0.26, 0.1], GEOM_NONLINEAR, T)
        conv = constants.J / constants.mol
        dS = (S_ts - S_reac) / conv
        dH = (H_ts - H_reac) / conv
        k_manual = (constants.k_b * T / constants.h * math.exp(dS / constants.R)
                    * math.exp(-dH / (constants.R * T)))
        assert k[1] == pytest.approx(k_manual, rel=1e-10)

    def test_k_max_cap(self):
        calc = build_tst_calculator(k_max=1.0)
        k = np.asarray(calc(T=800.0, P=1e5))
        assert np.all(k <= 1.0)

    def test_traceable_and_batched(self):
        calc = build_tst_calculator()

        @jax.jit
        def rates(T, P):
            return calc(T=T, P=P)

        k1 = np.asarray(rates(800.0, 1e5))
        Ts = jnp.array([700.0, 800.0, 900.0])
        kb = np.asarray(calc(T=Ts, P=jnp.full(3, 1e5)))
        assert kb.shape == (3, 2)
        np.testing.assert_allclose(kb[1], k1, rtol=1e-12)
        # rates increase with T for positive-barrier reactions
        assert kb[2, 0] > kb[0, 0]

    def test_splice(self):
        calc = build_tst_calculator()
        calc.splice([0])
        assert calc.nr == 1
        k = np.asarray(calc(T=800.0, P=1e5))
        assert k.shape == (1,)

    def test_continuous_solve_with_tst(self):
        """TST rates embedded continuously in a variable solve — a
        capability the reference's bridged implementation cannot offer."""
        from kinetica_tpu.conditions.condition_set import ConditionSet
        from kinetica_tpu.conditions.profiles import LinearGradientProfile
        from kinetica_tpu.core.network import RxData, SpeciesData
        from kinetica_tpu.solving.methods import VariableODESolve, solve_network
        from kinetica_tpu.solving.params import ODESimulationParams

        sd = SpeciesData(["C", "[H][H]", "[H]"])
        rd = RxData.from_reactions(sd, [["C"], ["C", "[H]"]],
                                   [["[H][H]", "[H]"], ["[H][H]", "[H]"]])
        # (products chemically loose here; only rate plumbing is under test)
        calc = build_tst_calculator(k_max=1e6)
        conditions = ConditionSet({
            "T": LinearGradientProfile(rate=100.0, X_start=500.0, X_end=1500.0),
            "P": 1e5})
        pars = ODESimulationParams(tspan=(0.0, 10.0), u0={"C": 1.0},
                                   solve_chunks=False, save_interval=0.5,
                                   low_k_cutoff="none")
        res = solve_network(VariableODESolve(pars, conditions, calc), sd, rd)
        assert res.sol.success
        assert res.sol.u[-1, 0] < res.sol.u[0, 0]  # methane consumed


class TestThermoCrossCheck:
    """The asethermo_interface parity module (ase/thermo_check.py)."""

    def test_numpy_reference_agrees(self):
        from kinetica_tpu.ase.thermo_check import cross_check
        rep = cross_check(
            mass=28.05, inertias=[3.5, 16.8, 20.3], geometry=2, symmetry=4,
            mult=1, energy=-12.4,
            vib_energies=[0.1, 0.12, 0.2, 0.38, 0.39, 0.4],
            T=450.0, P=2.1e5)
        assert rep["dS_numpy"] < 1e-12
        assert rep["dH_numpy"] < 1e-12

    def test_linear_and_monatomic_geometries(self):
        from kinetica_tpu.ase.thermo_check import cross_check
        rep = cross_check(mass=28.0, inertias=[0.0, 8.7, 8.7], geometry=1,
                          symmetry=2, mult=1, energy=-9.0,
                          vib_energies=[0.15, 0.25], T=700.0, P=1e5)
        assert rep["dS_numpy"] < 1e-12 and rep["dH_numpy"] < 1e-12
        rep = cross_check(mass=39.9, inertias=[0.0, 0.0, 0.0], geometry=0,
                          symmetry=1, mult=1, energy=0.0,
                          vib_energies=np.zeros((0,)), T=300.0, P=1e5)
        assert rep["dS_numpy"] < 1e-12 and rep["dH_numpy"] < 1e-12

    def test_ase_reference_if_available(self):
        pytest.importorskip("ase")
        from kinetica_tpu.ase.thermo_check import cross_check
        from kinetica_tpu.chem import frame_from_smiles
        frame = frame_from_smiles("C=C")
        rep = cross_check(
            mass=28.05, inertias=[3.5, 16.8, 20.3], geometry=2, symmetry=4,
            mult=1, energy=-12.4,
            vib_energies=[0.1, 0.12, 0.2, 0.38, 0.39, 0.4],
            T=450.0, P=2.1e5, frame=frame)
        # ASE computes from the atoms' own mass/inertia, so compare its own
        # H (mass-independent) tightly and S loosely (geometry-derived).
        assert rep["dH_ase"] < 1e-10
