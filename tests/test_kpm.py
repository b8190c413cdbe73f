"""KPM calculator family: ML-predicted Ea -> Arrhenius/collision-theory k.

Capability parity with the reference's KineticaKPM.jl extension
(/root/reference/docs/src/tutorials/kinetic-calculators.md:92-186).
"""
import numpy as np
import pytest

from kinetica_tpu import constants
from kinetica_tpu.calculators.kpm import (
    DESCRIPTOR_DIM, KPMBasicCalculator, KPMCollisionCalculator,
    KPMCollisionEntropyCalculator, KPMRun, calc_collision_params,
    calc_steric_factors, reaction_descriptors)
from kinetica_tpu.core.network import RxData, SpeciesData


@pytest.fixture()
def crn():
    sd = SpeciesData(["[H][H]", "C", "[CH3]", "[H]"])
    rd = RxData.from_reactions(
        sd,
        [["C"], ["[H]", "C"]],
        [["[CH3]", "[H]"], ["[CH3]", "[H][H]"]],
        dH=[4.5, 0.1])
    return sd, rd


class TestKPMRun:
    def test_descriptors_shape(self, crn):
        sd, rd = crn
        X = reaction_descriptors(sd, rd)
        assert X.shape == (2, DESCRIPTOR_DIM)
        # reaction 2 is bimolecular -> flag set; reaction 1 is not
        assert X[1, -1] == 1.0 and X[0, -1] == 0.0
        # methane has 1 C and 4 H on the reactant side of rxn 1
        assert X[0, 0] == 4.0 and X[0, 1] == 1.0

    def test_evans_polanyi_fallback(self, crn):
        sd, rd = crn
        kpm = KPMRun()
        Ea = kpm(sd, rd)
        # Ea = 0.75 * (dH + 2) eV in J/mol, floored at 0
        expect = 0.75 * (np.array([4.5, 0.1]) + 2.0) * constants.eV_to_J_per_mol
        np.testing.assert_allclose(Ea, expect, rtol=1e-12)

    def test_predict_fn_and_uncertainty(self, crn):
        sd, rd = crn
        ens = np.array([[1.0, 2.0], [3.0, 4.0]])  # two members, eV
        kpm = KPMRun(predict_fn=lambda X: ens)
        Ea, std = kpm(sd, rd, uncertainty=True)
        np.testing.assert_allclose(Ea, [2.0 * constants.eV_to_J_per_mol,
                                        3.0 * constants.eV_to_J_per_mol])
        np.testing.assert_allclose(std, [constants.eV_to_J_per_mol] * 2)

    def test_npz_model_roundtrip(self, crn, tmp_path):
        sd, rd = crn
        rng = np.random.default_rng(0)
        path = tmp_path / "model.npz"
        arrs = {}
        for m in range(3):
            arrs[f"W{m}_0"] = rng.normal(size=(DESCRIPTOR_DIM, 8))
            arrs[f"b{m}_0"] = rng.normal(size=8)
            arrs[f"W{m}_1"] = rng.normal(size=(8, 1))
            arrs[f"b{m}_1"] = rng.normal(size=1)
        arrs["feat_mean"] = np.zeros(DESCRIPTOR_DIM)
        arrs["feat_std"] = np.ones(DESCRIPTOR_DIM)
        np.savez(path, **arrs)
        kpm = KPMRun(str(path))
        Ea, std = kpm(sd, rd, uncertainty=True)
        assert Ea.shape == (2,) and np.all(Ea >= 0) and np.all(std >= 0)
        # manual forward pass of member 0 must match
        X = reaction_descriptors(sd, rd)
        h = np.tanh(X @ arrs["W0_0"] + arrs["b0_0"]) @ arrs["W0_1"] + arrs["b0_1"]
        members = [np.tanh(X @ arrs[f"W{m}_0"] + arrs[f"b{m}_0"])
                   @ arrs[f"W{m}_1"] + arrs[f"b{m}_1"] for m in range(3)]
        mean_ev = np.maximum(np.mean(np.stack(members)[:, :, 0], axis=0), 0.0)
        np.testing.assert_allclose(Ea, mean_ev * constants.eV_to_J_per_mol,
                                   rtol=1e-6)


class TestKPMBasicCalculator:
    def test_rate_formula(self, crn):
        sd, rd = crn
        calc = KPMBasicCalculator(KPMRun(predict_fn=lambda X: np.array([0.5, 1.0])))
        calc.setup_network(sd, rd)
        k = np.asarray(calc(T=800.0))
        Ea = np.array([0.5, 1.0]) * constants.eV_to_J_per_mol
        expect = (constants.R * 800.0 / constants.h) * np.exp(
            -Ea / (constants.R * 800.0))
        np.testing.assert_allclose(k, expect, rtol=1e-10)

    def test_k_max_cap_and_splice(self, crn):
        sd, rd = crn
        calc = KPMBasicCalculator(KPMRun(predict_fn=lambda X: np.array([0.0, 2.0])),
                                  k_max=1e10)
        calc.setup_network(sd, rd)
        k = np.asarray(calc(T=1500.0))
        assert np.all(k <= 1e10 * (1 + 1e-12))
        calc.splice([0])
        assert calc.Ea.shape == (1,)

    def test_uncertainty_propagation(self, crn):
        sd, rd = crn
        ens = np.array([[0.9, 1.9], [1.1, 2.1]])
        calc = KPMBasicCalculator(KPMRun(predict_fn=lambda X: ens),
                                  uncertainty=True)
        calc.setup_network(sd, rd)
        k = calc(T=1000.0)
        sig = np.asarray(calc.k_uncertainty(k, 1000.0))
        expect_rel = 0.1 * constants.eV_to_J_per_mol / (constants.R * 1000.0)
        np.testing.assert_allclose(sig / np.asarray(k), expect_rel, rtol=1e-10)


class TestKPMCollision:
    def test_collision_params(self, crn):
        sd, rd = crn
        from kinetica_tpu.chem.conversion import get_species_stats
        get_species_stats(sd)
        mu, sigma = calc_collision_params(sd, rd)
        assert mu.shape == (2,) and np.all(mu > 0) and np.all(sigma > 0)
        # bimolecular H + CH4: mu close to m_H (lighter partner dominates)
        mH = sd.cache["weights"][sd.toInt["[H]"]]
        mC = sd.cache["weights"][sd.toInt["C"]]
        np.testing.assert_allclose(
            mu[1] / 1.6605390666e-27, mH * mC / (mH + mC), rtol=1e-12)

    def test_rate_magnitude_and_conditions(self, crn):
        sd, rd = crn
        calc = KPMCollisionCalculator(
            KPMRun(predict_fn=lambda X: np.array([0.5, 0.5])))
        calc.setup_network(sd, rd)
        assert calc.has_conditions(["T"]) and not calc.has_conditions(["T", "P"])
        k = np.asarray(calc(T=1000.0))
        assert k.shape == (2,) and np.all(k > 0)
        # gas-kinetic prefactor should land within the physical window
        A = k * np.exp(np.asarray(calc.Ea) / (constants.R * 1000.0))
        assert np.all(A > 1e8) and np.all(A < 1e14)

    def test_inert_species_rewrites_unimolecular(self, crn):
        sd, rd = crn
        calc = KPMCollisionCalculator(KPMRun(), inert_species=["N#N"])
        calc.setup_network(sd, rd)
        # the unimolecular CH4 split gained N2 as a collision partner
        assert all(sum(s) >= 2 for s in rd.stoic_reacs)
        assert "N#N" in sd.toInt
        assert len(np.asarray(calc.Ea)) == rd.nr

    def test_steric_factors(self, crn):
        sd, rd = crn
        from kinetica_tpu.chem.conversion import get_species_stats
        get_species_stats(sd)
        ones = calc_steric_factors(sd, rd, None)
        np.testing.assert_allclose(ones, 1.0)
        basic = calc_steric_factors(sd, rd, "basic")
        assert np.all(basic <= 1.0) and np.all(basic > 0.0)
        ent = calc_steric_factors(sd, rd, "entropy")
        assert ent[1] < 1.0  # bimolecular loses entropy
        with pytest.raises(ValueError):
            calc_steric_factors(sd, rd, "nope")

    def test_entropy_calculator_reduces_rate(self, crn):
        sd, rd = crn
        kpm = KPMRun(predict_fn=lambda X: np.array([0.5, 0.5]))
        plain = KPMCollisionCalculator(kpm)
        plain.setup_network(sd, rd)
        sd2 = SpeciesData(["[H][H]", "C", "[CH3]", "[H]"])
        rd2 = RxData.from_reactions(
            sd2, [["C"], ["[H]", "C"]],
            [["[CH3]", "[H]"], ["[CH3]", "[H][H]"]], dH=[4.5, 0.1])
        ent = KPMCollisionEntropyCalculator(kpm)
        ent.setup_network(sd2, rd2)
        k_p, k_e = np.asarray(plain(T=900.0)), np.asarray(ent(T=900.0))
        assert k_e[1] < k_p[1]

    def test_traced_temperature(self, crn):
        import jax
        import jax.numpy as jnp
        sd, rd = crn
        calc = KPMCollisionCalculator(KPMRun())
        calc.setup_network(sd, rd)
        k_fn = jax.jit(lambda T: calc(T=T))
        np.testing.assert_allclose(np.asarray(k_fn(jnp.asarray(850.0))),
                                   np.asarray(calc(T=850.0)), rtol=1e-12)
