"""End-to-end ASENEBCalculator pipeline over the fake ASE backend.

The counterpart of the reference's EMT end-to-end test
(test/Python/ase.jl:79-102, CC <-> C=C + H2): the full data-acquisition
pipeline — species properties, geometry opt, endpoint systems, (CI-)NEB,
TS extraction, finite-difference vibrations, disk caching, Eyring TST
rates — runs without any external chemistry stack, via
kinetica_tpu.testing.fake_ase. Like the reference, values are not
chemistry; the plumbing is the subject under test.
"""
import numpy as np
import pytest

from kinetica_tpu.core.network import RxData, SpeciesData
from kinetica_tpu.testing import fake_ase


@pytest.fixture(scope="module", autouse=True)
def fake_backend():
    try:
        fake_ase.install()
    except RuntimeError as exc:
        pytest.skip(f"cannot install fake ase backend: {exc}")
    yield
    fake_ase.uninstall()


@pytest.fixture(scope="module")
def network():
    from kinetica_tpu.chem import frame_from_smiles
    smis = ["CC", "C=C", "[H][H]"]
    sd = SpeciesData(smis, [frame_from_smiles(s) for s in smis])
    rd = RxData()
    rd.push(sd, [["CC"]], [["C=C", "[H][H]"]])
    rd.push(sd, [["C=C", "[H][H]"]], [["CC"]])
    return sd, rd


def make_calc(tmpdir, **kw):
    from kinetica_tpu.ase.calculator import ASENEBCalculator
    kw.setdefault("n_images", 5)
    kw.setdefault("neb_optimiser", "fire")
    kw.setdefault("climb", False)
    kw.setdefault("ftol", 0.3)
    kw.setdefault("geom_fmax", 0.05)
    kw.setdefault("maxiters", 400)
    kw.setdefault("interpolation", "linear")
    return ASENEBCalculator(calc_builder=fake_ase.ToyMorseBuilder(),
                            calcdir=str(tmpdir), **kw)


class TestFakeAsePipeline:
    def test_full_pipeline_runs(self, tmp_path, network):
        sd, rd = network
        sd, rd = sd.copy(), rd.copy()
        calc = make_calc(tmp_path / "calc", remove_unconverged=False)
        calc.setup_network(sd, rd)

        # species-level artifacts all cached
        for sid in range(sd.n):
            assert sid in sd.cache["mult"]
            assert sid in sd.cache["geometry"]
            assert sid in sd.cache["vib_energies"]
            assert "energy_ASE" in sd.xyz[sid]["info"]
        # nonlinear molecules got 3N-6 modes
        cc = sd.toInt["CC"]
        assert len(sd.cache["vib_energies"][cc]) == 3 * 8 - 6
        # both NEBs converge at the loose test tolerances (the force-based
        # fake optimiser handles the band's non-conservative force field)
        assert calc.ts_cache["conv"] == {0: True, 1: True}
        assert rd.nr == 2

        # Eyring TST rates evaluate (traceable in T, P)
        if rd.nr:
            k = np.asarray(calc(T=1000.0, P=1e5))
            assert k.shape == (rd.nr,)
            assert np.all(np.isfinite(k)) and np.all(k >= 0.0)

    def test_disk_cache_roundtrip(self, tmp_path, network):
        sd, rd = network
        calcdir = tmp_path / "calc2"
        sd1, rd1 = sd.copy(), rd.copy()
        calc1 = make_calc(calcdir, remove_unconverged=False)
        calc1.setup_network(sd1, rd1)
        e_first = sd1.xyz[0]["info"]["energy_ASE"]

        # a second calculator over the same calcdir reuses per-species
        # artifacts (load_optgeom path) without re-optimising
        sd2, rd2 = sd.copy(), rd.copy()
        calc2 = make_calc(calcdir, remove_unconverged=False)
        calc2.setup_network(sd2, rd2)
        assert sd2.xyz[0]["info"]["energy_ASE"] == pytest.approx(e_first)

    def test_neb_and_ts_extraction_direct(self, tmp_path, network):
        from kinetica_tpu.ase.neb import highest_energy_frame, neb
        sd, rd = network
        sd, rd = sd.copy(), rd.copy()
        calc = make_calc(tmp_path / "calc3")
        calc.sd, calc.rd = sd, rd
        from kinetica_tpu.ase.properties import (get_charge_cached,
                                                 get_mult_cached)
        for sid in range(sd.n):
            get_mult_cached(sd, sid)
            get_charge_cached(sd, sid)
        # endpoint systems via the calculator's own helper
        reacsys = calc._endpoint_system(rd.id_reacs[0], rd.stoic_reacs[0],
                                        str(tmp_path / "calc3"))
        prodsys = calc._endpoint_system(rd.id_prods[0], rd.stoic_prods[0],
                                        str(tmp_path / "calc3"))
        images, conv = neb(reacsys, prodsys, calc,
                           calcdir=str(tmp_path / "calc3"))
        assert len(images) == calc.n_images
        ts = highest_energy_frame(images)
        assert ts["N_atoms"] == 8
        e_ts = ts["info"]["energy_ASE"]
        e_r = images[0].get_potential_energy()
        assert e_ts >= e_r  # a barrier (or at least non-downhill TS)

    def test_asenab_in_solve_network(self, tmp_path, network):
        """The TST calculator drives a discrete variable-T solve_network —
        the reference's production configuration (ASENEB requires discrete
        updates there; here TST rates are traceable so both modes work)."""
        from kinetica_tpu.conditions.condition_set import ConditionSet
        from kinetica_tpu.conditions.profiles import LinearGradientProfile
        from kinetica_tpu.solving.methods import (VariableODESolve,
                                                  solve_network)
        from kinetica_tpu.solving.params import ODESimulationParams

        sd, rd = network
        sd, rd = sd.copy(), rd.copy()
        calc = make_calc(tmp_path / "calc4", remove_unconverged=False,
                         k_max=1e6)
        conditions = ConditionSet(
            {"T": LinearGradientProfile(rate=100.0, X_start=800.0,
                                        X_end=1200.0),
             "P": 1e5},
            ts_update=1.0)
        tf = conditions.get_t_final()
        pars = ODESimulationParams(tspan=(0.0, tf), u0={"CC": 1.0},
                                   solve_chunks=True, solve_chunkstep=tf / 4,
                                   low_k_cutoff="none")
        res = solve_network(VariableODESolve(pars, conditions, calc), sd, rd)
        assert res.sol.success
        u = np.asarray(res.sol.u)
        assert u.shape[1] == sd.n
        assert np.all(np.isfinite(u))
        # mass conservation in carbon units: 2[CC] + 2[C=C]
        carbon = 2 * u[:, res.sd.toInt["CC"]] + 2 * u[:, res.sd.toInt["C=C"]]
        np.testing.assert_allclose(carbon, carbon[0], rtol=1e-6)


class TestCalculatorCheckpoint:
    """Whole-calculator checkpoint + cache verification (io.jl:12-133,
    191-239): interrupt setup, restart, complete from checkpoint."""

    def test_interrupted_setup_resumes_from_checkpoint(self, tmp_path,
                                                       network, monkeypatch):
        from kinetica_tpu.ase import calculator as calcmod
        from kinetica_tpu.ase import io as aseio

        sd, rd = network
        calcdir = tmp_path / "chk"

        # First run: let reaction 0 complete, then "crash" on reaction 1.
        sd1, rd1 = sd.copy(), rd.copy()
        calc1 = make_calc(calcdir, remove_unconverged=False)
        real_setup_rxn = calcmod.ASENEBCalculator._setup_reaction

        def crashing_setup(self, rid):
            if rid == 1:
                raise KeyboardInterrupt("simulated crash")
            return real_setup_rxn(self, rid)

        monkeypatch.setattr(calcmod.ASENEBCalculator, "_setup_reaction",
                            crashing_setup)
        with pytest.raises(KeyboardInterrupt):
            calc1.setup_network(sd1, rd1)
        monkeypatch.undo()

        # Checkpoint exists and records the completed reaction 0
        chk = aseio.load_calculator_checkpoint(str(calcdir))
        assert chk is not None
        assert rd.rhash[0].hex() in chk["ts_by_rhash"]
        assert rd.rhash[1].hex() not in chk["ts_by_rhash"]

        # Second run: reaction 0 must come from the checkpoint (its NEB is
        # never rerun), reaction 1 completes normally.
        import importlib
        nebmod = importlib.import_module("kinetica_tpu.ase.neb")
        neb_calls = []
        real_neb = nebmod.neb

        def counting_neb(*args, **kwargs):
            neb_calls.append(1)
            return real_neb(*args, **kwargs)

        monkeypatch.setattr(calcmod, "neb", counting_neb)
        sd2, rd2 = sd.copy(), rd.copy()
        calc2 = make_calc(calcdir, remove_unconverged=False)
        calc2.setup_network(sd2, rd2)
        assert len(neb_calls) == 1          # only reaction 1 ran NEB
        assert calc2.ts_cache["conv"] == {0: True, 1: True}

        # Third run: everything restored, zero NEBs
        neb_calls.clear()
        sd3, rd3 = sd.copy(), rd.copy()
        calc3 = make_calc(calcdir, remove_unconverged=False)
        calc3.setup_network(sd3, rd3)
        assert neb_calls == []
        assert calc3.ts_cache["conv"] == {0: True, 1: True}

    def test_inconsistent_checkpoint_rejected(self, tmp_path, network):
        from kinetica_tpu.ase import io as aseio
        sd, rd = network
        calcdir = tmp_path / "chk2"
        sd1, rd1 = sd.copy(), rd.copy()
        calc1 = make_calc(calcdir, remove_unconverged=False)
        calc1.setup_network(sd1, rd1)

        # corrupt the checkpoint's species map -> verification must fail
        chk = aseio.load_calculator_checkpoint(str(calcdir))
        chk["species_smiles"]["0"] = "O=C=O"
        aseio.save_calculator_checkpoint(str(calcdir), chk)

        sd2, rd2 = sd.copy(), rd.copy()
        calc2 = make_calc(calcdir, remove_unconverged=False)
        calc2.setup_network(sd2, rd2)  # falls back to per-rhash artifacts
        assert calc2.ts_cache["conv"] == {0: True, 1: True}
