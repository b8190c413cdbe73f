"""Native reaction sampler (csrc/cde_lite.cpp) through the CDE runner.

The first-party capability equivalent of the reference's external CDE
binary (cde.jl:54-122): same file contract, graph-move sampling with
valence constraints, geometry generation, energies.
"""
import os

import numpy as np
import pytest

from kinetica_tpu.core.network import SpeciesData, RxData
from kinetica_tpu.exploration import CDE, ingest_cde_run, make_rcount
from kinetica_tpu.exploration.cde_lite import (build_cde_lite,
                                               get_cde_lite_exec,
                                               write_minimal_template)
from kinetica_tpu.exploration.molecule_system import system_from_smiles

pytestmark = pytest.mark.skipif(build_cde_lite() is None,
                                reason="g++ unavailable")


@pytest.fixture
def native_cde(tmp_path):
    template = write_minimal_template(str(tmp_path / "template"))
    return CDE(template_dir=template, cde_exec=get_cde_lite_exec(),
               sampling_seed=11, nrxn=4, radius=2)


class TestCdeLite:
    def test_single_run_and_ingest(self, tmp_path, native_cde):
        rdir = tmp_path / "rundir"
        rdir.mkdir()
        native_cde.rdir = str(rdir)
        seeds = str(tmp_path / "seeds.xyz")
        system_from_smiles(["CC", "CC"], saveto=seeds)
        native_cde.init_xyz = seeds
        assert native_cde(1) is True
        assert make_rcount(str(rdir / "rcount")) == 1
        rs, rx, rsys, ps, px, psys, dH = ingest_cde_run(str(rdir), 1)
        assert len(rs) >= 2  # at least one mechanism + its reverse
        # products differ from reactants (a real graph change happened)
        assert any(sorted(a) != sorted(b) for a, b in zip(rs, ps))
        # energies give nonzero dH with the reverse negated
        n_fwd = len(dH) // 2
        np.testing.assert_allclose(dH[n_fwd:], [-x for x in dH[:n_fwd]])

    def test_atoms_conserved_and_network_builds(self, tmp_path, native_cde):
        rdir = tmp_path / "rundir"
        rdir.mkdir()
        native_cde.rdir = str(rdir)
        seeds = str(tmp_path / "seeds.xyz")
        system_from_smiles(["CCO"], saveto=seeds)
        native_cde.init_xyz = seeds
        assert native_cde(1) is True
        rs, rx, rsys, ps, px, psys, dH = ingest_cde_run(str(rdir), 1)
        sd = SpeciesData([])
        rd = RxData()
        for smi_list, xyz_list in ((rs, rx), (ps, px)):
            for smis, xyzs in zip(smi_list, xyz_list):
                for smi, xyz in zip(smis, xyzs):
                    sd.push_unique(smi, xyz)
        rd.push(sd, rs, ps, rsys, psys, dH, max_molecularity=3)
        assert sd.n >= 2
        assert rd.nr >= 1

    def test_parallel_pool(self, tmp_path, native_cde):
        native_cde.parallel_runs = 3
        native_cde.parallel_exes = 2
        native_cde.__post_init__()
        rdir = tmp_path / "rundir"
        rdir.mkdir()
        native_cde.rdir = str(rdir)
        seeds = str(tmp_path / "seeds.xyz")
        system_from_smiles(["CC", "C"], saveto=seeds)
        native_cde.init_xyz = seeds
        out = native_cde(range(1, 4))
        assert out == 3
        assert sorted(d for d in os.listdir(rdir) if d.startswith("reac_")) == [
            "reac_00001", "reac_00002", "reac_00003"]

    def test_movefile_restricts_moves(self, tmp_path):
        # break-only movefile: every product must have fewer or equal bonds
        moves = ("move\nnatom 2\n-\n0 1\n1 0\n-\n0 0\n0 0\n-\n"
                 "labels * *\nprob 1.0\n")
        template = write_minimal_template(str(tmp_path / "template"),
                                          movefile_lines=moves)
        cde = CDE(template_dir=template, cde_exec=get_cde_lite_exec(),
                  sampling_seed=3, nrxn=5, radius=1)
        rdir = tmp_path / "rundir"
        rdir.mkdir()
        cde.rdir = str(rdir)
        seeds = str(tmp_path / "seeds.xyz")
        system_from_smiles(["CC"], saveto=seeds)
        cde.init_xyz = seeds
        assert cde(1) is True
        from kinetica_tpu.chem.graphmol import perceive_connectivity
        from kinetica_tpu.chem.xyz import (frame_positions, frame_species,
                                           read_xyz_file)
        rxdir = rdir / "reac_00001"
        for f in sorted(os.listdir(rxdir)):
            if not f.startswith("rxn_"):
                continue
            fr = read_xyz_file(str(rxdir / f))
            nb = [len(perceive_connectivity(frame_species(x),
                                            frame_positions(x)).bonds)
                  for x in fr[:2]]
            assert nb[1] < nb[0]  # bonds only break

    def test_determinism_by_seed(self, tmp_path, native_cde):
        outs = []
        for run in ("a", "b"):
            rdir = tmp_path / f"rundir_{run}"
            rdir.mkdir()
            native_cde.rdir = str(rdir)
            seeds = str(tmp_path / f"seeds_{run}.xyz")
            system_from_smiles(["CCC"], saveto=seeds)
            native_cde.init_xyz = seeds
            assert native_cde(1) is True
            rs, _, _, ps, _, _, _ = ingest_cde_run(str(rdir), 1)
            outs.append((rs, ps))
        assert outs[0] == outs[1]
