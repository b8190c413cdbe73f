"""Exploration engine tests with a mock CDE executable.

The real CDE is an external Fortran binary; these tests substitute a mock
with the identical file contract (reads Start.xyz + input in its run dir,
writes rxn_XXXX_step_XXXX.xyz 2-frame trajectories, input.log) that
performs random homolysis moves. This exercises the whole orchestration
loop: staging, subprocess pool, error scanning, rcount persistence, the
no-new-reactions convergence criterion, level setup, restart scanning, and
the kinetics-gated iterative driver with on-device solves.
"""
import os
import stat
import sys
import textwrap

import numpy as np
import pytest

from kinetica_tpu.calculators.base import KineticCalculator
from kinetica_tpu.chem import frame_from_smiles, write_xyz_file
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.core.network import init_network
from kinetica_tpu.exploration import (CDE, DirectExplore, ExploreLoc,
                                      IterativeExplore, explore_network,
                                      find_current_loc, import_network,
                                      make_rcount, system_from_smiles)
from kinetica_tpu.solving.methods import StaticODESolve
from kinetica_tpu.solving.params import ODESimulationParams

MOCK_CDE = textwrap.dedent('''\
    #!/usr/bin/env python
    """Mock CDE: breaks one random bond of the seed system."""
    import random
    import sys

    import numpy as np

    from kinetica_tpu.chem import (frame_positions, frame_species,
                                   make_frame, read_xyz_file, write_xyz_file)
    from kinetica_tpu.chem.graphmol import perceive_connectivity

    seed = 1
    fail = False
    with open("input") as fh:
        for line in fh:
            parts = line.split()
            if parts[:1] == ["ranseed"]:
                seed = int(parts[1])
            if parts[:1] == ["mockfail"]:
                fail = True
    rng = random.Random(seed)

    if fail:
        with open("input.log", "w") as fh:
            fh.write("ERROR: mock failure requested\\n")
        sys.exit(0)

    start = read_xyz_file("Start.xyz")[0]
    species = frame_species(start)
    pos = frame_positions(start)
    system = perceive_connectivity(species, pos)

    # pick ONE molecule of the system (CDE samples single channels)
    import networkx as nx
    comps = [sorted(c) for c in
             nx.connected_components(system.to_nx())]
    comp = comps[rng.randrange(len(comps))]
    sub_species = [species[i] for i in comp]
    sub_pos = pos[comp]
    mol = perceive_connectivity(sub_species, sub_pos)
    bonds = sorted(mol.bonds)

    e0 = -100.0
    if not bonds:
        # nothing to break: emit a conformational no-op (rejected upstream,
        # so the subspace converges cleanly)
        reac = make_frame(sub_species, sub_pos, {"energy": e0})
        prod = make_frame(sub_species, sub_pos + 0.01, {"energy": e0})
        write_xyz_file("rxn_0001_step_0001.xyz", [reac, prod])
        with open("input.log", "w") as fh:
            fh.write("mock CDE finished OK (no-op)\\n")
        sys.exit(0)

    a, b = bonds[rng.randrange(len(bonds))]
    g = mol.to_nx()
    g.remove_edge(a, b)
    side_b = nx.node_connected_component(g, b)
    new_pos = sub_pos.copy()
    direction = sub_pos[b] - sub_pos[a]
    direction = direction / (np.linalg.norm(direction) + 1e-9)
    for i in side_b:
        new_pos[i] = new_pos[i] + direction * 20.0

    e1 = e0 + rng.uniform(1.0, 5.0)
    reac = make_frame(sub_species, sub_pos, {"energy": e0})
    prod = make_frame(sub_species, new_pos, {"energy": e1})
    write_xyz_file("rxn_0001_step_0001.xyz", [reac, prod])
    with open("input.log", "w") as fh:
        fh.write("mock CDE finished OK\\n")
''')


class UniformCalculator(KineticCalculator):
    """k = k0 for every reaction, any network size (test helper)."""
    allows_continuous = True

    def __init__(self, k0=1.0):
        self.k0 = k0

    def setup_network(self, sd, rd):
        self.nr = rd.nr

    def splice(self, rids):
        pass

    def has_conditions(self, symbols):
        return all(s in ("T",) for s in symbols)

    def __call__(self, T=None, **_):
        import jax.numpy as jnp
        return jnp.full((self.nr,), self.k0)


@pytest.fixture
def mock_cde(tmp_path):
    exe = tmp_path / "mock_cde.py"
    exe.write_text(MOCK_CDE)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    template = tmp_path / "template"
    template.mkdir()
    (template / "input").write_text("pestype mock\n")
    return str(exe), str(template)


def make_cde(mock_cde, **kwargs):
    exe, template = mock_cde
    return CDE(template_dir=template, cde_exec=exe, sampling_seed=7, **kwargs)


def solve_method():
    pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"CC": 1.0},
                               solve_chunks=False, save_interval=0.1,
                               low_k_cutoff="none", allow_short_u0=True)
    # allow_short_u0 irrelevant for dict u0; u0 species must exist
    return StaticODESolve(pars, ConditionSet({"T": 500.0}), UniformCalculator(0.5))


class TestMolsys:
    def test_system_from_smiles(self, tmp_path):
        path = str(tmp_path / "seeds.xyz")
        system = system_from_smiles(["C", "C"], saveto=path, dmin=4.0)
        assert system["N_atoms"] == 10
        pos = np.asarray(system["arrays"]["pos"])
        # two methane COMs at least dmin apart
        d = np.linalg.norm(pos[:5].mean(axis=0) - pos[5:].mean(axis=0))
        assert d >= 4.0
        assert os.path.exists(path)


class TestCDERunner:
    def test_single_run_and_ingest(self, tmp_path, mock_cde):
        from kinetica_tpu.exploration import ingest_cde_run
        cde = make_cde(mock_cde)
        rdir = tmp_path / "rundir"
        rdir.mkdir()
        cde.rdir = str(rdir)
        seeds = str(tmp_path / "seeds.xyz")
        system_from_smiles(["CC"], saveto=seeds)
        cde.init_xyz = seeds
        assert cde(1) is True
        assert make_rcount(str(rdir / "rcount")) == 1
        rs, rx, rsys, ps, px, psys, dH = ingest_cde_run(str(rdir), 1)
        # forward + reverse
        assert len(rs) == 2
        assert rs[0] == ps[1] and ps[0] == rs[1]
        assert dH[0] == -dH[1] and dH[0] > 0

    def test_parallel_pool(self, tmp_path, mock_cde):
        cde = make_cde(mock_cde, parallel_runs=3, parallel_exes=2)
        rdir = tmp_path / "rundir"
        rdir.mkdir()
        cde.rdir = str(rdir)
        seeds = str(tmp_path / "seeds.xyz")
        system_from_smiles(["CC"], saveto=seeds)
        cde.init_xyz = seeds
        end = cde(range(1, 4))
        assert end == 3
        assert make_rcount(str(rdir / "rcount")) == 3

    def test_error_detection(self, tmp_path, mock_cde):
        exe, template = mock_cde
        with open(os.path.join(template, "input"), "a") as fh:
            fh.write("mockfail\n")
        cde = make_cde((exe, template))
        rdir = tmp_path / "rundir"
        rdir.mkdir()
        cde.rdir = str(rdir)
        seeds = str(tmp_path / "seeds.xyz")
        system_from_smiles(["CC"], saveto=seeds)
        cde.init_xyz = seeds
        with pytest.raises(RuntimeError):
            cde(1)
        # with allow_errors the failed dir is removed and False returned
        cde.allow_errors = True
        assert cde(2) is False
        assert not os.path.exists(os.path.join(str(rdir), "reac_00002"))


class TestDirectExplore:
    def test_direct_explore_end_to_end(self, tmp_path, mock_cde):
        crn_dir = str(tmp_path / "crn")
        explore = DirectExplore(
            rdir_head=crn_dir, reac_smiles=["CC"],
            cde=make_cde(mock_cde), rxn_convergence_threshold=2,
            maxiters=40)
        res = explore_network(explore, solve_method(),
                              savedir=str(tmp_path / "out"))
        assert res.sol.success
        assert res.rd.nr >= 2  # at least homolysis fwd+rev found
        assert "CC" in res.sd.toInt
        assert os.path.exists(os.path.join(
            str(tmp_path / "out"), "direct_network_final.npz"))
        # filesystem markers written
        loc = ExploreLoc(crn_dir, 1, 1)
        assert os.path.isfile(os.path.join(loc.path(), "isconv"))

    def test_restart_scanning(self, tmp_path, mock_cde):
        crn_dir = str(tmp_path / "crn")
        explore = DirectExplore(
            rdir_head=crn_dir, reac_smiles=["CC"],
            cde=make_cde(mock_cde), rxn_convergence_threshold=2, maxiters=40)
        explore_network(explore, solve_method())
        # re-scan: converged level 1 subspace 1
        loc = find_current_loc(crn_dir)
        assert loc.level == 1
        # import_network reproduces the same network from disk
        sd, rd = import_network(crn_dir)
        assert rd.nr >= 2


class TestIterativeExplore:
    def test_iterative_explore_converges(self, tmp_path, mock_cde):
        crn_dir = str(tmp_path / "crn")
        explore = IterativeExplore(
            rdir_head=crn_dir, reac_smiles=["CC"],
            cde=make_cde(mock_cde), rxn_convergence_threshold=2,
            seed_convergence_threshold=1, seed_conc=0.05, maxiters=60)
        res = explore_network(explore, solve_method(),
                              savedir=str(tmp_path / "out"))
        assert res.sol.success
        assert res.rd.nr >= 2
        # per-level checkpoints + seeds.out written
        outs = os.listdir(str(tmp_path / "out"))
        assert any(o.startswith("level_network_") for o in outs)
        assert any(o.startswith("seeds_level") for o in outs)


def test_driver_refuses_seed_gating_on_failed_solve(tmp_path, mock_cde,
                                                    monkeypatch):
    """A failed kinetic solve must abort the iterative loop, not silently
    gate next-level seeds on garbage concentrations."""
    import kinetica_tpu.exploration.methods as expl_methods

    real_solve = expl_methods.solve_network

    def failing_solve(*args, **kwargs):
        res = real_solve(*args, **kwargs)
        res.sol.retcode = "MaxIters"
        return res

    monkeypatch.setattr(expl_methods, "solve_network", failing_solve)
    crn_dir = str(tmp_path / "crn")
    explore = IterativeExplore(
        rdir_head=crn_dir, reac_smiles=["CC"],
        cde=make_cde(mock_cde), rxn_convergence_threshold=2,
        seed_convergence_threshold=1, seed_conc=0.05, maxiters=60)
    with pytest.raises(RuntimeError, match="refusing to select"):
        explore_network(explore, solve_method(),
                        savedir=str(tmp_path / "out"))
