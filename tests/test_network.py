import numpy as np
import pytest

from kinetica_tpu.core.network import (RxData, SpeciesData, format_rxn,
                                       init_network, stable_species_hash)
from kinetica_tpu.solving.solve_utils import insert_inert


def make_basic_network():
    sd = SpeciesData(["C", "[H]", "[CH3]", "[H][H]", "CC"])
    rd = RxData.from_reactions(
        sd,
        reacs=[["C"], ["[CH3]", "[H]"], ["C", "C"]],
        prods=[["[CH3]", "[H]"], ["C"], ["CC", "[H][H]"]],
        dH=[4.5, -4.5, 0.4])
    return sd, rd


class TestSpeciesData:
    def test_bidirectional_map(self):
        sd = SpeciesData(["C", "O"])
        assert sd.n == 2
        assert sd.toInt["C"] == 0
        assert sd.toStr[1] == "O"

    def test_push_unique_dedup(self):
        sd = SpeciesData(["C"])
        sid = sd.push_unique("C")
        assert sid == 0 and sd.n == 1
        sid2 = sd.push_unique("O", level=3)
        assert sid2 == 1 and sd.level_found[1] == 3

    def test_duplicates_in_constructor(self):
        sd = SpeciesData(["C", "C", "O"], unique_species=True)
        assert sd.n == 2


class TestRxData:
    def test_construction_and_stoich(self):
        sd, rd = make_basic_network()
        assert rd.nr == 3
        # C + C --> CC + [H][H]: stoichiometry of reactants collapses to 2.
        assert rd.id_reacs[2] == [sd.toInt["C"]]
        assert rd.stoic_reacs[2] == [2]
        assert rd.stoic_prods[2] == [1, 1]

    def test_hash_dedup(self):
        sd, rd = make_basic_network()
        rd.push(sd, [["C"]], [["[CH3]", "[H]"]], dH=[4.5])
        assert rd.nr == 3  # duplicate rejected

    def test_conformational_noop_rejected(self):
        sd, rd = make_basic_network()
        rd.push(sd, [["C"]], [["C"]], dH=[0.0])
        assert rd.nr == 3

    def test_max_molecularity(self):
        sd, rd = make_basic_network()
        rd.push(sd, [["C", "C", "C"]], [["CC", "C", "[H][H]"]], dH=[0.0])
        assert rd.nr == 3  # trimolecular rejected

    def test_reverse_hash(self):
        sd, rd = make_basic_network()
        # reaction 1 is the exact reverse of reaction 0
        assert rd.get_reverse_rhash(sd, 0) == rd.rhash[1]
        assert rd.get_reverse_rhash(sd, 1) == rd.rhash[0]

    def test_hash_order_stable(self):
        assert (stable_species_hash(["B", "A"], ["C"])
                == stable_species_hash(["A", "B"], ["C"]))
        assert (stable_species_hash(["A"], ["B"])
                != stable_species_hash(["B"], ["A"]))

    def test_splice(self):
        sd, rd = make_basic_network()
        h2 = rd.rhash[2]
        rd.splice([0, 1])
        assert rd.nr == 1
        assert rd.rhash[0] == h2

    def test_format_rxn(self):
        sd, rd = make_basic_network()
        assert format_rxn(sd, rd, 2) == "2 C --> CC + [H][H]"
        assert format_rxn(sd, rd, 0, display_level=True) == "L1: C --> [CH3] + [H]"

    def test_init_network(self):
        sd, rd = init_network()
        assert sd.n == 0 and rd.nr == 0


class TestInsertInert:
    def test_single_inert(self):
        sd, rd = make_basic_network()
        insert_inert(rd, sd, ["[Ar]"])
        aid = sd.toInt["[Ar]"]
        # both unimolecular reactions converted to bimolecular
        assert rd.nr == 3
        assert rd.id_reacs[0][-1] == aid and rd.stoic_reacs[0] == [1, 1]
        assert rd.id_prods[0][-1] == aid
        # hash updated consistently
        assert rd.rhash[0] == rd.get_rhash(sd, 0)

    def test_multiple_inerts_create_channels(self):
        sd, rd = make_basic_network()
        insert_inert(rd, sd, ["[Ar]", "[He]"])
        # 1 uni reaction x 2 partners: one new channel + original modified
        assert rd.nr == 4
        # the two channels have different hashes (different partners)
        assert rd.rhash[0] != rd.rhash[3]
