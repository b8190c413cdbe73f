"""Sawtooth profile, BSON compatibility, misc extras."""
import numpy as np
import pytest

from kinetica_tpu.analysis.bson_compat import (load_arrhenius_params,
                                               load_bson, parse_bson)
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import SawtoothDirectProfile


class TestSawtooth:
    def test_shape(self):
        p = SawtoothDirectProfile(amplitude=100.0, period=2.0, X_mid=700.0,
                                  n_periods=3)
        assert p.t_end == 6.0
        vals = np.asarray(p.f(np.array([0.0, 1.0, 2.0, 3.0, 6.0])))
        np.testing.assert_allclose(vals, [600.0, 700.0, 600.0, 700.0, 800.0])

    def test_discrete_tstops_include_resets(self):
        p = SawtoothDirectProfile(amplitude=50.0, period=1.0, X_mid=500.0,
                                  n_periods=2)
        p.create_discrete_tstops(0.3)
        assert 1.0 in p.tstops and 2.0 in p.tstops

    def test_in_condition_set(self):
        cs = ConditionSet({"T": SawtoothDirectProfile(
            amplitude=100.0, period=2.0, X_mid=700.0, n_periods=2)},
            ts_update=0.25)
        assert cs.get_t_final() == 4.0
        assert cs.discrete_updates


class TestBSONCompat:
    def test_reference_arrhenius_params(self):
        # reads the actual reference repository artifact
        Ea, A = load_arrhenius_params(
            "/root/reference/examples/getting_started/arrhenius_params.bson")
        assert Ea.shape == (30,) and A.shape == (30,)
        assert (Ea >= 0).all() and (A > 0).all()
        # spot values within physical ranges (J/mol and prefactors)
        assert Ea.max() < 1e7 and A.max() < 1e20

    def test_roundtrip_simple_doc(self):
        import struct
        # hand-build {"x": 1.5}
        body = b"\x01x\x00" + struct.pack("<d", 1.5)
        doc = struct.pack("<i", 4 + len(body) + 1) + body + b"\x00"
        assert parse_bson(doc) == {"x": 1.5}
