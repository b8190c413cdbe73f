import numpy as np
import pytest

from kinetica_tpu.utils import TimeSeries, create_savepoints, tconvert


class TestTconvert:
    def test_identity(self):
        assert tconvert(1.0, "s", "s") == 1.0

    def test_minutes_to_seconds(self):
        assert tconvert(1.0, "mins", "s") == 60.0

    def test_factor_form(self):
        assert tconvert("hrs", "s") == 3600.0
        assert tconvert("ms", "s") == 1e-3

    def test_vector(self):
        np.testing.assert_allclose(tconvert([1.0, 2.0], "us", "s"), [1e-6, 2e-6])

    def test_unknown_unit(self):
        with pytest.raises(ValueError):
            tconvert(1.0, "fortnights", "s")

    def test_roundtrip(self):
        assert tconvert(tconvert(123.0, "days", "yrs"), "yrs", "days") == pytest.approx(123.0)


class TestCreateSavepoints:
    def test_basic(self):
        r = create_savepoints(0.0, 1.0, 0.25)
        np.testing.assert_allclose(r, [0.0, 0.25, 0.5, 0.75, 1.0])

    def test_endpoint_always_included(self):
        r = create_savepoints(0.0, 1.0, 0.3)
        assert r[-1] == 1.0

    def test_fp_error_compensation(self):
        # step from tconvert with fp noise, e.g. 3600.0000000001
        r = create_savepoints(0.0, 36000.0, 3600.0 + 1e-7)
        assert len(r) == 11
        assert r[-1] == 36000.0


class TestTimeSeries:
    def test_interpolation(self):
        ts = TimeSeries([0.0, 1.0, 2.0], [[0.0], [10.0], [20.0]])
        assert ts(0.5)[0] == pytest.approx(5.0)
        np.testing.assert_allclose(ts([0.5, 1.5])[:, 0], [5.0, 15.0])

    def test_clamping(self):
        ts = TimeSeries([0.0, 1.0], [1.0, 2.0])
        assert ts(-1.0) == 1.0
        assert ts(5.0) == 2.0

    def test_minmax(self):
        ts = TimeSeries([0.0, 1.0, 2.0], [3.0, -1.0, 2.0])
        assert ts.min() == -1.0
        assert ts.max() == 3.0


class TestProfiling:
    def test_timed_sections_and_report(self):
        from kinetica_tpu.utils.profiling import Timings, timed
        Timings.reset()
        Timings.enable(True)
        try:
            with timed("unit.section"):
                pass
            with timed("unit.section"):
                pass
            rep = Timings.report(log=False)
            assert rep["unit.section"]["count"] == 2
            assert rep["unit.section"]["total_s"] >= 0.0
        finally:
            Timings.enable(False)
            Timings.reset()

    def test_disabled_is_noop(self):
        from kinetica_tpu.utils.profiling import Timings, timed
        Timings.reset()
        assert not Timings.enabled()
        with timed("unit.never"):
            pass
        assert Timings.report(log=False) == {}

    def test_solve_records_chunk_dispatch_timings(self):
        import numpy as np
        from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
        from kinetica_tpu.conditions.condition_set import ConditionSet
        from kinetica_tpu.solving.methods import StaticODESolve, solve_network
        from kinetica_tpu.solving.params import ODESimulationParams
        from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network
        from kinetica_tpu.utils.profiling import Timings
        sd, rd, Ea, A = synthetic_pyrolysis_network(4)
        calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
        pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C4": 1.0},
                                   solve_chunks=True, solve_chunkstep=0.25,
                                   low_k_cutoff="none")
        Timings.reset()
        Timings.enable(True)
        try:
            res = solve_network(StaticODESolve(
                pars, ConditionSet({"T": 900.0}), calc), sd, rd)
            assert res.sol.success
            rep = Timings.report(log=False)
            assert rep["solve.chunk_dispatch"]["count"] >= 1
            assert rep["solve.calculator_setup"]["count"] == 1
        finally:
            Timings.enable(False)
            Timings.reset()
