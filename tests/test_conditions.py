"""Condition profile tests mirroring the reference's
test/Main/conditions.jl golden values, plus value() / solve() coverage the
reference lacks."""
import numpy as np
import pytest

from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import (DoubleRampGradientProfile,
                                              LinearDirectProfile,
                                              LinearGradientProfile,
                                              NullDirectProfile,
                                              NullGradientProfile,
                                              StaticConditionProfile)
from kinetica_tpu.solving.params import ODESimulationParams


class TestProfileConstruction:
    def test_static(self):
        p = StaticConditionProfile(10.0)
        assert p.value == 10.0 and p.is_static

    def test_null_direct(self):
        p = NullDirectProfile(X_start=300.0, t_end=10.0)
        assert p.X_start == 300.0 and p.t_end == 10.0
        assert float(p.f(5.0)) == pytest.approx(300.0)
        np.testing.assert_allclose(p.tstops, [10.0])

    def test_linear_direct(self):
        p = LinearDirectProfile(rate=50.0, X_start=300.0, X_end=500.0)
        assert p.t_end == pytest.approx(4.0)
        assert float(p.f(2.0)) == pytest.approx(400.0)
        assert float(p.f(-1.0)) == pytest.approx(300.0)
        assert float(p.f(99.0)) == pytest.approx(500.0)
        np.testing.assert_allclose(p.tstops, [4.0])

    def test_linear_direct_impossible_ramp(self):
        with pytest.raises(ValueError):
            LinearDirectProfile(rate=-50.0, X_start=300.0, X_end=500.0)

    def test_null_gradient(self):
        p = NullGradientProfile(X_start=300.0, t_end=10.0)
        assert float(p.grad(5.0)) == 0.0
        np.testing.assert_allclose(p.tstops, [10.0])

    def test_linear_gradient(self):
        p = LinearGradientProfile(rate=50.0, X_start=300.0, X_end=500.0)
        assert p.t_end == pytest.approx(4.0)
        assert float(p.grad(2.0)) == 50.0
        assert float(p.grad(5.0)) == 0.0
        assert float(p.value(2.0)) == pytest.approx(400.0)
        assert float(p.value(5.0)) == pytest.approx(500.0)

    def test_double_ramp(self):
        p = DoubleRampGradientProfile(
            X_start=300.0, t_start_plateau=5.0, rate1=10.0, X_mid=500.0,
            t_mid_plateau=3.0, rate2=-20.0, X_end=200.0, t_end_plateau=5.0)
        assert p.t_end == pytest.approx(48.0)
        np.testing.assert_allclose(p.tstops, [5.0, 25.0, 28.0, 43.0, 48.0])
        for t, g in [(1.0, 0.0), (15.0, 10.0), (27.0, 0.0), (35.0, -20.0),
                     (45.0, 0.0), (100.0, 0.0)]:
            assert float(p.grad(t)) == g
        # closed-form value checks
        for t, v in [(1.0, 300.0), (15.0, 400.0), (27.0, 500.0),
                     (35.5, 350.0), (45.0, 200.0)]:
            assert float(p.value(t)) == pytest.approx(v)

    def test_double_ramp_blended(self):
        p = DoubleRampGradientProfile(
            X_start=300.0, t_start_plateau=5.0, rate1=10.0, X_mid=500.0,
            t_mid_plateau=3.0, rate2=-20.0, X_end=200.0, t_end_plateau=5.0,
            t_blend=0.1)
        assert p.t_blend == 0.1
        np.testing.assert_allclose(
            p.tstops, [4.9, 5.1, 24.9, 25.1, 27.9, 28.1, 42.9, 43.1, 48.0])
        # gradient midpoint of blend = half rate
        assert float(p.grad(5.0)) == pytest.approx(5.0)
        # plateau/endpoint values exact
        assert float(p.value(4.9)) == pytest.approx(300.0)
        assert float(p.value(15.0)) == pytest.approx(400.0)
        assert float(p.value(26.0)) == pytest.approx(500.0)
        assert float(p.value(48.0)) == pytest.approx(200.0)
        # value matches numeric integral of grad
        ts = np.linspace(0.0, 48.0, 48001)
        g = np.asarray(p.grad(ts))
        numeric = 300.0 + np.concatenate([[0.0], np.cumsum((g[:-1] + g[1:]) / 2 * np.diff(ts))])
        np.testing.assert_allclose(np.asarray(p.value(ts)), numeric, atol=2e-3)

    def test_blended_discrete_tstops(self):
        p = DoubleRampGradientProfile(
            X_start=300.0, t_start_plateau=5.0, rate1=10.0, X_mid=500.0,
            t_mid_plateau=3.0, rate2=-20.0, X_end=200.0, t_end_plateau=5.0,
            t_blend=0.1)
        p.create_discrete_tstops(1.0)
        # stops only where profile varies, plus 0 and t_end
        assert p.tstops[0] == 0.0 and p.tstops[-1] == 48.0
        # no stops inside the stationary mid-plateau or end plateau
        assert not np.any((p.tstops > 25.5) & (p.tstops < 27.5))
        assert not np.any((p.tstops > 43.5) & (p.tstops < 47.5))


class TestConditionSet:
    def _cs(self, ts_update=None):
        return ConditionSet({
            "T": LinearDirectProfile(rate=50.0, X_start=300.0, X_end=500.0),
            "P": DoubleRampGradientProfile(
                X_start=1e5, t_start_plateau=1.0, rate1=1e3, X_mid=2e5,
                t_mid_plateau=10.0, rate2=-1e3, X_end=1e5, t_end_plateau=1.0,
                t_blend=0.1),
            "V": 1e3,
        }, ts_update=ts_update)

    def test_construction(self):
        cs = self._cs()
        assert set(cs.symbols) == {"T", "P", "V"}
        assert not cs.discrete_updates and cs.ts_update is None
        assert cs.get_profile("V").is_static

    def test_discrete(self):
        cs = self._cs(ts_update=1e-3)
        assert cs.discrete_updates and cs.ts_update == pytest.approx(1e-3)
        ts = cs.get_tstops()
        assert np.all(np.diff(ts) > 0)

    def test_invalid_profile(self):
        with pytest.raises(ValueError):
            ConditionSet({"X": "abc"})

    def test_accessors(self):
        cs = self._cs()
        ics = cs.get_initial_conditions()
        assert ics["T"] == 300.0 and ics["P"] == 1e5 and ics["V"] == 1e3
        assert cs.get_static_conditions() == {"V": 1e3}
        assert cs.get_t_final() == pytest.approx(212.0)

    def test_solve_and_minmax(self):
        cs = self._cs()
        pars = ODESimulationParams(tspan=(0.0, cs.get_t_final()),
                                   u0={"C": 1.0}, solve_chunks=False)
        cs.solve_variable_conditions(pars)
        T = cs.get_profile("T")
        assert T.minimum() == pytest.approx(300.0)
        assert T.maximum() == pytest.approx(500.0)
        P = cs.get_profile("P")
        assert P.maximum() == pytest.approx(2e5, rel=1e-6)
        # interpolation through solved series
        assert float(T.sol(2.0)) == pytest.approx(400.0)

    def test_conditions_at_traceable(self):
        import jax
        import jax.numpy as jnp
        cs = self._cs()

        @jax.jit
        def f(t):
            c = cs.conditions_at(t)
            return c["T"] + c["P"] * 0.0 + c["V"]

        assert float(f(2.0)) == pytest.approx(400.0 + 1e3)
