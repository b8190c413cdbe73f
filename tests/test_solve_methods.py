"""End-to-end solve_network tests across the method matrix.

Covers the solver-core test gap the reference leaves open (SURVEY.md §4):
chunked-vs-complete equality, discrete-vs-continuous agreement, and
cross-validation against scipy's BDF on the same mass-action system.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.conditions.condition_set import ConditionSet
from kinetica_tpu.conditions.profiles import LinearDirectProfile, LinearGradientProfile
from kinetica_tpu.core.network import RxData, SpeciesData
from kinetica_tpu.solving.filters import RxFilter
from kinetica_tpu.solving.methods import (StaticODESolve, VariableODESolve,
                                          solve_network)
from kinetica_tpu.solving.params import ODESimulationParams


def pyrolysis_network():
    sd = SpeciesData(["C", "[H]", "[CH3]", "[H][H]", "CC", "C=C"])
    rd = RxData.from_reactions(
        sd,
        reacs=[["C"], ["[CH3]", "[H]"], ["C", "[H]"], ["[CH3]", "[CH3]"],
               ["CC"], ["CC"]],
        prods=[["[CH3]", "[H]"], ["C"], ["[CH3]", "[H][H]"], ["CC"],
               ["C=C", "[H][H]"], ["[CH3]", "[CH3]"]],
        dH=[4.5, -4.5, 0.1, -3.8, 1.5, 3.8])
    Ea = np.array([3.6e5, 0.0, 4.0e4, 0.0, 3.2e5, 3.5e5])
    A = np.array([1e-8, 1e-12, 1e-13, 1e-12, 1e-7, 1e-8])
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    return sd, rd, calc


def scipy_reference(sd, rd, calc, conditions, tspan, u0_dict, n_eval=100):
    """Continuous-mode scipy BDF solution of the identical system."""
    from kinetica_tpu.models.mass_action import build_mass_action
    net = build_mass_action(rd, sd.n)
    u0 = np.zeros(sd.n)
    for smi, c in u0_dict.items():
        u0[sd.toInt[smi]] = c

    def k_of_t(t):
        conds = {s: (p.value if p.is_static else float(np.asarray(p.value(t))))
                 for s, p in zip(conditions.symbols, conditions.profiles)}
        return np.asarray(calc(**conds))

    def rhs(t, y):
        return np.asarray(net.rhs(jnp.asarray(y), jnp.asarray(k_of_t(t))))

    def jac(t, y):
        return np.asarray(net.jac(jnp.asarray(y), jnp.asarray(k_of_t(t))))

    t_eval = np.linspace(tspan[0], tspan[1], n_eval)
    sp = solve_ivp(rhs, tspan, u0, method="BDF", jac=jac, rtol=1e-10,
                   atol=1e-12, t_eval=t_eval)
    return t_eval, sp.y.T


class TestStaticSolve:
    def test_static_complete_vs_scipy(self):
        sd, rd, calc = pyrolysis_network()
        conditions = ConditionSet({"T": 900.0})
        pars = ODESimulationParams(tspan=(0.0, 10.0), u0={"C": 1.0},
                                   solve_chunks=False, save_interval=0.1)
        res = solve_network(StaticODESolve(pars, conditions, calc), sd, rd)
        assert res.sol.success
        t_ref, u_ref = scipy_reference(sd, rd, calc, conditions, (0.0, 10.0),
                                       {"C": 1.0})
        ours = res.sol(t_ref)
        assert np.max(np.abs(ours - u_ref)) < 1e-6

    def test_static_chunkwise_matches_complete(self):
        sd, rd, calc = pyrolysis_network()
        conditions = ConditionSet({"T": 900.0})
        pars_c = ODESimulationParams(tspan=(0.0, 10.0), u0={"C": 1.0},
                                     solve_chunks=False, save_interval=0.5)
        pars_ch = ODESimulationParams(tspan=(0.0, 10.0), u0={"C": 1.0},
                                      solve_chunks=True, solve_chunkstep=0.5)
        res_c = solve_network(StaticODESolve(pars_c, conditions, calc), sd, rd)
        res_ch = solve_network(StaticODESolve(pars_ch, conditions, calc), sd, rd)
        assert res_ch.sol.success
        # identical save grids by construction
        np.testing.assert_allclose(res_ch.sol.t, res_c.sol.t, atol=1e-12)
        assert np.max(np.abs(res_ch.sol.u - res_c.sol.u)) < 1e-7

    def test_rejects_variable_conditions(self):
        sd, rd, calc = pyrolysis_network()
        conditions = ConditionSet(
            {"T": LinearDirectProfile(rate=50.0, X_start=300.0, X_end=400.0)})
        pars = ODESimulationParams(tspan=(0.0, 2.0), u0={"C": 1.0})
        with pytest.raises(ValueError):
            StaticODESolve(pars, conditions, calc)


class TestVariableSolve:
    def _setup(self, ts_update=None, chunks=True, t_ramp_end=1000.0):
        sd, rd, calc = pyrolysis_network()
        conditions = ConditionSet(
            {"T": LinearGradientProfile(rate=50.0, X_start=300.0,
                                        X_end=t_ramp_end)},
            ts_update=ts_update)
        tf = conditions.get_t_final()
        pars = ODESimulationParams(
            tspan=(0.0, tf), u0={"C": 1.0},
            solve_chunks=chunks, solve_chunkstep=tf / 28.0,
            save_interval=tf / 28.0 if chunks else tf / 100.0)
        return sd, rd, calc, conditions, pars

    def test_continuous_complete_vs_scipy(self):
        sd, rd, calc, conditions, pars = self._setup(chunks=False)
        res = solve_network(VariableODESolve(pars, conditions, calc), sd, rd)
        assert res.sol.success
        t_ref, u_ref = scipy_reference(sd, rd, calc, conditions, pars.tspan,
                                       {"C": 1.0})
        assert np.max(np.abs(res.sol(t_ref) - u_ref)) < 1e-6
        # vc trace recorded
        assert "T" in res.sol.vcs
        assert res.sol.vcs["T"][0] == pytest.approx(300.0)
        assert res.sol.vcs["T"][-1] == pytest.approx(1000.0)

    def test_discrete_chunkwise_close_to_continuous(self):
        # the reference's headline property: discrete updates are "almost
        # indistinguishable from the continuous formalism" at small ts_update
        sd, rd, calc, conditions_d, pars_d = self._setup(ts_update=0.1)
        res_d = solve_network(VariableODESolve(pars_d, conditions_d, calc), sd, rd)
        assert res_d.sol.success
        assert res_d.sol.k is not None

        sd2, rd2, calc2, conditions_c, pars_c = self._setup(chunks=False)
        res_c = solve_network(VariableODESolve(pars_c, conditions_c, calc2), sd2, rd2)
        diff = np.max(np.abs(res_d.sol(res_c.sol.t) - res_c.sol.u))
        assert diff < 5e-4

    def test_chunkwise_continuous(self):
        sd, rd, calc, conditions, pars = self._setup(chunks=True)
        res = solve_network(VariableODESolve(pars, conditions, calc), sd, rd)
        assert res.sol.success
        sdc, rdc, calcc, conditions_c, pars_c = self._setup(chunks=False)
        res_c = solve_network(VariableODESolve(pars_c, conditions_c, calcc), sdc, rdc)
        # compare at the chunk grid against the finely-saved complete solve
        # (interpolating the coarse chunk grid would dominate the error)
        diff = np.max(np.abs(res.sol.u - res_c.sol(res.sol.t)))
        assert diff < 1e-5

    def test_discrete_complete(self):
        sd, rd, calc, conditions, pars = self._setup(ts_update=0.1, chunks=False)
        res = solve_network(VariableODESolve(pars, conditions, calc), sd, rd)
        assert res.sol.success

    def test_requires_discrete_or_continuous_capable(self):
        sd, rd, calc = pyrolysis_network()
        calc.allows_continuous = False
        conditions = ConditionSet(
            {"T": LinearDirectProfile(rate=50.0, X_start=300.0, X_end=400.0)})
        pars = ODESimulationParams(tspan=(0.0, 2.0), u0={"C": 1.0})
        with pytest.raises(ValueError):
            VariableODESolve(pars, conditions, calc)


class TestFiltersAndCutoff:
    def test_filter_removes_reactions(self):
        sd, rd, calc = pyrolysis_network()
        conditions = ConditionSet({"T": 900.0})
        pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C": 1.0},
                                   solve_chunks=False, low_k_cutoff="none")
        # remove ethane cracking channels (reactions involving CC as reactant)
        filt = RxFilter([lambda sd_, rd_: np.array(
            [sd_.toInt["CC"] in rd_.id_reacs[i] for i in range(rd_.nr)])])
        res = solve_network(StaticODESolve(pars, conditions, calc, filt), sd, rd)
        assert res.rd.nr == 4
        assert rd.nr == 6  # original untouched (copy_network)

    def test_low_k_cutoff_auto(self):
        sd, rd, calc = pyrolysis_network()
        # at low T the high-Ea channels are dead; auto cutoff removes them
        conditions = ConditionSet({"T": 300.0})
        pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C": 1.0},
                                   solve_chunks=False)
        res = solve_network(StaticODESolve(pars, conditions, calc), sd, rd)
        assert res.rd.nr < 6

    def test_return_integrator(self):
        sd, rd, calc = pyrolysis_network()
        conditions = ConditionSet({"T": 900.0})
        pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"C": 1.0},
                                   solve_chunks=False)
        integ = solve_network(StaticODESolve(pars, conditions, calc), sd, rd,
                              return_integrator=True)
        res = integ.solve_segment(0.0, 1.0, np.linspace(0.1, 1.0, 10))
        assert int(res.status) == 1


class TestSaveLoad:
    def test_round_trip(self, tmp_path):
        from kinetica_tpu.analysis.io import load_output, save_output
        sd, rd, calc = pyrolysis_network()
        conditions = ConditionSet(
            {"T": LinearGradientProfile(rate=50.0, X_start=300.0, X_end=1000.0)},
            ts_update=0.5)
        tf = conditions.get_t_final()
        pars = ODESimulationParams(tspan=(0.0, tf), u0={"C": 1.0},
                                   solve_chunks=True, solve_chunkstep=tf / 14,
                                   linsolve="inv", lu_drift_tol=0.2,
                                   jac_dtype="float64")
        res = solve_network(VariableODESolve(pars, conditions, calc), sd, rd)
        path = str(tmp_path / "out.npz")
        save_output(res, path)
        back = load_output(path)
        # every solver knob round-trips (TPU extensions included)
        assert back.pars.linsolve == "inv"
        assert back.pars.lu_drift_tol == 0.2
        assert back.pars.jac_dtype == "float64"
        assert back.rd.nr == res.rd.nr
        assert back.sd.toInt == res.sd.toInt
        np.testing.assert_allclose(back.sol.t, res.sol.t)
        np.testing.assert_allclose(back.sol.u, res.sol.u)
        np.testing.assert_allclose(back.sol_k.u, res.sol_k.u)
        assert back.pars.tspan == res.pars.tspan
        assert back.conditions.get_profile("T").rate == 50.0
        np.testing.assert_allclose(back.sol.vcs["T"], res.sol.vcs["T"])
        # interpolation works after load
        assert back.sol(tf / 2).shape == (sd.n,)


class TestChunkDispatchGrouping:
    def test_grouped_dispatch_equals_single_scan(self):
        """chunks_per_dispatch grouping (accelerator execution-deadline
        guard) is bit-neutral: carry (u, worst) threads across groups."""
        from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
        from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network
        sd, rd, Ea, A = synthetic_pyrolysis_network(6)
        conditions = ConditionSet(
            {"T": LinearGradientProfile(rate=50.0, X_start=600.0, X_end=950.0)},
            ts_update=0.5)
        tf = conditions.get_t_final()
        results = []
        for cpd in (None, 3, 1):
            calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
            pars = ODESimulationParams(tspan=(0.0, tf), u0={"C6": 1.0},
                                       solve_chunks=True,
                                       solve_chunkstep=tf / 14,
                                       low_k_cutoff="none",
                                       chunks_per_dispatch=cpd)
            res = solve_network(VariableODESolve(pars, conditions, calc),
                                sd, rd)
            assert res.sol.success
            results.append(np.asarray(res.sol.u))
        np.testing.assert_array_equal(results[0], results[1])
        np.testing.assert_array_equal(results[0], results[2])


def test_float32_state_dtype_solves():
    """Regression: f32 state + f64 time carry (h) must trace cleanly.

    BDFResults.h is always in the time dtype (f64 under x64); the chunk
    loops used to initialise the scan h-carry in the state dtype, which
    made every float32 chunkwise solve fail at trace time with a scan
    carry type mismatch.
    """
    from kinetica_tpu.parallel.batching import EnsembleProblem
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

    sd, rd, Ea, A = synthetic_pyrolysis_network(6)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    mk = lambda r: ConditionSet({"T": LinearGradientProfile(
        rate=r, X_start=500.0, X_end=500.0 + r * 4)}, ts_update=0.25)
    pars = ODESimulationParams(tspan=(0.0, 4.0), u0={"C6": 1.0},
                               solve_chunks=True, solve_chunkstep=1.0,
                               low_k_cutoff="none", dtype="float32",
                               abstol=1e-6, reltol=1e-4)
    res = solve_network(VariableODESolve(pars, mk(60.0), calc), sd, rd)
    assert res.sol.success
    ens = EnsembleProblem(VariableODESolve(pars, mk(60.0), calc),
                          sd, rd).solve(conditions_list=[mk(55.0), mk(60.0)])
    assert ens.success


def test_nonnegative_projection_is_kinetics_only():
    """The generic ops-level bdf_solve must not clamp states by default."""
    import jax.numpy as jnp
    from kinetica_tpu.ops import bdf

    Adec = -jnp.eye(2)
    rhs = lambda t, y, a: Adec @ y
    jac = lambda t, y, a: Adec
    res = bdf.bdf_solve(rhs, jac, jnp.array([-1.0, 1.0]), 0.0, 1.0,
                        jnp.array([1.0]), rtol=1e-8, atol=1e-10, args=0.0)
    assert int(res.status) == bdf.DONE
    np.testing.assert_allclose(np.asarray(res.ys[0]),
                               [-np.exp(-1.0), np.exp(-1.0)], atol=1e-7)


def test_jac_dtype_float32_matches_full_precision():
    """jac_dtype='float32' (the accelerator default) must not change the
    converged solution beyond tolerance: J is only a Newton preconditioner;
    the fixed point is anchored by the f64 rhs residual."""
    from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network
    sd, rd, Ea, A = synthetic_pyrolysis_network(6)
    conditions = ConditionSet(
        {"T": LinearGradientProfile(rate=100.0, X_start=600.0, X_end=1100.0)},
        ts_update=0.25)
    tf = conditions.get_t_final()
    results = []
    for jd in ("float64", "float32"):
        calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
        pars = ODESimulationParams(tspan=(0.0, tf), u0={"C6": 1.0},
                                   solve_chunks=True, solve_chunkstep=tf / 10,
                                   low_k_cutoff="none", jac_dtype=jd)
        res = solve_network(VariableODESolve(pars, conditions, calc), sd, rd)
        assert res.sol.success
        results.append(np.asarray(res.sol.u))
    # same tolerances, same model; only the preconditioner differs
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6, atol=1e-9)


def test_jac_dtype_validation():
    with pytest.raises(ValueError, match="jac_dtype"):
        ODESimulationParams(tspan=(0.0, 1.0), u0={"A": 1.0}, jac_dtype="f16")


def test_linsolve_params_validation():
    with pytest.raises(ValueError, match="linsolve"):
        ODESimulationParams(tspan=(0.0, 1.0), u0={"A": 1.0}, linsolve="qr")
    with pytest.raises(ValueError, match="lu_drift_tol"):
        ODESimulationParams(tspan=(0.0, 1.0), u0={"A": 1.0},
                            lu_drift_tol=1.5)


def test_linsolve_param_reaches_solver():
    """pars.linsolve="inv_fused" routes the production solve through the
    fused Pallas Newton-solve kernel (interpret mode on CPU) and matches
    the default path."""
    sd, rd, calc = pyrolysis_network()
    conditions = ConditionSet({"T": 1100.0})
    common = dict(tspan=(0.0, 1.0), u0={"C": 1.0}, solve_chunks=True,
                  solve_chunkstep=0.5, low_k_cutoff="none")
    res_def = solve_network(
        StaticODESolve(ODESimulationParams(**common), conditions, calc),
        sd, rd, copy_network=True)
    res_fus = solve_network(
        StaticODESolve(ODESimulationParams(linsolve="inv_fused", **common),
                       conditions, calc), sd, rd, copy_network=True)
    assert res_def.sol.success and res_fus.sol.success
    np.testing.assert_allclose(np.asarray(res_fus.sol.u),
                               np.asarray(res_def.sol.u),
                               rtol=1e-6, atol=1e-9)


def test_jac_policy_param():
    """jac_policy="always" (J+LU at every attempt) matches the default
    lazy-cache policy on a chunkwise variable-T solve; bad values are
    rejected at construction."""
    with pytest.raises(ValueError, match="jac_policy"):
        ODESimulationParams(tspan=(0.0, 1.0), u0={"A": 1.0},
                            jac_policy="sometimes")
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network
    sd, rd, Ea, A = synthetic_pyrolysis_network(5)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    conditions = ConditionSet(
        {"T": LinearGradientProfile(rate=50.0, X_start=500.0, X_end=600.0)})
    common = dict(tspan=(0.0, 2.0), u0={"C5": 1.0}, solve_chunks=True,
                  solve_chunkstep=0.5, low_k_cutoff="none")
    outs = []
    for pol in ("lazy", "always"):
        res = solve_network(
            VariableODESolve(ODESimulationParams(jac_policy=pol, **common),
                             conditions, calc), sd, rd, copy_network=True)
        assert res.sol.success
        outs.append(np.asarray(res.sol.u))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-6, atol=1e-8)


class TestJacSparseParams:
    """pars.jac / pars.sparse have defined behaviour (params.jl:55-110)."""

    def test_sparse_rejected(self):
        with pytest.raises(ValueError, match="sparse"):
            ODESimulationParams(tspan=(0.0, 1.0), u0={"C": 1.0}, sparse=True)

    def test_autodiff_jacobian_matches_analytic(self):
        sd, rd, calc = pyrolysis_network()
        conditions = ConditionSet({"T": 1200.0})
        common = dict(tspan=(0.0, 2.0), u0={"C": 1.0}, solve_chunks=True,
                      solve_chunkstep=0.25, low_k_cutoff="none")
        res_an = solve_network(
            StaticODESolve(ODESimulationParams(jac=True, **common),
                           conditions, calc), sd, rd)
        res_ad = solve_network(
            StaticODESolve(ODESimulationParams(jac=False, **common),
                           conditions, calc), sd, rd)
        assert res_ad.sol.success
        # the Jacobian only preconditions Newton: same fixed point, so the
        # two solves agree at solution accuracy
        np.testing.assert_allclose(res_ad.sol.u, res_an.sol.u,
                                   rtol=1e-6, atol=1e-10)
