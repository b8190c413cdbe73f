"""Integrator core tests: accuracy vs scipy, stops semantics, vmap, stats."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from kinetica_tpu.ops.bdf import DONE, bdf_solve
from kinetica_tpu.ops.interp import left_constant_lookup


def robertson_rhs(t, y):
    return jnp.array([
        -0.04 * y[0] + 1e4 * y[1] * y[2],
        0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
        3e7 * y[1] ** 2])


def robertson_jac(t, y):
    return jnp.array([
        [-0.04, 1e4 * y[2], 1e4 * y[1]],
        [0.04, -1e4 * y[2] - 6e7 * y[1], -1e4 * y[1]],
        [0.0, 6e7 * y[1], 0.0]])


class TestBDFAccuracy:
    def test_linear_decay_exact(self):
        def rhs(t, y):
            return -y

        def jac(t, y):
            return -jnp.eye(1, dtype=y.dtype)

        saveat = jnp.linspace(0.1, 1.0, 10)
        res = bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 1.0, saveat,
                        rtol=1e-10, atol=1e-12, max_steps=2000)
        assert int(res.status) == DONE
        np.testing.assert_allclose(np.asarray(res.ys[:, 0]),
                                   np.exp(-np.asarray(saveat)), rtol=1e-8)

    @pytest.mark.parametrize("lu_precision", ["mixed", "full"])
    def test_robertson_vs_scipy(self, lu_precision):
        y0 = jnp.array([1.0, 0.0, 0.0])
        saveat = jnp.asarray(np.logspace(-5, 5, 30))
        res = bdf_solve(robertson_rhs, robertson_jac, y0, 0.0, 1e5, saveat,
                        rtol=1e-8, atol=1e-10, lu_precision=lu_precision)
        assert int(res.status) == DONE
        sp = solve_ivp(
            lambda t, y: np.asarray(robertson_rhs(t, jnp.asarray(y))),
            (0, 1e5), np.array([1.0, 0.0, 0.0]), method="BDF",
            jac=lambda t, y: np.asarray(robertson_jac(t, jnp.asarray(y))),
            rtol=1e-8, atol=1e-10, t_eval=np.asarray(saveat))
        # mole-fraction-style error: absolute error relative to total
        err = np.max(np.abs(np.asarray(res.ys) - sp.y.T))
        assert err < 1e-5
        # final state tight agreement
        np.testing.assert_allclose(np.asarray(res.y_final), sp.y[:, -1],
                                   rtol=1e-6, atol=1e-12)

    def test_stiff_transient_initial_conditions(self):
        # the y0 that stresses h_min handling (fast initial transient)
        y0 = jnp.array([0.5, 0.25, 0.25])
        saveat = jnp.asarray(np.logspace(-5, 5, 20))
        res = bdf_solve(robertson_rhs, robertson_jac, y0, 0.0, 1e5, saveat,
                        rtol=1e-8, atol=1e-10)
        assert int(res.status) == DONE
        sp = solve_ivp(
            lambda t, y: np.asarray(robertson_rhs(t, jnp.asarray(y))),
            (0, 1e5), np.asarray(y0), method="BDF",
            jac=lambda t, y: np.asarray(robertson_jac(t, jnp.asarray(y))),
            rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res.y_final), sp.y[:, -1],
                                   rtol=1e-6, atol=1e-12)


class TestBDFStops:
    def test_rate_switch_at_stop(self):
        # k: 1 for t in [0,1), 10 for t >= 1 — left-anchored lookup
        tstops = jnp.array([0.0, 1.0])
        ktab = jnp.array([[1.0], [10.0]])

        def rhs(t, y):
            return -left_constant_lookup(t, tstops, ktab)[0] * y

        def jac(t, y):
            return (-left_constant_lookup(t, tstops, ktab)[0]
                    * jnp.eye(1, dtype=y.dtype))

        sv = jnp.linspace(0.25, 2.0, 8)
        res = bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 2.0, sv,
                        rtol=1e-10, atol=1e-12, stops=jnp.array([1.0]))
        assert int(res.status) == DONE
        t = np.asarray(sv)
        exact = np.where(t <= 1.0, np.exp(-t), np.exp(-1.0) * np.exp(-10 * (t - 1)))
        np.testing.assert_allclose(np.asarray(res.ys[:, 0]), exact, rtol=1e-5)

    def test_without_stops_is_less_accurate_or_equal(self):
        # sanity: the stops mechanism exists to protect discontinuities
        tstops = jnp.array([0.0, 1.0])
        ktab = jnp.array([[1.0], [10.0]])

        def rhs(t, y):
            return -left_constant_lookup(t, tstops, ktab)[0] * y

        def jac(t, y):
            return (-left_constant_lookup(t, tstops, ktab)[0]
                    * jnp.eye(1, dtype=y.dtype))

        sv = jnp.array([2.0])
        exact = np.exp(-1.0) * np.exp(-10.0)
        res_s = bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 2.0, sv,
                          rtol=1e-8, atol=1e-12, stops=jnp.array([1.0]))
        err_s = abs(float(res_s.ys[0, 0]) - exact) / exact
        assert err_s < 1e-4


class TestBDFBatching:
    def test_vmap_matches_individual(self):
        saveat = jnp.asarray(np.logspace(-5, 5, 10))
        y0b = jnp.stack([jnp.array([1.0, 0.0, 0.0]),
                         jnp.array([0.5, 0.25, 0.25]),
                         jnp.array([0.9, 0.05, 0.05])])
        solve1 = lambda y: bdf_solve(robertson_rhs, robertson_jac, y, 0.0, 1e5,
                                     saveat, rtol=1e-8, atol=1e-10)
        out = jax.vmap(solve1)(y0b)
        assert np.all(np.asarray(out.status) == DONE)
        for i in range(3):
            single = solve1(y0b[i])
            np.testing.assert_allclose(np.asarray(out.ys[i]),
                                       np.asarray(single.ys), rtol=1e-9, atol=1e-14)


class TestBDFChunked:
    """Async-chunk mode (``chunks=``): the whole chunkwise-local-time
    horizon in one while_loop with in-loop chunk transitions."""

    @staticmethod
    def _decay_fns():
        # dy/dt = -k(t_global) y with k(t) = 1 + 0.5 t; exact
        # y(t) = exp(-(t + t^2/4))
        def prepare(t_stage, t_start, a):
            off, _ = a
            return 1.0 + 0.5 * (off + t_stage)

        def rhs(t, y, pre):
            return -pre * y

        def jac(t, y, pre):
            return -pre * jnp.eye(1, dtype=y.dtype)

        return prepare, rhs, jac

    def test_chunked_matches_exact(self):
        prepare, rhs, jac = self._decay_fns()
        saveat = jnp.array([0.5, 1.0])
        res = bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 1.0, saveat,
                        rtol=1e-10, atol=1e-12, prepare=prepare,
                        chunks=4, chunk_offsets=jnp.arange(4.0))
        assert int(res.status) == DONE
        assert res.ys.shape == (4, 2, 1)
        tq = (np.arange(4)[:, None] + np.array([0.5, 1.0])[None]).reshape(-1)
        exact = np.exp(-(tq + 0.25 * tq ** 2))
        np.testing.assert_allclose(np.asarray(res.ys).reshape(-1), exact,
                                   rtol=1e-7)
        # step counters accumulate across the whole horizon
        assert int(res.n_steps) > 4

    def test_chunked_full_stop_rows_guarded(self):
        """Fully-populated chunk-local stop rows must not leak the next
        chunk's stops into this chunk (internal +inf guard column)."""
        tstops = jnp.asarray(np.arange(0, 4.0, 0.5))
        kvals = np.where(np.arange(8) % 2 == 0, 1.0, 3.0)
        ktab = jnp.asarray(kvals)[:, None]

        def prepare(t_stage, t_start, a):
            off, _ = a
            return left_constant_lookup(off + t_start, tstops, ktab)[0]

        def rhs(t, y, pre):
            return -pre * y

        def jac(t, y, pre):
            return -pre * jnp.eye(1, dtype=y.dtype)

        rows = jnp.full((4, 1), 0.5)   # one interior stop, NO inf padding
        saveat = jnp.array([0.5, 1.0])
        res = bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 1.0, saveat,
                        rtol=1e-10, atol=1e-12, stops=rows, prepare=prepare,
                        chunks=4, chunk_offsets=jnp.arange(4.0))
        assert int(res.status) == DONE
        cum = np.concatenate([[0.0], np.cumsum(kvals * 0.5)])
        exact = np.exp(-cum[1:9])      # states at t = 0.5, 1.0, ..., 4.0
        np.testing.assert_allclose(np.asarray(res.ys).reshape(-1), exact,
                                   rtol=1e-6)

    def test_chunked_max_steps_bounds_total(self):
        prepare, rhs, jac = self._decay_fns()
        res = bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 1.0,
                        jnp.array([1.0]), rtol=1e-12, atol=1e-14,
                        prepare=prepare, max_steps=6,
                        chunks=8, chunk_offsets=jnp.arange(8.0))
        assert int(res.status) != DONE

    def test_chunked_requires_prepare_and_offsets(self):
        _, rhs, jac = self._decay_fns()
        with pytest.raises(ValueError, match="chunks="):
            bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 1.0,
                      jnp.array([1.0]), chunks=4)


class TestBDFOptions:
    def test_nonnegative(self):
        # Aggressive decay that can overshoot below zero without the guard
        def rhs(t, y):
            return -50.0 * y

        def jac(t, y):
            return -50.0 * jnp.eye(1, dtype=y.dtype)

        sv = jnp.linspace(0.1, 1.0, 5)
        res = bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 1.0, sv,
                        rtol=1e-6, atol=1e-8, nonnegative=True)
        assert int(res.status) == DONE
        assert np.all(np.asarray(res.ys) >= 0.0)

    def test_max_steps_failure(self):
        def rhs(t, y):
            return -y

        def jac(t, y):
            return -jnp.eye(1, dtype=y.dtype)

        res = bdf_solve(rhs, jac, jnp.array([1.0]), 0.0, 1e6,
                        jnp.array([1e6]), rtol=1e-12, atol=1e-14, max_steps=3)
        assert int(res.status) != DONE


def test_lu_drift_tol_reduces_refactors():
    """Wider c-drift tolerance must cut LU refactor counts (the factor
    path is gated on it) without changing the solution beyond noise."""
    A = jnp.asarray([[-1.0, 0.3, 0.0], [0.2, -5.0, 0.1], [0.0, 0.4, -0.2]])
    rhs = lambda t, y, a: A @ y
    jac = lambda t, y, a: A
    saveat = jnp.linspace(0.2, 4.0, 12)
    res = {}
    for tol in (0.0, 0.25):
        res[tol] = bdf_solve(rhs, jac, jnp.ones(3), 0.0, 4.0, saveat,
                                 rtol=1e-9, atol=1e-12, lu_drift_tol=tol,
                                 args=0.0)
        assert int(res[tol].status) == DONE
    assert int(res[0.25].n_lu) < int(res[0.0].n_lu)
    np.testing.assert_allclose(np.asarray(res[0.25].ys),
                               np.asarray(res[0.0].ys),
                               rtol=1e-7, atol=1e-11)


class TestWarmStart:
    """Cross-segment warm start: resuming (D, order, n_equal_steps) must
    beat a cold order-1 restart at every boundary while agreeing with the
    single-solve result (reference reinit! drops this state,
    methods.jl:819 — this is deliberately better than parity)."""

    def _run_segments(self, warm, nseg=10, tf=100.0):
        from kinetica_tpu.ops.bdf import MAX_ORDER, time_dtype

        seg = tf / nseg
        u = jnp.array([1.0, 0.0, 0.0])
        h = jnp.asarray(jnp.nan, time_dtype(u.dtype))
        D = jnp.zeros((MAX_ORDER + 3, 3), u.dtype)
        order = jnp.asarray(0, jnp.int32)
        neq = jnp.asarray(0, jnp.int32)
        total = 0
        for _ in range(nseg):
            res = bdf_solve(robertson_rhs, robertson_jac, u, 0.0, seg,
                            jnp.array([seg]), rtol=1e-8, atol=1e-10,
                            first_step=h,
                            warm_start=(D, order, neq) if warm else None)
            assert int(res.status) == DONE
            u, h = res.y_final, res.h
            D, order, neq = res.D, res.order, res.n_equal_steps
            total += int(res.n_steps)
        return total, np.asarray(u)

    def test_warm_start_cuts_restart_ramp(self):
        ref = bdf_solve(robertson_rhs, robertson_jac,
                        jnp.array([1.0, 0.0, 0.0]), 0.0, 100.0,
                        jnp.array([100.0]), rtol=1e-8, atol=1e-10)
        steps_cold, u_cold = self._run_segments(warm=False)
        steps_warm, u_warm = self._run_segments(warm=True)
        # the warm path must recover a large part of the restart penalty
        assert steps_warm < steps_cold - 0.5 * (steps_cold
                                                - int(ref.n_steps))
        np.testing.assert_allclose(u_warm, np.asarray(ref.y_final),
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(u_warm, u_cold, rtol=1e-6, atol=1e-12)

    def test_invalid_carry_falls_back_cold(self):
        """order=0 / NaN-h carries must reproduce the cold start exactly."""
        from kinetica_tpu.ops.bdf import MAX_ORDER, time_dtype

        u0 = jnp.array([1.0, 0.0, 0.0])
        cold = bdf_solve(robertson_rhs, robertson_jac, u0, 0.0, 1.0,
                         jnp.array([1.0]), rtol=1e-8, atol=1e-10)
        warm0 = (jnp.zeros((MAX_ORDER + 3, 3), u0.dtype),
                 jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        res = bdf_solve(robertson_rhs, robertson_jac, u0, 0.0, 1.0,
                        jnp.array([1.0]), rtol=1e-8, atol=1e-10,
                        first_step=jnp.asarray(jnp.nan,
                                               time_dtype(u0.dtype)),
                        warm_start=warm0)
        assert int(res.n_steps) == int(cold.n_steps)
        np.testing.assert_array_equal(np.asarray(res.y_final),
                                      np.asarray(cold.y_final))


def test_rms_norm_f64_survives_f32_range():
    """TPU's emulated f64 has f32 dynamic range: naive mean(x*x) of stiff
    rate quotients (~1e19) overflows the double-float head to NaN, which
    poisons select_initial_step's h and — since NaN fails every gate —
    wedged lanes at t0 until max_steps. The scale-invariant norm must
    return the true magnitude without squaring anything above 1."""
    from kinetica_tpu.ops.bdf import _rms_norm_f64

    x = jnp.full(16, 1e19)
    out = float(_rms_norm_f64(x))
    assert np.isfinite(out)
    np.testing.assert_allclose(out, 1e19, rtol=1e-12)
    assert float(_rms_norm_f64(jnp.zeros(4))) == 0.0


def test_c_lu_tracks_factorization_not_attempts():
    """c_lu must remember the c at which the LU was last BUILT. Overwriting
    it with every attempt's c lets sub-tolerance per-step drifts accumulate
    forever without a refactor (observed: saturated lanes creeping at a
    stale LU with n_lu frozen at 1). On a problem whose h grows steadily,
    a tight drift tolerance must keep refactoring as cumulative drift
    crosses it."""
    A = jnp.asarray([[-1.0, 0.3, 0.0], [0.2, -5.0, 0.1], [0.0, 0.4, -0.2]])
    rhs = lambda t, y, a: A @ y  # noqa: E731
    jac = lambda t, y, a: A  # noqa: E731
    res = bdf_solve(rhs, jac, jnp.ones(3), 0.0, 40.0,
                    jnp.linspace(1.0, 40.0, 8), rtol=1e-9, atol=1e-12,
                    lu_drift_tol=0.05, args=0.0)
    assert int(res.status) == DONE
    # h ramps from ~1e-4 to ~10 over this solve: cumulative c drift crosses
    # 5% many times, so a correct tracker refactors many times.
    assert int(res.n_lu) > 10


def test_nan_poisoned_state_aborts_fast():
    """A NaN in the controller state can never recover (NaN comparisons
    fail every gate), so the lane must abort with FAIL_H_UNDERFLOW instead
    of spinning to max_steps."""
    from kinetica_tpu.ops.bdf import FAIL_H_UNDERFLOW

    def rhs(t, y, a):
        # Blows up to NaN immediately: y' = sqrt(y - 2) with y0 = 1.
        return jnp.sqrt(y - 2.0)

    def jac(t, y, a):
        return (0.5 / jnp.sqrt(y - 2.0))[:, None] * jnp.eye(1, dtype=y.dtype)

    res = bdf_solve(rhs, jac, jnp.ones(1), 0.0, 1.0, jnp.array([1.0]),
                    rtol=1e-8, atol=1e-10, max_steps=5000, args=0.0)
    assert int(res.status) == FAIL_H_UNDERFLOW
    assert int(res.n_steps) < 100
