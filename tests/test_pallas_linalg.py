"""Tests for the Pallas Gauss-Jordan inverse and the "inv" Newton path.

Runs the kernel in interpreter mode (tests execute on the CPU backend;
on TPU the same kernel compiles via Mosaic — exercised by bench.py and the
driver's entry checks).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinetica_tpu.ops import bdf
from kinetica_tpu.ops.linalg import newton_factor, newton_solve, resolve_linsolve
from kinetica_tpu.ops.pallas_linalg import MAX_PALLAS_BATCH, gj_inverse


@pytest.mark.parametrize("n", [2, 5, 8, 49, 100, 128])
def test_gj_inverse_matches_numpy(n):
    rng = np.random.default_rng(n)
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    Minv = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    ref = np.linalg.inv(A)
    assert np.abs(Minv - ref).max() / np.abs(ref).max() < 1e-4


@pytest.mark.parametrize("n", [129, 200])
def test_gj_inverse_multitile(n):
    # n > one 128-lane tile: each augmented half spans 2 lane tiles
    rng = np.random.default_rng(n)
    A = np.eye(n) + 0.05 * rng.standard_normal((n, n))
    Minv = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    ref = np.linalg.inv(A)
    assert np.abs(Minv - ref).max() / np.abs(ref).max() < 1e-4


def test_gj_inverse_needs_pivoting():
    # zero diagonal: fails without partial pivoting
    A = np.array([[0.0, 2.0], [1.0, 0.0]])
    Minv = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    assert np.abs(Minv - np.linalg.inv(A)).max() < 1e-6


def test_gj_inverse_singular_is_finite():
    A = np.zeros((3, 3))
    Minv = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    assert np.all(np.isfinite(Minv))


def test_gj_inverse_batch_chunking():
    # force the > MAX_PALLAS_BATCH chunked path
    B = MAX_PALLAS_BATCH + 3
    rng = np.random.default_rng(0)
    A = np.eye(6)[None] + 0.1 * rng.standard_normal((B, 6, 6))
    from kinetica_tpu.ops.pallas_linalg import _gj_call
    Minv = np.asarray(_gj_call(jnp.asarray(A), interpret=True))
    ref = np.linalg.inv(A)
    assert np.abs(Minv - ref).max() < 1e-4


def test_gj_inverse_rejects_wide():
    from kinetica_tpu.ops.pallas_linalg import MAX_PALLAS_N
    with pytest.raises(ValueError):
        gj_inverse(jnp.eye(MAX_PALLAS_N + 1), interpret=True)


def test_resolve_linsolve():
    # auto resolves per backend: "lu" on CPU, "inv_gated" on accelerators
    expected = "lu" if jax.default_backend() == "cpu" else "inv_gated"
    assert resolve_linsolve("auto", 49) == expected
    assert resolve_linsolve("lu", 49) == "lu"
    assert resolve_linsolve("inv", 49) == "inv"
    assert resolve_linsolve("auto", 600) == "lu"   # > MAX_PALLAS_N (512)


def test_newton_inv_path_solves():
    """The "inv" factor/solve pair must solve (I - cJ) dy = b accurately.

    Uses jnp.linalg.inv semantics through the same newton_solve refinement
    machinery the BDF loop uses (gj_inverse in interpret mode is too slow
    to embed in a solver loop on CPU; the algebra is identical).
    """
    rng = np.random.default_rng(1)
    n = 12
    J = jnp.asarray(rng.standard_normal((n, n)))
    c = jnp.asarray(0.05)
    b = jnp.asarray(rng.standard_normal(n))
    A = np.eye(n) - 0.05 * np.asarray(J)

    f = newton_factor(J, c, method="lu")
    # emulate the inv path with an explicit inverse of matching precision
    finv = f._replace(lu=jnp.asarray(np.linalg.inv(A), jnp.float32),
                      piv=jnp.zeros((n,), jnp.int32))
    dy = newton_solve(finv, b, refine=2, method="inv")
    ref = np.linalg.solve(A, np.asarray(b)[..., None])[..., 0]
    assert np.abs(np.asarray(dy) - ref).max() < 1e-10


def test_bdf_linsolve_inv_cpu_interpretless():
    """bdf_solve(linsolve=...) resolves and runs on CPU via the lu path."""
    Adec = -jnp.eye(3)
    rhs = lambda t, y, a: Adec @ y
    jac = lambda t, y, a: Adec
    saveat = jnp.array([0.5, 1.0])
    res = bdf.bdf_solve(rhs, jac, jnp.ones(3), 0.0, 1.0, saveat,
                        rtol=1e-8, atol=1e-10, linsolve="auto", args=0.0)
    assert int(res.status) == bdf.DONE
    assert np.allclose(np.asarray(res.ys[-1]), np.exp(-1.0), atol=1e-7)


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="FD reference calibrated for CPU f32 rounding")
def test_gj_inverse_jvp_registered_rule(monkeypatch):
    """jax.jvp through gj_inverse exercises the REGISTERED custom rule
    (primal forced through the interpreter so no TPU is needed) and the
    tangent matches finite differences of the primal."""
    from kinetica_tpu.ops import pallas_linalg as pl_mod

    real_call = pl_mod._gj_call
    monkeypatch.setattr(pl_mod, "_gj_call",
                        lambda A, interpret: real_call(A, True))

    rng = np.random.default_rng(3)
    n = 6
    A = jnp.asarray(np.eye(n) * 3.0 + rng.normal(size=(n, n)) * 0.3)
    dA = jnp.asarray(rng.normal(size=(n, n)) * 0.1)

    Minv, dMinv = jax.jvp(pl_mod.gj_inverse, (A,), (dA,))
    eps = 1e-3
    fd = (np.asarray(real_call((A + eps * dA)[None].astype(jnp.float32), True)[0],
                     np.float64)
          - np.asarray(real_call((A - eps * dA)[None].astype(jnp.float32), True)[0],
                       np.float64)) / (2 * eps)
    scale = np.abs(np.asarray(dMinv)).max()
    assert np.abs(np.asarray(dMinv, dtype=np.float64) - fd).max() / scale < 5e-3


class TestFusedNewtonSolve:
    """One-launch fused Newton solve (matvec + pair refinement) vs the
    reference inv-path algebra, in interpret mode."""

    def _mk(self, n=12, B=5, c0=0.05, seed=3, cond_spike=False):
        rng = np.random.default_rng(seed)
        J = rng.standard_normal((B, n, n))
        if cond_spike:
            # scale rows over ~6 decades: badly scaled Newton matrices
            J = J * 10.0 ** rng.uniform(-3, 3, (B, n, 1))
        c = np.full(B, c0)
        b = rng.standard_normal((B, n))
        # the solved system is (I - c J32): the kernel (like the
        # production TPU config, jac_dtype=f32) sees the f32-cast J
        A = np.eye(n)[None] - c[:, None, None] * J.astype(np.float32
                                                         ).astype(np.float64)
        return jnp.asarray(J), jnp.asarray(c), jnp.asarray(b), A

    def test_matches_dense_solve(self):
        from kinetica_tpu.ops.pallas_linalg import fused_newton_solve
        J, c, b, A = self._mk()
        M = jnp.asarray(np.linalg.inv(A), jnp.float32)
        dy = jax.vmap(lambda *t: fused_newton_solve(*t, interpret=True))(
            M, J, b, c)
        ref = np.linalg.solve(A, np.asarray(b)[..., None])[..., 0]
        scale = np.abs(ref).max(axis=1, keepdims=True)
        # floor: the refinement's J matvec rounds at f32 (exactly the
        # production jac_dtype=f32 behaviour), ~c*eps32*|J||dy|
        np.testing.assert_allclose(np.asarray(dy) / scale, ref / scale,
                                   atol=3e-6, rtol=0)

    def test_stale_c_preconditioner_refines(self):
        # M built at a 20%-drifted c: refinement must still recover the
        # CURRENT (I - cJ) solution (the wide-lu_drift_tol contract)
        from kinetica_tpu.ops.pallas_linalg import fused_newton_solve
        J, c, b, A = self._mk()
        A_stale = np.eye(J.shape[-1])[None] - 1.2 * np.asarray(
            c)[:, None, None] * np.asarray(J)
        M = jnp.asarray(np.linalg.inv(A_stale), jnp.float32)
        dy = jax.vmap(lambda *t: fused_newton_solve(*t, interpret=True))(
            M, J, b, c)
        ref = np.linalg.solve(A, np.asarray(b)[..., None])[..., 0]
        scale = np.abs(ref).max(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(dy) / scale, ref / scale,
                                   atol=2e-4, rtol=0)

    def test_unbatched_and_chunked(self):
        from kinetica_tpu.ops import pallas_linalg as plg
        J, c, b, A = self._mk(n=6, B=3)
        M = jnp.asarray(np.linalg.inv(A), jnp.float32)
        one = plg.fused_newton_solve(M[0], J[0], b[0], c[0], interpret=True)
        ref = np.linalg.solve(A[0], np.asarray(b[0]))
        np.testing.assert_allclose(np.asarray(one), ref, atol=3e-6)
        # force the > max_batch lax.map path
        import unittest.mock as mock
        with mock.patch.object(plg, "_fused_solve_max_batch",
                               lambda n_pad: 8):
            plg._make_fused_solve.cache_clear()
            J2, c2, b2, A2 = self._mk(n=6, B=19, seed=9)
            M2 = jnp.asarray(np.linalg.inv(A2), jnp.float32)
            dy = jax.vmap(lambda *t: plg.fused_newton_solve(
                *t, interpret=True))(M2, J2, b2, c2)
            ref2 = np.linalg.solve(A2, np.asarray(b2)[..., None])[..., 0]
            np.testing.assert_allclose(np.asarray(dy), ref2, atol=3e-6)
        plg._make_fused_solve.cache_clear()

    def test_jvp_rule(self):
        # d(dy)/db through the registered custom rule vs finite differences
        from kinetica_tpu.ops import pallas_linalg as plg
        J, c, b, A = self._mk(n=5, B=1)
        M = jnp.asarray(np.linalg.inv(A), jnp.float32)

        # route the primal through interpret mode so no TPU is needed;
        # jax.jvp hits the REGISTERED custom rule (the in-kernel
        # while_loop is not jvp-able, so a fallthrough would raise)
        def fn(bb):
            return plg.fused_newton_solve(M[0], J[0], bb, c[0],
                                          interpret=True)

        db = jnp.asarray(np.random.default_rng(0).standard_normal(5))
        dy, ddy = jax.jvp(fn, (b[0],), (db,))
        ref = np.linalg.solve(A[0], np.asarray(db))
        np.testing.assert_allclose(np.asarray(ddy), ref, atol=1e-5)

    def test_newton_solve_dispatch(self):
        # method="inv_fused" through linalg.newton_solve (CPU interpret)
        J, c, b, A = self._mk(n=8, B=1)
        f = newton_factor(J[0], c[0], method="lu")
        finv = f._replace(lu=jnp.asarray(np.linalg.inv(A[0]), jnp.float32),
                          piv=jnp.zeros((8,), jnp.int32))
        dy = newton_solve(finv, b[0], method="inv_fused")
        ref = np.linalg.solve(A[0], np.asarray(b[0]))
        np.testing.assert_allclose(np.asarray(dy), ref, atol=3e-6)


def test_bdf_linsolve_inv_fused_end_to_end():
    """bdf_solve driven entirely through the fused Newton-solve kernel
    (interpret mode on CPU) reproduces the analytic decay solution."""
    Adec = jnp.asarray([[-1.0, 0.2, 0.0], [0.3, -2.0, 0.1],
                        [0.0, 0.5, -0.5]])
    rhs = lambda t, y, a: Adec @ y
    jac = lambda t, y, a: Adec
    saveat = jnp.array([0.5, 1.0])
    import scipy.linalg
    ref = scipy.linalg.expm(np.asarray(Adec)) @ np.ones(3)
    res = bdf.bdf_solve(rhs, jac, jnp.ones(3), 0.0, 1.0, saveat,
                        rtol=1e-9, atol=1e-11, linsolve="inv_fused",
                        args=0.0)
    assert int(res.status) == bdf.DONE
    np.testing.assert_allclose(np.asarray(res.ys[-1]), ref, rtol=1e-7)


class TestGatedFactor:
    """linsolve="inv_gated": lane-compacted factor refreshes (the batch
    rule gathers only the lanes whose ``need`` flag is set — the ANY-lane
    refactor gate fires ~every step at production batch sizes although
    each lane refactors ~0.2x/step)."""

    def _batch(self, B, n, seed=0):
        rng = np.random.default_rng(seed)
        J = rng.standard_normal((B, n, n))
        c = 0.02 + 0.01 * rng.random(B)
        A = np.eye(n)[None] - c[:, None, None] * J
        return jnp.asarray(A), jnp.asarray(J), jnp.asarray(c)

    def test_compacted_lanes_match_full(self):
        from kinetica_tpu.ops.linalg import _inv_factor_gated, _inv_factor_one
        B, n = 32, 8
        A, _, _ = self._batch(B, n)
        need = np.zeros(B, bool)
        need[[3, 11, 30]] = True                    # 3 lanes <= B/4 bucket
        out = np.asarray(jax.vmap(_inv_factor_gated)(A, jnp.asarray(need)))
        full = np.asarray(jax.vmap(_inv_factor_one)(A))
        np.testing.assert_allclose(out[need], full[need], rtol=1e-5,
                                   atol=1e-6)
        # non-needing lanes get either bucket fill-in (valid inverses) or
        # zeros — both discarded by the BDF while_loop's per-lane carry
        # masking; they must never be non-finite
        assert np.all(np.isfinite(out))
        # lanes beyond the bucket are untouched zeros (bucket = 8 here:
        # the 3 needing lanes + 5 fill-ins, all others zero-filled)
        filled = np.abs(out).reshape(B, -1).max(axis=1) > 0
        assert filled.sum() == 8 and filled[need].all()

    def test_overflow_falls_back_to_full(self):
        from kinetica_tpu.ops.linalg import _inv_factor_gated, _inv_factor_one
        B, n = 32, 6
        A, _, _ = self._batch(B, n, seed=1)
        need = jnp.ones(B, bool)                    # > B/2: full path
        out = np.asarray(jax.vmap(_inv_factor_gated)(A, need))
        full = np.asarray(jax.vmap(_inv_factor_one)(A))
        np.testing.assert_allclose(out, full, rtol=1e-6, atol=1e-7)

    def test_unbatched_is_plain_factor(self):
        from kinetica_tpu.ops.linalg import _inv_factor_one
        _, J, c = self._batch(1, 7, seed=2)
        f = newton_factor(J[0], c[0], method="inv_gated")
        ref = np.asarray(_inv_factor_one(jnp.eye(7) - c[0] * J[0]))
        np.testing.assert_allclose(np.asarray(f.lu), ref, rtol=1e-6,
                                   atol=1e-7)

    def test_bdf_vmapped_end_to_end_matches_lu(self):
        """A vmapped stiff solve through inv_gated (interpret-mode kernels
        on CPU) matches the LAPACK-LU solve lane for lane. Lanes carry
        different stiffness so their refactor cadences (and hence the
        compaction masks) differ."""
        n = 3
        base = jnp.asarray([[-1.0, 0.2, 0.0], [0.3, -2.0, 0.1],
                            [0.0, 0.5, -0.5]])
        rates = jnp.linspace(1.0, 40.0, 16)         # B=16 -> b1 bucket 8
        rhs = lambda t, y, a: (a * base) @ y
        jac = lambda t, y, a: a * base
        saveat = jnp.array([0.5, 1.0])

        def solve(linsolve):
            def one(a):
                return bdf.bdf_solve(rhs, jac, jnp.ones(n), 0.0, 1.0,
                                     saveat, rtol=1e-8, atol=1e-10,
                                     linsolve=linsolve, args=a)
            res = jax.vmap(one)(rates)
            assert np.all(np.asarray(res.status) == bdf.DONE)
            return np.asarray(res.ys[:, -1])

        np.testing.assert_allclose(solve("inv_gated"), solve("lu"),
                                   rtol=1e-7, atol=1e-10)

    def test_params_accept_inv_gated(self):
        from kinetica_tpu.solving.params import ODESimulationParams
        pars = ODESimulationParams(tspan=(0.0, 1.0), u0={"A": 1.0},
                                   linsolve="inv_gated")
        assert pars.linsolve == "inv_gated"

    def test_jvp_matches_inv_path_under_compaction(self):
        """The custom JVP (_inv_factor_jvp: d(A^-1) = -A^-1 dA A^-1) must
        agree with the ungated "inv" path's differentiation on the lanes
        whose ``need`` flag is set, THROUGH the compaction batch rule
        (mixed mask, B >= 16 so the bucketed scatter path runs). Masked
        lanes yield zero M and hence zero dM — also asserted, since the
        BDF carry masking relies on discarding them."""
        from kinetica_tpu.ops.linalg import _inv_factor_diff, _inv_factor_one
        B, n = 16, 5
        A, _, _ = self._batch(B, n, seed=3)
        dA = jnp.asarray(np.random.default_rng(7).standard_normal((B, n, n)))
        need = np.zeros(B, bool)
        need[[0, 5, 13]] = True

        gated = jax.vmap(_inv_factor_diff, in_axes=(0, 0))
        M, dM = jax.jvp(lambda a: gated(a, jnp.asarray(need)), (A,), (dA,))
        # Reference tangent: the ungated "inv" factor plus the analytic
        # inverse differential d(A^-1) = -A^-1 dA A^-1 evaluated
        # independently (differentiating _inv_factor_one directly is not
        # possible on CPU: its interpret-mode pallas_call has no JVP rule
        # — which is exactly why _inv_factor_diff carries a custom one).
        M_ref = jax.vmap(_inv_factor_one)(A)
        dM_ref = -(M_ref @ dA.astype(M_ref.dtype) @ M_ref)
        np.testing.assert_allclose(np.asarray(M)[need],
                                   np.asarray(M_ref)[need],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dM)[need],
                                   np.asarray(dM_ref)[need],
                                   rtol=1e-4, atol=1e-5)
        assert np.all(np.isfinite(np.asarray(dM)))
        # zero-M lanes (outside the bucket) propagate zero tangents
        zero_lanes = np.abs(np.asarray(M)).reshape(B, -1).max(axis=1) == 0
        assert zero_lanes.any()
        assert np.all(np.asarray(dM)[zero_lanes] == 0.0)

    def test_jvp_through_solve_matches_lu(self):
        """Forward-mode through a Newton solve using the gated factor
        (unbatched: the plain-factor path) matches the LAPACK-"lu" path's
        tangent — the composition forward-sensitivity solves (jacfwd
        through the BDF Newton loop) actually exercise. (Reverse mode is
        out of scope: newton_solve's adaptive refinement while_loop is
        not reverse-differentiable.)"""
        _, J, c = self._batch(1, 4, seed=5)
        rng = np.random.default_rng(9)
        b = jnp.asarray(rng.standard_normal(4))
        dJ = jnp.asarray(rng.standard_normal((4, 4)))

        def loss(j, method):
            f = newton_factor(j, c[0], method=method)
            return jnp.sum(newton_solve(f, b, method=method) ** 2)

        l_g, dl_g = jax.jvp(lambda j: loss(j, "inv_gated"), (J[0],), (dJ,))
        l_lu, dl_lu = jax.jvp(lambda j: loss(j, "lu"), (J[0],), (dJ,))
        np.testing.assert_allclose(float(l_g), float(l_lu), rtol=1e-6)
        np.testing.assert_allclose(float(dl_g), float(dl_lu), rtol=1e-4)


class TestSchurInverse:
    """Recursive block-Schur multi-tile inverse (one-tile GJ + MXU
    coupling matmuls) — the default multi-tile factor path."""

    def test_residual_well_conditioned(self):
        from kinetica_tpu.ops.pallas_linalg import schur_inverse
        rng = np.random.default_rng(0)
        for n in (181, 200, 300):
            A = np.eye(n) + (0.5 / np.sqrt(n)) * rng.standard_normal((n, n))
            M = np.asarray(schur_inverse(jnp.asarray(A, jnp.float32),
                                         interpret=True))
            resid = np.max(np.abs(M @ A - np.eye(n)))
            assert resid < 5e-4, (n, resid)

    def test_vmap_batches(self):
        from kinetica_tpu.ops.pallas_linalg import schur_inverse
        rng = np.random.default_rng(1)
        n, B = 181, 6
        A = np.eye(n) + (0.5 / np.sqrt(n)) * rng.standard_normal((B, n, n))
        M = np.asarray(jax.vmap(
            lambda a: schur_inverse(a, interpret=True))(
                jnp.asarray(A, jnp.float32)))
        for b in range(B):
            resid = np.max(np.abs(M[b] @ A[b] - np.eye(n)))
            assert resid < 5e-4, (b, resid)

    def test_refinable_on_stiff_matrix(self):
        """On an ill-conditioned mass-action-like matrix the Schur
        factor must land inside the Newton-Schulz convergence basin
        (||I - M A|| well below 1) — block pivoting is looser than the
        wide kernel's global pivoting (measured ~1e-2 vs ~3e-4 here),
        but the downstream quadratic refinement erases that gap in one
        extra sweep; what matters is refinability, and that the refined
        factor reaches the same class as the refined wide factor."""
        from kinetica_tpu.ops.dd import newton_schulz_refine
        from kinetica_tpu.ops.linalg import _equilibrate
        from kinetica_tpu.ops.pallas_linalg import gj_inverse, schur_inverse
        rng = np.random.default_rng(2)
        n = 181
        # badly scaled rows like c*k*u spans: 1 .. 1e9
        J = rng.standard_normal((n, n)) * (10.0 ** rng.uniform(0, 9, (n, 1)))
        M = np.eye(n) - 1e-3 * J
        As, _, _ = _equilibrate(jnp.asarray(M))
        As64 = np.asarray(As, np.float64)
        r = {}
        for name, fn in (("schur", schur_inverse), ("wide", gj_inverse)):
            Minv = fn(jnp.asarray(As), interpret=True)
            r[name] = np.max(np.abs(np.asarray(Minv, np.float64) @ As64
                                    - np.eye(n)))
        assert r["schur"] < 0.1, r
        # solve-level contract: with per-solve iterative refinement (what
        # newton_solve actually runs), the schur preconditioner reaches
        # the same answer as a direct f64 solve
        Minv = np.asarray(schur_inverse(jnp.asarray(As), interpret=True),
                          np.float64)
        b = rng.standard_normal(n)
        x = Minv @ b
        for _ in range(3):
            x += Minv @ (b - As64 @ x)
        ref = np.linalg.solve(As64, b)
        np.testing.assert_allclose(x, ref, rtol=1e-8,
                                   atol=1e-10 * np.abs(ref).max())
