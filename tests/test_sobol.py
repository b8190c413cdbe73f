"""Sobol variance-based sensitivity (analysis/sobol.py).

The estimator core is pinned against analytic Sobol indices of a known
additive/interacting test function (exact variance decomposition), the
Saltelli design structure is checked directly, and the full pipeline is
integration-tested on the Morris chain CRN: the rate-limiting step
dominates, the disconnected reaction's indices are ~0, and ST >= S1 up
to estimator noise.
"""
import numpy as np
import pytest

from kinetica_tpu.analysis.sobol import (SobolResult, saltelli_design,
                                         sobol_indices_from_values,
                                         sobol_sensitivity)
from tests.test_screening import chain_network, make_method


class TestSaltelliDesign:
    def test_block_structure(self):
        d, N = 4, 16
        X = saltelli_design(d, N, seed=7)
        assert X.shape == (N * (d + 2), d)
        assert X.min() >= 0.0 and X.max() <= 1.0
        A, B = X[:N], X[N:2 * N]
        for i in range(d):
            ABi = X[(2 + i) * N:(3 + i) * N]
            # column i comes from B, all others from A
            assert np.array_equal(ABi[:, i], B[:, i])
            others = [j for j in range(d) if j != i]
            assert np.array_equal(ABi[:, others], A[:, others])
        # A and B are distinct draws
        assert not np.allclose(A, B)


class TestEstimator:
    def test_additive_function_analytic(self):
        # f(x) = a1*g(x1) + a2*g(x2) + a3*g(x3) with g(x) = x - 1/2,
        # xi ~ U(0,1) iid: Var_i = a_i^2 / 12, no interactions, so
        # S1_i = ST_i = a_i^2 / sum a_j^2 exactly.
        a = np.array([3.0, 1.0, 0.0])
        d, N = 3, 4096
        X = saltelli_design(d, N, seed=11)
        f = (a * (X - 0.5)).sum(axis=1)
        fA, fB = f[:N], f[N:2 * N]
        fAB = f[2 * N:].reshape(d, N)
        S1, ST, var, mean, n_eff = sobol_indices_from_values(fA, fB, fAB)
        expect = a ** 2 / (a ** 2).sum()
        assert np.allclose(S1, expect, atol=0.02)
        assert np.allclose(ST, expect, atol=0.02)
        assert var == pytest.approx((a ** 2).sum() / 12.0, rel=0.05)
        assert mean == pytest.approx(0.0, abs=0.01)
        assert (n_eff == N).all()

    def test_pure_interaction_total_vs_first(self):
        # f = x1 * x2 (centred): first-order indices are small, total
        # indices capture the interaction. Analytic: with zi = xi - 1/2,
        # f = z1*z2 has S1 = 0, ST = 1 for both.
        d, N = 2, 4096
        X = saltelli_design(d, N, seed=13)
        Z = X - 0.5
        f = Z[:, 0] * Z[:, 1]
        fA, fB = f[:N], f[N:2 * N]
        fAB = f[2 * N:].reshape(d, N)
        S1, ST, *_ = sobol_indices_from_values(fA, fB, fAB)
        assert np.all(np.abs(S1) < 0.05)
        assert np.allclose(ST, 1.0, atol=0.1)

    def test_nan_rows_excluded(self):
        d, N = 2, 256
        X = saltelli_design(d, N, seed=5)
        f = (X - 0.5).sum(axis=1)
        fA, fB = f[:N].copy(), f[N:2 * N].copy()
        fAB = f[2 * N:].reshape(d, N).copy()
        fA[:10] = np.nan
        fAB[1, 20:30] = np.nan
        S1, ST, var, mean, n_eff = sobol_indices_from_values(fA, fB, fAB)
        assert n_eff[0] == N - 10
        assert n_eff[1] == N - 20
        assert np.isfinite(S1).all() and np.isfinite(ST).all()


class TestSobolOnCRN:
    def test_rate_limiting_dominates(self):
        sd, rd, calc = chain_network()
        res = sobol_sensitivity(make_method(calc), sd, rd,
                                objective="CCC", n_samples=32,
                                span_decades=1.0, seed=2)
        assert isinstance(res, SobolResult)
        assert res.failed_points == 0
        k1, k2, kd = 0, 1, 2
        # rate-limiting step carries almost all the variance
        assert res.ranking()[0] == k1
        assert res.ST[k1] > 0.8
        # the disconnected reaction has exactly zero effect
        assert abs(res.S1[kd]) < 0.02 and abs(res.ST[kd]) < 0.02
        # totals bound firsts (up to estimator noise)
        assert np.all(res.ST >= res.S1 - 0.05)
        s = res.summarise(sd, rd)
        assert "ST=" in s and "Sobol" in s

    def test_subset_rids(self):
        sd, rd, calc = chain_network()
        res = sobol_sensitivity(make_method(calc), sd, rd,
                                objective="CCC", rids=[0, 1],
                                n_samples=16, seed=4)
        assert res.rids.tolist() == [0, 1]
        assert res.S1.shape == (2,)

    def test_top_level_export(self):
        import kinetica_tpu as kt
        assert kt.sobol_sensitivity is sobol_sensitivity
        assert kt.SobolResult is SobolResult

    def test_sobolplot(self):
        mpl = pytest.importorskip("matplotlib")
        mpl.use("Agg")
        sd, rd, calc = chain_network()
        res = sobol_sensitivity(make_method(calc), sd, rd,
                                objective="CCC", n_samples=8, seed=6)
        from kinetica_tpu.analysis.plotting import sobolplot
        ax = sobolplot(res, sd, rd)
        assert "Sobol index" in ax.get_xlabel()
        # two bar series (ST + S1), one bar per screened reaction each
        assert len(ax.containers) == 2
        assert len(ax.containers[0]) == rd.nr
        assert ax.get_legend() is not None
