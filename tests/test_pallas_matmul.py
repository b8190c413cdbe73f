"""Correctness of the double-float RHS contraction (ops/pallas_matmul).

The Pallas kernel itself needs a TPU; on CPU these tests exercise the
kernel in interpret mode plus the pure-XLA reference formulation, checking
both against the exact f64 contraction.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinetica_tpu.ops.pallas_matmul import (DDContraction, _dd_call,
                                            _pad_up, dd_reference, split3)


def make_problem(nr=237, ns=49, B=5, seed=0, scale=1e6):
    rng = np.random.default_rng(seed)
    N = rng.integers(-3, 4, size=(nr, ns)).astype(np.float64)
    # rates spanning many decades incl. cancellation-prone pairs
    r = 10.0 ** rng.uniform(-12, np.log10(scale), size=(B, nr))
    r[:, ::2] *= -1.0  # sign mix to force cancellation in the sums
    return jnp.asarray(N), jnp.asarray(r)


class TestSplit3:
    def test_slices_reconstruct_exactly(self):
        rng = np.random.default_rng(1)
        r = jnp.asarray(10.0 ** rng.uniform(-20, 12, 4096)
                        * rng.choice([-1, 1], 4096))
        r0, r1, r2 = split3(r)
        rec = (r0.astype(jnp.float64) + r1.astype(jnp.float64)
               + r2.astype(jnp.float64))
        # three slices cover 21+21+24 bits > 53: reconstruction is exact
        # across the physical rate range (see split3 docstring for the
        # f32-underflow domain limit)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(r))

    def test_tiny_values_degrade_gracefully(self):
        # XLA flushes f32 subnormals, so slices vanish below f32 min
        # normal (~1.2e-38): absolute error stays below that floor —
        # negligible for mass-action rates, never catastrophic
        r = jnp.asarray([1e-30, -3e-25, 5e-38])
        r0, r1, r2 = split3(r)
        rec = (r0.astype(jnp.float64) + r1.astype(jnp.float64)
               + r2.astype(jnp.float64))
        assert np.all(np.abs(np.asarray(rec - r)) < 1.5e-38)

    def test_slice_products_exact_with_small_ints(self):
        rng = np.random.default_rng(2)
        r = jnp.asarray(10.0 ** rng.uniform(-6, 6, 1024))
        r0, r1, _ = split3(r)
        for n in (-4, -1, 2, 3):
            for s in (r0, r1):
                exact = np.asarray(s, np.float64) * n
                prod = np.asarray(s * np.float32(n), np.float64)
                np.testing.assert_array_equal(prod, exact)


class TestReferenceFormulation:
    def test_matches_f64_dot(self):
        N, r = make_problem()
        ref = np.asarray(r @ N)
        got = np.asarray(dd_reference(r, N))
        scale = np.abs(np.asarray(r))[:, :, None] * np.abs(np.asarray(N))
        tol = 1e-13 * scale.sum(axis=1).max()
        np.testing.assert_allclose(got, ref, atol=tol, rtol=1e-12)


class TestKernelInterpret:
    def test_kernel_matches_f64(self):
        from kinetica_tpu.ops.pallas_matmul import DD_CHUNK
        nr, ns, B = 53, 21, 4
        N, r = make_problem(nr=nr, ns=ns, B=B)
        nr_pad, ns_pad = _pad_up(nr, DD_CHUNK), _pad_up(ns, 8)
        NT = jnp.zeros((ns_pad, nr_pad), jnp.float32).at[:ns, :nr].set(
            N.T.astype(jnp.float32))
        rT = jnp.zeros((nr_pad, B), jnp.float64).at[:nr, :].set(r.T)
        got = np.asarray(_dd_call(NT, rT, nr, interpret=True))[:, :ns]
        ref = np.asarray(r @ N)
        scale = (np.abs(np.asarray(r))[:, :, None]
                 * np.abs(np.asarray(N))).sum(axis=1).max()
        np.testing.assert_allclose(got, ref, atol=1e-12 * scale, rtol=1e-11)


class TestDDContraction:
    def test_validation(self):
        with pytest.raises(ValueError, match="integer"):
            DDContraction(jnp.asarray([[0.5, 1.0]]))
        with pytest.raises(ValueError, match="slice width"):
            DDContraction(jnp.asarray([[9.0, 1.0]]))

    def test_cpu_interpret_batched_and_single(self):
        # full DDContraction runs the real kernel; on CPU use interpret
        # through the reference instead: only shape/validation here
        N, r = make_problem(nr=24, ns=8, B=3)
        dd = DDContraction(N)
        assert dd.nr_pad % 8 == 0 and dd.ns_pad % 8 == 0


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="real Pallas kernel needs TPU")
class TestKernelDevice:
    def test_device_matches_f64(self):
        N, r = make_problem(nr=311, ns=73, B=16)
        dd = DDContraction(N)
        got = np.asarray(dd(r))
        ref = np.asarray(r @ N)
        scale = (np.abs(np.asarray(r))[:, :, None]
                 * np.abs(np.asarray(N))).sum(axis=1).max()
        np.testing.assert_allclose(got, ref, atol=1e-12 * scale, rtol=1e-11)

    def test_vmap_matches(self):
        N, r = make_problem(nr=97, ns=31, B=8)
        dd = DDContraction(N)
        got = np.asarray(jax.vmap(dd)(r))
        ref = np.asarray(r @ N)
        scale = (np.abs(np.asarray(r))[:, :, None]
                 * np.abs(np.asarray(N))).sum(axis=1).max()
        np.testing.assert_allclose(got, ref, atol=1e-12 * scale, rtol=1e-11)


class TestPairArithmetic:
    def test_rates_pair_matches_f64(self):
        from kinetica_tpu.models.mass_action import build_mass_action
        from kinetica_tpu.ops.dd import pair_from_f64, pair_to_f64
        from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network
        sd, rd, Ea, A = synthetic_pyrolysis_network(8)
        net = build_mass_action(rd, sd.n, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.uniform(0, 1, sd.n))
        k = jnp.asarray(10.0 ** rng.uniform(-2, 10, net.nr))
        rh, rl = net.rates_pair(u, pair_from_f64(k))
        got = np.asarray(pair_to_f64(rh, rl))
        ref = np.asarray(net.rates(u, k))
        np.testing.assert_allclose(got, ref, rtol=3e-14, atol=0)

    def test_pair_chop_slices_cover_pair(self):
        from kinetica_tpu.ops.dd import (pair_chop_slices, pair_from_f64,
                                         pair_to_f64)
        rng = np.random.default_rng(4)
        r = jnp.asarray(10.0 ** rng.uniform(-18, 10, 2048)
                        * rng.choice([-1, 1], 2048))
        hi, lo = pair_from_f64(r)
        s0, s1, s2 = pair_chop_slices(hi, lo)
        rec = (s0.astype(jnp.float64) + s1.astype(jnp.float64)
               + s2.astype(jnp.float64))
        err = np.abs(np.asarray(rec - r)) / np.abs(np.asarray(r))
        assert err.max() < 2 ** -44

    def test_two_prod_exact(self):
        from kinetica_tpu.ops.dd import two_prod
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.uniform(-1e6, 1e6, 1024), jnp.float32)
        b = jnp.asarray(rng.uniform(-1e-3, 1e-3, 1024), jnp.float32)
        p, e = two_prod(a, b)
        exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)


def _fused_rhs_vs_reference(mode, nc=8, B=5, min_arity=2, seed=7,
                            interpret=True):
    from kinetica_tpu.models.mass_action import _clip_pos, build_mass_action
    from kinetica_tpu.ops.dd import pair_from_f64
    from kinetica_tpu.ops.pallas_matmul import FusedMassActionRHS
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

    sd, rd, _, _ = synthetic_pyrolysis_network(nc)
    net = build_mass_action(rd, sd.n, min_arity=min_arity)
    rng = np.random.default_rng(seed)
    u = jnp.asarray(np.abs(rng.normal(size=(B, net.ns)))
                    * 10.0 ** rng.uniform(-8, 0, (B, net.ns)))
    k = jnp.asarray(10.0 ** rng.uniform(0, 10, (B, net.nr)))
    fused = FusedMassActionRHS(net.N, net.reac_slots, mode=mode,
                               interpret=interpret)

    def one(u1, k1):
        u_aug = jnp.concatenate([_clip_pos(u1), jnp.ones((1,), u1.dtype)])
        uh, ul = pair_from_f64(u_aug)
        kh, kl = pair_from_f64(k1)
        return fused.rhs_pair(uh, ul, kh, kl)

    got = np.asarray(jax.vmap(one)(u, k))
    ref = np.asarray(jax.vmap(net.rhs)(u, k))
    scale = np.max(np.abs(ref), axis=1, keepdims=True) + 1e-300
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-12, rtol=0)
    # unbatched entry agrees too
    got1 = np.asarray(one(u[0], k[0]))
    np.testing.assert_allclose(got1 / scale[0], ref[0] / scale[0],
                               atol=1e-12, rtol=0)


class TestFusedRHSInterpret:
    """Fully-fused RHS kernel (gathers + pair products + contraction in
    one launch) against the exact f64 mass-action RHS, in interpret mode."""

    def test_scan_mode(self):
        _fused_rhs_vs_reference("scan")

    def test_grid_mode(self):
        _fused_rhs_vs_reference("grid")

    def test_widened_arity_padding_slots(self):
        # min_arity=3 widens every reaction with a constant-1 padding
        # slot: the fused kernel's padding gathers must be exact no-ops
        _fused_rhs_vs_reference("grid", min_arity=3)

    def test_validation(self):
        from kinetica_tpu.ops.pallas_matmul import FusedMassActionRHS
        with pytest.raises(ValueError, match="integer"):
            FusedMassActionRHS(jnp.asarray([[0.5, 1.0]]),
                               np.asarray([[0, 1]]))


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="real Pallas kernel needs TPU")
class TestFusedRHSDevice:
    def test_auto_mode_matches_f64(self):
        _fused_rhs_vs_reference("auto", nc=12, B=8, interpret=False)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="real Pallas kernel needs TPU")
class TestPairKernelDevice:
    def test_contract_pair_matches_f64(self):
        from kinetica_tpu.ops.dd import pair_from_f64
        N, r = make_problem(nr=311, ns=73, B=16)
        dd = DDContraction(N)
        hi, lo = pair_from_f64(r)
        got = np.asarray(jax.vmap(dd.contract_pair)(hi, lo))
        ref = np.asarray(r @ N)
        scale = (np.abs(np.asarray(r))[:, :, None]
                 * np.abs(np.asarray(N))).sum(axis=1).max()
        np.testing.assert_allclose(got, ref, atol=1e-12 * scale, rtol=1e-10)
