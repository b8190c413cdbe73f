"""Pair-precision exp + range-safe Arrhenius pipeline (ops/dd.pair_exp,
calculators.builtin.PrecalculatedArrheniusCalculator.rates_pair).

Motivation (round 3): XLA's f64-on-TPU is a double-f32 emulation whose
``exp`` underflows the f32 range — k = A exp(-Ea/RT) with A*N_A ~ 1e40
and exponent < -87 evaluated to 0 instead of O(10), and exponents in
(-87, -71] carried ~2e-4 relative noise. Ramping solves saw
discontinuous, noisy k(T(t)) and burned +45% step attempts. The
log-space pair pipeline computes ln k in f32 pair arithmetic (no range
issue) and exponentiates with pair_exp.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kinetica_tpu.ops.dd import (fast_two_sum, pair_add, pair_exp,
                                 pair_from_f64, pair_mul, pair_recip,
                                 pair_to_f64, two_prod, two_sum)


def test_pair_exp_accuracy_dense():
    x = np.linspace(-87.0, 80.0, 100001)
    eh, el = pair_from_f64(jnp.asarray(x))
    kh, kl = jax.jit(pair_exp)(eh, el)
    k = np.asarray(pair_to_f64(kh, kl))
    ref = np.exp(x)
    rel = np.abs(k - ref) / ref
    # full-accuracy zone: outputs whose lo word is comfortably normal
    # (k > ~1e-24; below, the pair's low word drifts subnormal and
    # precision degrades gradually toward f32 level)
    main = x > -55.0
    assert rel[main].max() < 5e-12
    # below that: graceful degradation, never worse than ~f32 accuracy —
    # and these rates (k < 1e-24) are physically dead anyway
    assert rel.max() < 3e-7
    assert np.isfinite(k).all()


def test_pair_exp_range_semantics():
    eh, el = pair_from_f64(jnp.asarray([-100.0, -87.5, 80.4, 200.0]))
    kh, kl = pair_exp(eh, el)
    k = np.asarray(pair_to_f64(kh, kl))
    assert k[0] == 0.0 and k[1] == 0.0          # below -87: exact zero
    # clamped at +80 (f32-level agreement suffices: the clamp region is
    # a saturation guard, not a precision path; 80 keeps downstream
    # Veltkamp splits finite — see ops/dd._EXP_MAX)
    assert np.isclose(k[2], np.exp(80.0), rtol=1e-5)
    assert np.isclose(k[3], np.exp(80.0), rtol=1e-5)
    assert np.isfinite(k).all()


def test_pair_exp_jit_survives_simplifier():
    """The EFT guard: jit compilation must not degrade the pair pipeline
    to single precision (XLA's algebraic simplifier folds (a+b)-a -> b
    without the optimization_barrier armor; observed half-ulp(e) = 1e-6
    relative errors)."""
    rng = np.random.default_rng(7)
    x = rng.uniform(-79.0, 79.0, 20000)
    eh, el = pair_from_f64(jnp.asarray(x))

    def chain(eh, el):
        # composition large enough for fusion-level simplification
        th, tl = pair_mul(eh, el, jnp.float32(0.5), jnp.float32(0.0))
        th, tl = pair_add(th, tl, th, tl)
        return pair_exp(th, tl)

    k = np.asarray(pair_to_f64(*jax.jit(chain)(eh, el)))
    ref = np.exp(x)
    m = x > -55.0
    assert (np.abs(k[m] - ref[m]) / ref[m]).max() < 5e-12


def test_pair_recip():
    # |x| within [1e-25, 1e25]: beyond that the INPUT pair's low word is
    # subnormal-flushed (pair_from_f64 of 1e-30 is already degenerate),
    # so full pair accuracy is unattainable regardless of the algorithm
    x = np.concatenate([np.logspace(-25, 25, 301),
                        -np.logspace(-5, 5, 101)])
    xh, xl = pair_from_f64(jnp.asarray(x))
    rh, rl = jax.jit(pair_recip)(xh, xl)
    r = np.asarray(pair_to_f64(rh, rl))
    assert (np.abs(r - 1.0 / x) * np.abs(x)).max() < 1e-12


def test_eft_guard_flag_matches_unguarded_semantics():
    # guard=False must compute the same values eagerly (the flag only
    # inserts a barrier, not different arithmetic)
    a = jnp.float32(19.880058)
    b = jnp.float32(2.6e-07)
    assert two_sum(a, b) == two_sum(a, b, guard=False)
    assert fast_two_sum(a, b) == fast_two_sum(a, b, guard=False)
    x = jnp.float32(1.2345671)
    y = jnp.float32(7.654321)
    assert two_prod(x, y) == two_prod(x, y, guard=False)


@pytest.fixture
def pyro24():
    from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network
    return synthetic_pyrolysis_network(24)


@pytest.mark.parametrize("k_max", [1e12, None])
def test_rates_pair_matches_f64_reference(pyro24, k_max):
    from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
    from kinetica_tpu import constants
    sd, rd, Ea, A = pyro24
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=k_max)
    for T in (450.0, 502.5, 700.0, 1200.0):
        kraw = np.asarray(A) * np.exp(-np.asarray(Ea) / (constants.R * T)) \
            * constants.N_A
        kref = kraw if k_max is None else 1.0 / (1.0 / k_max + 1.0 / kraw)
        kp = np.asarray(pair_to_f64(
            *jax.jit(calc.rates_pair)(jnp.asarray(T))))
        m = kref > 1e-300
        assert np.max(np.abs(kp[m] - kref[m]) / kref[m]) < 5e-12
        # dead rates (true k < 1.7e-38) are exactly zero, never garbage
        assert np.all(kp[~m] == 0.0) or (~m).sum() == 0


def test_rates_pair_catches_the_tpu_underflow_case(pyro24):
    """The motivating failure: exponent -87.57 with A*N_A = 9e39 ->
    true k = 83.9; the emulated-f64 exp path returned 0 on TPU."""
    from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
    sd, rd, Ea, A = pyro24
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    kp = np.asarray(pair_to_f64(*calc.rates_pair(jnp.asarray(502.5))))
    # reaction 1 of the nc=24 synthetic network is the observed case
    assert abs(kp[1] - 83.85771223805204) / 83.85771223805204 < 1e-10


def test_rates_pair_batched_T(pyro24):
    from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
    sd, rd, Ea, A = pyro24
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    Ts = np.linspace(450.0, 1200.0, 5)
    kh, kl = jax.jit(calc.rates_pair)(jnp.asarray(Ts))
    assert kh.shape == (5, rd.nr)
    for i, T in enumerate(Ts):
        k1h, k1l = calc.rates_pair(jnp.asarray(T))
        np.testing.assert_array_equal(np.asarray(kh[i]), np.asarray(k1h))


def test_rates_pair_splice_invalidates_cache(pyro24):
    from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
    sd, rd, Ea, A = pyro24
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    k_full = np.asarray(pair_to_f64(*calc.rates_pair(jnp.asarray(700.0))))
    calc.splice([0, 1, 2])
    k_spliced = np.asarray(pair_to_f64(*calc.rates_pair(jnp.asarray(700.0))))
    assert k_spliced.shape[0] == k_full.shape[0] - 3
    np.testing.assert_allclose(k_spliced, k_full[3:], rtol=0, atol=0)


def test_lindemann_rates_pair_matches_f64_reference():
    from kinetica_tpu.calculators.builtin import PrecalculatedLindemannCalculator
    from kinetica_tpu import constants
    rng = np.random.default_rng(3)
    nr = 64
    Ea = rng.uniform(2e4, 3e5, nr)
    A_0 = 10.0 ** rng.uniform(5, 18, nr)
    A_inf = 10.0 ** rng.uniform(3, 15, nr)
    calc = PrecalculatedLindemannCalculator(Ea, A_0, A_inf, k_max=1e12)
    for T, P in ((500.0, 1e5), (900.0, 2e6), (1500.0, 5e4)):
        boltz = np.exp(-Ea / (constants.R * T))
        M = P / (constants.R * T) / 1000.0
        pr = (A_0 / A_inf) * M
        kraw = A_inf * boltz * pr / (1.0 + pr) * constants.N_A
        kref = 1.0 / (1.0 / 1e12 + 1.0 / kraw)
        kp = np.asarray(pair_to_f64(
            *jax.jit(calc.rates_pair)(jnp.asarray(T), jnp.asarray(P))))
        m = kref > 1e-24
        assert np.max(np.abs(kp[m] - kref[m]) / kref[m]) < 5e-12
