"""Numeric mass-action model: RHS/Jacobian vs autodiff and hand values."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinetica_tpu.core.network import RxData, SpeciesData
from kinetica_tpu.models.mass_action import build_mass_action


def random_network(rng, ns=12, nr=30):
    smis = [f"S{i}" for i in range(ns)]
    sd = SpeciesData(smis)
    rd = RxData()
    count = 0
    while count < nr:
        kind = rng.integers(0, 3)
        if kind == 0:  # A -> B + C
            a, b, c = rng.choice(ns, 3, replace=False)
            reacs, prods = [smis[a]], [smis[b], smis[c]]
        elif kind == 1:  # A + B -> C
            a, b, c = rng.choice(ns, 3, replace=False)
            reacs, prods = [smis[a], smis[b]], [smis[c]]
        else:  # 2A -> B
            a, b = rng.choice(ns, 2, replace=False)
            reacs, prods = [smis[a], smis[a]], [smis[b]]
        before = rd.nr
        rd.push(sd, [reacs], [prods], dH=[0.0], unique_rxns=True)
        count += rd.nr - before
    return sd, rd


class TestMassAction:
    def test_rhs_hand_computed(self):
        # A + B -> C at rate k u_A u_B; 2A -> D at k u_A^2; C -> A + B
        sd = SpeciesData(["A", "B", "C", "D"])
        rd = RxData.from_reactions(
            sd,
            reacs=[["A", "B"], ["A", "A"], ["C"]],
            prods=[["C"], ["D"], ["A", "B"]])
        net = build_mass_action(rd, sd.n)
        u = jnp.array([2.0, 3.0, 0.5, 0.0])
        k = jnp.array([1.0, 10.0, 100.0])
        r = np.asarray(net.rates(u, k))
        np.testing.assert_allclose(r, [6.0, 40.0, 50.0])
        du = np.asarray(net.rhs(u, k))
        np.testing.assert_allclose(du, [
            -6.0 - 2 * 40.0 + 50.0,   # A
            -6.0 + 50.0,              # B
            6.0 - 50.0,               # C
            40.0,                     # D
        ])

    def test_jacobian_matches_autodiff(self, rng):
        sd, rd = random_network(rng)
        net = build_mass_action(rd, sd.n)
        u = jnp.asarray(rng.uniform(0.0, 2.0, sd.n))
        k = jnp.asarray(rng.uniform(0.1, 10.0, rd.nr))
        J_analytic = np.asarray(net.jac(u, k))
        J_ad = np.asarray(jax.jacfwd(lambda uu: net.rhs(uu, k))(u))
        np.testing.assert_allclose(J_analytic, J_ad, rtol=1e-12, atol=1e-12)

    def test_jac_matmul_matches_segsum(self, rng):
        # the MXU matmul form (jac_form="matmul") must agree with the
        # segment-sum form to rounding, in f64 and in the f32
        # preconditioner dtype, including through vmap
        sd, rd = random_network(rng)
        net = build_mass_action(rd, sd.n)
        u = jnp.asarray(rng.uniform(0.0, 2.0, (4, sd.n)))
        k = jnp.asarray(rng.uniform(0.1, 10.0, rd.nr))
        J_ss = np.asarray(jax.vmap(lambda uu: net.jac(uu, k))(u))
        J_mm = np.asarray(jax.vmap(lambda uu: net.jac_matmul(uu, k))(u))
        np.testing.assert_allclose(J_mm, J_ss, rtol=1e-12, atol=1e-12)

        from kinetica_tpu.models.mass_action import MassActionNetwork
        net32 = MassActionNetwork(net.reac_slots,
                                  net.N.astype(jnp.float32),
                                  delta=net.delta)
        u32, k32 = u.astype(jnp.float32), k.astype(jnp.float32)
        J_ss = np.asarray(jax.vmap(lambda uu: net32.jac(uu, k32))(u32))
        J_mm = np.asarray(jax.vmap(lambda uu: net32.jac_matmul(uu, k32))(u32))
        scale = np.abs(J_ss).max()
        np.testing.assert_allclose(J_mm, J_ss, rtol=1e-5,
                                   atol=1e-5 * max(scale, 1.0))

    def test_jac_matmul_padded_slots(self, rng):
        # padding reactions (constant-1 slots, zero N rows) must be exact
        # no-ops in the matmul form too
        from kinetica_tpu.models.mass_action import pad_reactions
        sd, rd = random_network(rng)
        net = build_mass_action(rd, sd.n)
        netp = pad_reactions(net, net.nr + 7)
        u = jnp.asarray(rng.uniform(0.0, 2.0, sd.n))
        k = jnp.asarray(rng.uniform(0.1, 10.0, rd.nr))
        kp = jnp.concatenate([k, jnp.zeros((7,), k.dtype)])
        np.testing.assert_allclose(np.asarray(netp.jac_matmul(u, kp)),
                                   np.asarray(net.jac_matmul(u, k)),
                                   rtol=0, atol=0)

    def test_jacobian_with_zero_concentrations(self, rng):
        # at exactly u=0 autodiff of max(u,0) gives the 0.5 tie-subgradient;
        # the analytic jac keeps the one-sided derivative (species start at
        # exactly 0 and Newton needs the coupling) — so compare at tiny
        # positive values where both conventions coincide
        sd, rd = random_network(rng)
        net = build_mass_action(rd, sd.n)
        u = jnp.asarray(rng.uniform(0.0, 2.0, sd.n)).at[:5].set(1e-30)
        k = jnp.asarray(rng.uniform(0.1, 10.0, rd.nr))
        J_analytic = np.asarray(net.jac(u, k))
        J_ad = np.asarray(jax.jacfwd(lambda uu: net.rhs(uu, k))(u))
        np.testing.assert_allclose(J_analytic, J_ad, rtol=1e-12, atol=1e-12)

    def test_rates_clip_negative_concentrations(self, rng):
        # rates are evaluated on max(u, 0): a tolerance-level negative
        # excursion must not produce explosive negative self-consumption
        sd, rd = random_network(rng)
        net = build_mass_action(rd, sd.n)
        u = jnp.asarray(rng.uniform(0.1, 2.0, sd.n))
        k = jnp.asarray(rng.uniform(0.1, 10.0, rd.nr))
        u_neg = u.at[:5].set(-1e-9)
        u_zero = u.at[:5].set(0.0)
        np.testing.assert_allclose(np.asarray(net.rates(u_neg, k)),
                                   np.asarray(net.rates(u_zero, k)),
                                   rtol=0, atol=0)

    def test_mass_conservation(self, rng):
        # a closed A<->B system conserves total mass in the RHS
        sd = SpeciesData(["A", "B"])
        rd = RxData.from_reactions(sd, reacs=[["A"], ["B"]], prods=[["B"], ["A"]])
        net = build_mass_action(rd, sd.n)
        u = jnp.array([1.5, 0.5])
        k = jnp.array([2.0, 3.0])
        assert float(jnp.sum(net.rhs(u, k))) == pytest.approx(0.0, abs=1e-14)

    def test_vmap_rhs(self, rng):
        sd, rd = random_network(rng)
        net = build_mass_action(rd, sd.n)
        us = jnp.asarray(rng.uniform(0.0, 2.0, (7, sd.n)))
        k = jnp.asarray(rng.uniform(0.1, 10.0, rd.nr))
        batched = np.asarray(jax.vmap(lambda u: net.rhs(u, k))(us))
        looped = np.stack([np.asarray(net.rhs(us[i], k)) for i in range(7)])
        np.testing.assert_allclose(batched, looped, rtol=1e-13)

    def test_trimolecular_after_inert(self):
        from kinetica_tpu.solving.solve_utils import insert_inert
        sd = SpeciesData(["A", "B", "C"])
        rd = RxData.from_reactions(sd, reacs=[["A"]], prods=[["B", "C"]])
        insert_inert(rd, sd, ["M"])
        net = build_mass_action(rd, sd.n)
        assert net.arity == 2
        u = jnp.array([1.0, 0.0, 0.0, 4.0])
        k = jnp.array([3.0])
        np.testing.assert_allclose(np.asarray(net.rates(u, k)), [12.0])
        J_ad = np.asarray(jax.jacfwd(lambda uu: net.rhs(uu, k))(u))
        np.testing.assert_allclose(np.asarray(net.jac(u, k)), J_ad, atol=1e-13)
