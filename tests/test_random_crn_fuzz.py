"""Property-based cross-validation: random CRNs vs scipy BDF.

Seeded random mass-action networks (random stoichiometry within
molecularity 2, log-uniform rate constants spanning 8 decades, random
positive initial states) solved by the production chunkwise BDF stack and
independently by scipy's BDF on the identical ODE system. Catches whole
classes of integrator regressions (Newton/controller/dense-output/pair
arithmetic) that hand-picked CRNs can miss.

No reference analog — Kinetica.jl's test suite uses fixed example
networks only (/root/reference/test/runtests.jl).
"""
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from kinetica_tpu.models.mass_action import MassActionNetwork
from kinetica_tpu.ops import bdf

import jax.numpy as jnp

RTOL, ATOL = 1e-8, 1e-10


def random_network(rng, ns, nr):
    """Random molecularity-<=2 reactions over ns species, atom-free (no
    conservation structure imposed — the harder case for the solver)."""
    slots = np.full((nr, 2), ns, dtype=np.int32)
    N = np.zeros((nr, ns))
    for j in range(nr):
        n_reac = rng.integers(1, 3)
        n_prod = rng.integers(1, 3)
        reacs = rng.choice(ns, size=n_reac, replace=True)
        prods = rng.choice(ns, size=n_prod, replace=True)
        # avoid pure no-ops
        if sorted(reacs.tolist()) == sorted(prods.tolist()):
            prods = (prods + 1) % ns
        for s, sid in enumerate(reacs):
            slots[j, s] = sid
            N[j, sid] -= 1
        for sid in prods:
            N[j, sid] += 1
    return slots, N


def scipy_solve(slots, N, k, u0, tf, t_eval):
    ns = N.shape[1]

    def rhs(t, y):
        ua = np.append(np.maximum(y, 0.0), 1.0)
        return (k * ua[slots].prod(axis=1)) @ N

    def jac(t, y):
        ua = np.append(np.maximum(y, 0.0), 1.0)
        J = np.zeros((ns, ns))
        for s in range(2):
            other = ua[slots[:, 1 - s]]
            for j in range(slots.shape[0]):
                m = slots[j, s]
                if m < ns:
                    J[:, m] += k[j] * other[j] * N[j]
        return J

    sol = solve_ivp(rhs, (0.0, tf), u0, method="BDF", jac=jac,
                    rtol=RTOL, atol=ATOL, t_eval=t_eval)
    return sol


@pytest.mark.parametrize("seed", range(8))
def test_random_crn_matches_scipy(seed):
    rng = np.random.default_rng(1000 + seed)
    ns = int(rng.integers(4, 10))
    nr = int(rng.integers(6, 20))
    slots, N = random_network(rng, ns, nr)
    # log-uniform rates over 8 decades; cap so u stays O(1)-ish
    k = 10.0 ** rng.uniform(-4, 4, size=nr)
    u0 = rng.uniform(0.05, 1.0, size=ns)
    tf = 2.0
    t_eval = np.linspace(0.25, tf, 8)

    ref = scipy_solve(slots, N, k, u0, tf, t_eval)
    if not ref.success:        # scipy itself failed: skip this draw
        pytest.skip("scipy baseline failed on this draw")

    net = MassActionNetwork(reac_slots=jnp.asarray(slots),
                            N=jnp.asarray(N, jnp.float64))
    res = bdf.bdf_solve(
        lambda t, u, kk: net.rhs(u, kk),
        lambda t, u, kk: net.jac(u, kk),
        jnp.asarray(u0), 0.0, tf, jnp.asarray(t_eval),
        rtol=RTOL, atol=ATOL, max_steps=100000,
        args=jnp.asarray(k))
    assert int(res.status) == bdf.DONE, f"status {int(res.status)}"
    ours = np.asarray(res.ys)
    scale = max(np.abs(ref.y).max(), 1.0)
    err = np.abs(ours - ref.y.T).max() / scale
    assert err < 2e-6, f"seed {seed}: max scaled deviation {err:.2e}"
