"""Microbenchmark: per-evaluation device cost of RHS / Jacobian / matmul
variants at the 1095-reaction scale (nc=24, B=64) on the real TPU.

Chains ITERS data-dependent applications inside ONE jitted scan so the
remote-dispatch overhead (~1 ms/call through the axon tunnel) is
amortised out and we measure true device execution time.

Run: python scripts/microbench_rhs.py [nc]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from kinetica_tpu.models.mass_action import build_mass_action
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

NC = int(sys.argv[1]) if len(sys.argv) > 1 else 24
B = 64
ITERS = 200


def chain(fn, mix):
    """Build jit(scan) applying fn ITERS times with data dependence.

    fn: (carry_state) -> output; mix: (carry, out) -> new carry.
    """
    def body(c, _):
        out = fn(c)
        return mix(c, out), None

    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return c
    return run


def timeit_chain(run, c0, n=3):
    out = run(c0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = run(c0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / (n * ITERS)


def main():
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    net = build_mass_action(rd, sd.n, dtype=jnp.float64)
    nr, ns = net.nr, net.ns
    print(f"nr={nr} ns={ns} B={B} backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(1e-8, 1.0, (B, ns)))
    k = jnp.asarray(10.0 ** rng.uniform(0, 5, (B, nr)))

    rhs_b = jax.vmap(net.rhs)
    jac_b = jax.vmap(net.jac)
    rates_b = jax.vmap(net.rates)

    # carry = u; mix keeps u in a sane range with data dependence
    t_rates = timeit_chain(
        chain(lambda u: rates_b(u, k),
              lambda u, r: u + 1e-30 * r[:, :ns]), u0)
    print(f"rates (f64): {t_rates*1e6:9.1f} us/eval")

    t_rhs = timeit_chain(
        chain(lambda u: rhs_b(u, k), lambda u, d: u + 1e-30 * d), u0)
    print(f"rhs   (f64): {t_rhs*1e6:9.1f} us/eval")

    t_jac = timeit_chain(
        chain(lambda u: jac_b(u, k), lambda u, J: u + 1e-30 * J[:, 0, :]), u0)
    print(f"jac   (f64): {t_jac*1e6:9.1f} us/eval")

    # pure matmul comparisons, carry = r (B, nr)
    N64 = net.N
    N32 = net.N.astype(jnp.float32)
    r0 = jnp.asarray(rng.uniform(0, 1e5, (B, nr)))

    def mk_mm(mm, N):
        return chain(lambda r: mm(r, N),
                     lambda r, d: r + 1e-30 * jnp.tile(
                         d.astype(r.dtype), (1, nr // ns + 1))[:, :nr])

    t64 = timeit_chain(mk_mm(lambda r, N: r @ N, N64), r0)
    print(f"matmul f64: {t64*1e6:9.1f} us/eval")
    t32 = timeit_chain(mk_mm(lambda r, N: r.astype(jnp.float32) @ N, N32), r0)
    print(f"matmul f32 (incl cast): {t32*1e6:9.1f} us/eval")

    def mm_pref(r, N):
        return jax.lax.dot_general(r.astype(jnp.float32), N,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float64)
    t_pref = timeit_chain(mk_mm(mm_pref, N32), r0)
    print(f"matmul f32->f64 accum: {t_pref*1e6:9.1f} us/eval")


if __name__ == "__main__":
    main()
