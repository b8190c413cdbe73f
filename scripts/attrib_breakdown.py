"""Chained-kernel timings of the BDF step's component ops at nc=24, B=64.

Isolates each hot component (fused RHS, f32 Jacobian, Gauss-Jordan
inverse, Newton-Schulz sweep, newton_solve, D rescale) with
scan-chained evaluations so launch overhead amortises per iteration.
Run on TPU: python scripts/attrib_breakdown.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.models.mass_action import _clip_pos, build_mass_action
from kinetica_tpu.ops import bdf, dd
from kinetica_tpu.ops.linalg import NewtonFactors, newton_factor, newton_solve
from kinetica_tpu.ops.pallas_linalg import gj_inverse
from kinetica_tpu.ops.pallas_matmul import FusedMassActionRHS
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

NC = int(os.environ.get("KINETICA_BENCH_NC", "24"))
B = int(os.environ.get("KINETICA_BENCH_BATCH", "64"))


def chain_time(f, c0, iters=200, reps=3):
    def body(c, _):
        return f(c), None

    @jax.jit
    def runc(c0):
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    out = runc(c0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = runc(c0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / (reps * iters)


def say(name, t):
    print(f"{name:34s} {t*1e6:8.1f} us/eval")
    sys.stdout.flush()


def main():
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    net64 = build_mass_action(rd, sd.n, dtype=jnp.float64)
    net32 = build_mass_action(rd, sd.n, dtype=jnp.float32)
    ns, nr = sd.n, rd.nr
    rng = np.random.default_rng(0)
    Ts = np.linspace(500.0, 560.0, B)
    ks = jnp.asarray(np.stack([np.asarray(calc(T=jnp.asarray(T)))
                               for T in Ts]))
    u0s = jnp.asarray(np.abs(rng.normal(size=(B, ns))) * 1e-3)
    print(f"nr={nr} ns={ns} B={B}")

    con = FusedMassActionRHS(net64.N, net64.reac_slots)
    kp = dd.pair_from_f64(ks)

    def rhs_one(u, kh, kl):
        u_aug = jnp.concatenate([_clip_pos(u), jnp.ones((1,), u.dtype)])
        uh, ul = dd.pair_from_f64(u_aug)
        return con.rhs_pair(uh, ul, kh, kl)

    t = chain_time(lambda u: u + 1e-30 * jax.vmap(rhs_one)(u, *kp), u0s)
    say("fused rhs", t)

    t = chain_time(lambda u: u + 1e-30 * jax.vmap(
        lambda uu, kk: net32.jac(uu.astype(jnp.float32), kk)
    )(u, kp[0])[:, 0].astype(u.dtype), u0s)
    say("jac32", t)

    M0 = jnp.asarray(rng.standard_normal((B, ns, ns)), jnp.float32) \
        + 10.0 * jnp.eye(ns, dtype=jnp.float32)
    t = chain_time(lambda M: jax.vmap(gj_inverse)(M) * 0.999 + 0.01 * M0, M0)
    say("GJ inverse", t)

    from kinetica_tpu.ops.dd import newton_schulz_refine
    Minv0 = jax.vmap(gj_inverse)(M0)
    t = chain_time(
        lambda Mi: jax.vmap(newton_schulz_refine)(Mi, M0)[0] * 0.999
        + 0.001 * Minv0, Minv0)
    say("newton_schulz_refine (gated)", t)

    # full newton_factor (GJ + equilibrate + NS) as used per step
    J32 = jax.vmap(lambda uu, kk: net32.jac(uu.astype(jnp.float32), kk))(
        u0s, kp[0])
    c = jnp.full((B,), 1e-4)

    def factor_lane(J, cc):
        return newton_factor(J, cc.astype(jnp.float64), jnp.float32,
                             method="inv").lu

    t = chain_time(lambda J: jax.vmap(factor_lane)(J, c) * 1e-30 + J, J32)
    say("newton_factor(inv) full", t)

    # newton_solve (inv path, refine=1 + adaptive)
    fact = jax.vmap(lambda J, cc: newton_factor(
        J.astype(jnp.float64), cc, jnp.float32, method="inv"))(
        J32.astype(jnp.float64), c.astype(jnp.float64))
    b0 = jnp.asarray(rng.standard_normal((B, ns)))

    def solve_lane(f_lu, f_J, f_c, bb):
        f = NewtonFactors(lu=f_lu, piv=jnp.zeros((ns,), jnp.int32),
                          J=f_J, c=f_c)
        return newton_solve(f, bb, refine=1, method="inv")

    t = chain_time(lambda b: 1e-30 * jax.vmap(solve_lane)(
        fact.lu, fact.J, fact.c, b) + b0, b0)
    say("newton_solve(inv,refine=1+ad)", t)

    # D rescale (change_D)
    D0 = jnp.asarray(rng.standard_normal((B, bdf.MAX_ORDER + 3, ns)))
    order = jnp.full((B,), 3, jnp.int32)
    t = chain_time(lambda D: jax.vmap(
        lambda DD, oo: bdf._change_D(DD, oo, jnp.asarray(0.7)))(D, order)
        * 0.999 + 0.001 * D0, D0)
    say("_change_D", t)

    # Arrhenius prepare (pair_from_f64 of precomputed k) — continuous mode
    # evaluates exp too; discrete mode only gathers
    Eaj = jnp.asarray(Ea)
    Aj = jnp.asarray(A)

    def k_of_T(T):
        from kinetica_tpu import constants
        k = Aj * jnp.exp(-Eaj / (constants.R * T)) * constants.N_A
        return 1.0 / (1.0 / 1e12 + 1.0 / k)

    Tb = jnp.asarray(Ts)
    t = chain_time(lambda T: T + 1e-30 * jax.vmap(
        lambda tt: k_of_T(tt)[0])(T), Tb)
    say("arrhenius k(T) f64", t)

    t = chain_time(lambda T: T + 1e-30 * jax.vmap(
        lambda tt: dd.pair_from_f64(k_of_T(tt))[0][0])(T), Tb)
    say("arrhenius + pair split", t)


if __name__ == "__main__":
    main()
