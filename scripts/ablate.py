"""Ablation study of the vmapped BDF step cost at nc=24, B=64.

Each variant recompiles the chunk program with one element changed; times
are reported per step (max step count over lanes). Also times individual
kernels (jac32, GJ inverse, rhs64) with chained scans.

Run: python scripts/ablate.py
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
from kinetica_tpu.models.mass_action import build_mass_action
from kinetica_tpu.ops import bdf
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

NC, B, TF = 24, 64, 0.1
RTOL, ATOL = 1e-8, 1e-10


def say(*a):
    print(*a)
    sys.stdout.flush()


def main():
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    net64 = build_mass_action(rd, sd.n, dtype=jnp.float64)
    net32 = build_mass_action(rd, sd.n, dtype=jnp.float32)
    ns, nr = sd.n, rd.nr
    Ts = np.linspace(500.0, 535.0, B)
    ks = jnp.asarray(np.stack([np.asarray(calc(T=jnp.asarray(T)))
                               for T in Ts]))
    u0 = np.zeros(ns)
    u0[sd.toInt[f"C{NC}"]] = 1.0
    u0s = jnp.asarray(np.tile(u0, (B, 1)))
    saveat = jnp.asarray([TF])
    say(f"nr={nr} ns={ns} B={B}")

    def run(name, rhs, jac, **kw):
        def solve_one(u0, k):
            return bdf.bdf_solve(rhs, jac, u0, 0.0, TF, saveat,
                                 rtol=RTOL, atol=ATOL, max_steps=1500,
                                 nonnegative_project=True, args=k, **kw)
        try:
            fn = jax.jit(jax.vmap(solve_one))
            t0 = time.perf_counter()
            res = fn(u0s, ks)
            np.asarray(res.ys)
            tc = time.perf_counter() - t0
            nst = int(np.asarray(res.n_steps).max())
            st = int(np.asarray(res.status).min())
            t0 = time.perf_counter()
            for _ in range(3):
                res = fn(u0s, ks)
            np.asarray(res.ys)
            dt = (time.perf_counter() - t0) / 3
            say(f"{name:42s} {dt:7.2f}s  steps={nst:4d} "
                f"ms/step={dt*1e3/nst:6.2f} status={st} "
                f"(compile+1 {tc:.0f}s)")
        except Exception as exc:
            say(f"{name:42s} FAILED: {type(exc).__name__} {exc}")

    def rhs64(t, u, k):
        return net64.rhs(u, k)

    def jac32(t, u, k):
        return net32.jac(u.astype(jnp.float32), k.astype(jnp.float32))

    def rhs32(t, u, k):
        return net32.rhs(u.astype(jnp.float32),
                         k.astype(jnp.float32)).astype(u.dtype)

    J0 = jax.vmap(lambda u, k: net32.jac(u.astype(jnp.float32),
                                         k.astype(jnp.float32)))(
        u0s + 0.01, ks)

    run("baseline f64rhs/f32jac/inv/refine1", rhs64, jac32)
    run("rhs f32 (attribution)", rhs32, jac32)
    run("refine=0", rhs64, jac32, refine=0)
    run("linsolve=lu", rhs64, jac32, linsolve="lu")

    # frozen Jacobian: isolates the per-step jac re-evaluation cost
    # (Newton may take a couple more iterations; GJ/factor path unchanged)
    idx = jnp.arange(B)

    def run_frozen():
        def solve_one(u0, k, i):
            jacf = lambda t, u, kk: J0[i]
            return bdf.bdf_solve(rhs64, jacf, u0, 0.0, TF, saveat,
                                 rtol=RTOL, atol=ATOL, max_steps=1500,
                                 nonnegative_project=True, args=k)
        try:
            fn = jax.jit(jax.vmap(solve_one))
            res = fn(u0s, ks, idx)
            np.asarray(res.ys)
            nst = int(np.asarray(res.n_steps).max())
            st = int(np.asarray(res.status).min())
            t0 = time.perf_counter()
            for _ in range(3):
                res = fn(u0s, ks, idx)
            np.asarray(res.ys)
            dt = (time.perf_counter() - t0) / 3
            say(f"{'frozen jac (isolates jac eval)':42s} {dt:7.2f}s  "
                f"steps={nst:4d} ms/step={dt*1e3/nst:6.2f} status={st}")
        except Exception as exc:
            say(f"frozen jac FAILED: {type(exc).__name__} {exc}")

    run_frozen()

    # ---- chained kernel timings ----
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

    t = chain_time(lambda u: u + 1e-30 * jax.vmap(net64.rhs)(u, ks), u0s)
    say(f"kernel rhs64:  {t*1e6:8.1f} us/eval")
    t = chain_time(lambda u: u + 1e-30 * jax.vmap(
        lambda uu, kk: net32.jac(uu.astype(jnp.float32),
                                 kk.astype(jnp.float32)))(u, ks)[:, 0].astype(u.dtype),
        u0s)
    say(f"kernel jac32:  {t*1e6:8.1f} us/eval")

    from kinetica_tpu.ops.pallas_linalg import gj_inverse
    M0 = jnp.asarray(np.random.default_rng(0).standard_normal((B, ns, ns)),
                     jnp.float32) + 10.0 * jnp.eye(ns, dtype=jnp.float32)
    t = chain_time(lambda M: jax.vmap(gj_inverse)(M) + M0, M0)
    say(f"kernel GJinv:  {t*1e6:8.1f} us/eval")


if __name__ == "__main__":
    main()
