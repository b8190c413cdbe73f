"""Microbench: NS residual formulations + Jacobian contraction forms.

Candidates measured isolated AND inside a while_loop (the f64
dot_general emulation degraded ~50x in-situ in round 2 — never trust an
isolated number for an op that will live in the stepper's loop body):

  residual:  pair   — current fori_loop TwoProd/TwoSum chain
             f64dot — I - A64 @ M64 via XLA's emulated-f64 MXU matmul
  jacobian:  segsum — current segment-sum over (reaction, slot) pairs
             matmul — one-hot^T @ (w-scaled N) per slot, MXU f32

Run on TPU: python scripts/microbench_ns_jac.py [--nc 60] [--b 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import kinetica_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kinetica_tpu.models.mass_action import build_mass_action
from kinetica_tpu.ops.dd import residual_eye_pair
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def residual_f64(A32, M32):
    n = A32.shape[-1]
    P = jnp.matmul(A32.astype(jnp.float64), M32.astype(jnp.float64),
                   precision=lax.Precision.HIGHEST)
    return (jnp.eye(n, dtype=jnp.float64) - P).astype(jnp.float32)


def in_loop(fn, iters=8):
    """Run fn(A, M) inside a while_loop (M updated each iteration so the
    loop cannot be collapsed), mimicking the stepper's in-situ context."""
    def run(A, M):
        def body(carry):
            M, i = carry
            R = fn(A, M)
            M = M + 1e-30 * R.astype(M.dtype)
            return M, i + 1

        M, _ = lax.while_loop(lambda c: c[1] < iters, body,
                              (M, jnp.asarray(0, jnp.int32)))
        return M
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nc", type=int, default=60)
    ap.add_argument("--b", type=int, default=64)
    args = ap.parse_args()

    sd, rd, Ea, A_arr = synthetic_pyrolysis_network(args.nc)
    net64 = build_mass_action(rd, sd.n, dtype=jnp.float64)
    net32 = build_mass_action(rd, sd.n, dtype=jnp.float32)
    ns, nr = sd.n, net64.nr
    print(f"nc={args.nc}: nr={nr} ns={ns} B={args.b}")

    rng = np.random.default_rng(0)
    B = args.b
    # representative Newton matrices: equilibrated-ish random + identity
    A32 = jnp.asarray(rng.standard_normal((B, ns, ns)), jnp.float32) * 0.3 \
        + jnp.eye(ns, dtype=jnp.float32)
    M32 = jnp.linalg.inv(A32.astype(jnp.float32))

    vpair = jax.jit(jax.vmap(residual_eye_pair))
    vf64 = jax.jit(jax.vmap(residual_f64))
    print(f"residual pair   isolated: {timeit(vpair, A32, M32):8.3f} ms")
    print(f"residual f64dot isolated: {timeit(vf64, A32, M32):8.3f} ms")
    # accuracy cross-check
    Rp = jax.vmap(residual_eye_pair)(A32, M32)
    Rf = jax.vmap(residual_f64)(A32, M32)
    print(f"  max|pair - f64dot| = {float(jnp.max(jnp.abs(Rp - Rf))):.3e}")

    lp = jax.jit(jax.vmap(in_loop(residual_eye_pair), in_axes=(0, 0)))
    lf = jax.jit(jax.vmap(in_loop(residual_f64), in_axes=(0, 0)))
    print(f"residual pair   in-loop(8): {timeit(lp, A32, M32, n=5):8.3f} ms "
          f"({timeit(lp, A32, M32, n=5)/8:.3f}/iter)")
    print(f"residual f64dot in-loop(8): {timeit(lf, A32, M32, n=5):8.3f} ms "
          f"({timeit(lf, A32, M32, n=5)/8:.3f}/iter)")

    # ---- jacobian forms ----
    u = jnp.asarray(np.abs(rng.standard_normal((B, ns))) * 1e-3)
    kk = jnp.asarray(np.abs(rng.standard_normal((B, nr))) * 1e6)
    u32, k32 = u.astype(jnp.float32), kk.astype(jnp.float32)

    jseg32 = jax.jit(jax.vmap(net32.jac))
    print(f"jac segsum f32 isolated: {timeit(jseg32, u32, k32):8.3f} ms")

    def jac_matmul(net):
        slots = net.reac_slots
        N = net.N
        nsl = N.shape[1]

        def jac(u, k):
            from kinetica_tpu.models.mass_action import (_clip_pos,
                                                         _clip_pos_grad)
            u_aug = jnp.concatenate([_clip_pos(u, net.delta),
                                     jnp.ones((1,), dtype=u.dtype)])
            chain = _clip_pos_grad(u, net.delta)
            slot_u = u_aug[slots]                       # (nr, arity)
            ar = slots.shape[1]
            mask = ~jnp.eye(ar, dtype=bool)
            tiled = jnp.where(mask[None], slot_u[:, None, :], 1.0)
            w = k[:, None] * jnp.prod(tiled, axis=2)    # (nr, arity)
            JT = jnp.zeros((nsl + 1, nsl), dtype=u.dtype)
            ids = jnp.arange(nsl + 1, dtype=slots.dtype)
            for s in range(ar):
                onehot = (slots[:, s][:, None] == ids[None, :]).astype(u.dtype)
                JT = JT + jnp.matmul(onehot.T, w[:, s][:, None] * N,
                                     precision=lax.Precision.HIGHEST)
            return JT[:nsl].T * chain[None, :]
        return jac

    jm32 = jax.jit(jax.vmap(jac_matmul(net32)))
    print(f"jac matmul f32 isolated: {timeit(jm32, u32, k32):8.3f} ms")
    J1 = jseg32(u32, k32)
    J2 = jm32(u32, k32)
    scale = jnp.max(jnp.abs(J1))
    print(f"  max|seg - matmul|/max|J| = "
          f"{float(jnp.max(jnp.abs(J1 - J2)) / scale):.3e}")

    # in-loop variants (J feeds back weakly so the loop is real)
    def jl(jfn):
        def run(u, k):
            def body(carry):
                u, i = carry
                J = jfn(u, k)
                return u + 1e-30 * J[:, 0], i + 1
            u, _ = lax.while_loop(lambda c: c[1] < 8, body,
                                  (u, jnp.asarray(0, jnp.int32)))
            return u
        return run

    ls = jax.jit(jax.vmap(jl(net32.jac), in_axes=(0, 0)))
    lm = jax.jit(jax.vmap(jl(jac_matmul(net32)), in_axes=(0, 0)))
    print(f"jac segsum in-loop(8): {timeit(ls, u32, k32, n=5):8.3f} ms")
    print(f"jac matmul in-loop(8): {timeit(lm, u32, k32, n=5):8.3f} ms")


if __name__ == "__main__":
    main()
