"""In-situ step-cost comparison: XLA-rates+DD-contraction vs fused RHS.

One representative static-k stiff chunk at nc (default 24), B=64,
reporting ms/step for each RHS formulation inside the real BDF loop.
Run on TPU: python scripts/attrib_fused.py [nc]
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
from kinetica_tpu.ops.pallas_matmul import DDContraction, FusedMassActionRHS
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

NC = int(sys.argv[1]) if len(sys.argv) > 1 else 24
B = 64
TF = 0.1
RTOL, ATOL = 1e-8, 1e-10


def main():
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    net64 = build_mass_action(rd, sd.n, dtype=jnp.float64)
    net32 = build_mass_action(rd, sd.n, dtype=jnp.float32)
    ns = sd.n
    Ts = np.linspace(500.0, 560.0, B)
    ks = jnp.asarray(np.stack([np.asarray(calc(T=jnp.asarray(T)))
                               for T in Ts]))
    u0 = np.zeros(ns)
    u0[sd.toInt[f"C{NC}"]] = 1.0
    u0s = jnp.asarray(np.tile(u0, (B, 1)))
    saveat = jnp.asarray([TF])

    con_dd = DDContraction(net64.N)
    con_fused = FusedMassActionRHS(net64.N, net64.reac_slots)
    print(f"nr={net64.nr} ns={ns} B={B} fused mode={con_fused.mode}")

    def jac(t, u, kp):
        k32 = kp[0]
        return net32.jac(u.astype(jnp.float32), k32)

    def prepare(t_stage, t_start, k):
        return dd.pair_from_f64(k)

    def rhs_dd(t, u, kp):
        return con_dd.contract_pair(*net64.rates_pair(u, kp))

    def rhs_fused(t, u, kp):
        u_aug = jnp.concatenate([_clip_pos(u), jnp.ones((1,), u.dtype)])
        uh, ul = dd.pair_from_f64(u_aug)
        return con_fused.rhs_pair(uh, ul, *kp)

    for name, rhs in (("dd (XLA rates + kernel)", rhs_dd),
                      ("fused one-kernel rhs", rhs_fused)):
        def solve_one(u0, k):
            return bdf.bdf_solve(rhs, jac, u0, 0.0, TF, saveat,
                                 rtol=RTOL, atol=ATOL, max_steps=2500,
                                 nonnegative_project=True,
                                 prepare=prepare, args=k)

        fn = jax.jit(jax.vmap(solve_one))
        res = fn(u0s, ks)
        steps = int(np.asarray(res.n_steps).max())
        np.asarray(res.ys)
        t0 = time.perf_counter()
        n_rep = 3
        for _ in range(n_rep):
            res = fn(u0s, ks)
        np.asarray(res.ys)
        dt = (time.perf_counter() - t0) / n_rep
        print(f"{name:28s} {dt*1e3:8.1f} ms/chunk  steps={steps:5d} "
              f"ms/step={dt*1e3/steps:6.2f} "
              f"status_min={np.asarray(res.status).min()} "
              f"fev={int(np.asarray(res.n_fev).max())}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
