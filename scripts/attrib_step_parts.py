"""Decompose the PRODUCTION per-step cost at the bench scale
(nc=24 -> 1095 rxns / 73 species, B=64), using the production RHS/jac
builders (_make_rhs_jac + _resolve_contraction: fused Pallas RHS, pair-
precision k, f32 analytic Jacobian) on a single representative chunk.

Variants isolate one production ingredient each:

  1. static-k baseline       (prepare = pair-split of a constant k)
  2. +prepare const-T        (Arrhenius k(T) eval per step attempt)
  3. +prepare ramp 50K/s     (time-varying k: production rate regime)
  4. +dense saveat           (production save-grid density)
  5. lu_drift_tol sweep      (refactor frequency)
  6. jac_policy=always       (unconditional J+LU per attempt)

Run on TPU: python scripts/attrib_step_parts.py [variant ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

import kinetica_tpu  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from kinetica_tpu import constants
from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.models.mass_action import build_mass_action
from kinetica_tpu.ops import bdf
from kinetica_tpu.solving.methods import (_jac_dtype, _make_rhs_jac,
                                          _resolve_contraction)
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

NC = int(os.environ.get("KINETICA_BENCH_NC", "24"))
B = 64
TF = 0.5
RTOL, ATOL = 1e-8, 1e-10


def setup():
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    net = build_mass_action(rd, sd.n, dtype=jnp.float64)
    jnet = (build_mass_action(rd, sd.n, dtype=jnp.float32)
            if _jac_dtype() == jnp.float32 else net)
    contraction = _resolve_contraction(net)
    ns = sd.n
    T0s = np.linspace(500.0, 560.0, B)
    k_raw = (np.asarray(A)[None, :]
             * np.exp(-np.asarray(Ea)[None, :] / (constants.R * T0s[:, None]))
             * constants.N_A)
    ks = 1.0 / (1.0 / calc.k_max + 1.0 / k_raw)
    u0 = np.zeros(ns)
    u0[sd.toInt[f"C{NC}"]] = 1.0
    return dict(net=net, jnet=jnet, contraction=contraction,
                Ea=jnp.asarray(Ea), A=jnp.asarray(A), k_max=calc.k_max,
                ks=jnp.asarray(ks), u0s=jnp.asarray(np.tile(u0, (B, 1))),
                T0s=jnp.asarray(T0s))


def run_variant(name, env, mode="static", n_save=2, lu_drift_tol=0.1,
                jac_policy="lazy", ramp=0.0):
    saveat = jnp.linspace(0.0, TF, n_save)[1:]
    zero = jnp.asarray(0.0)

    if mode == "static":
        rhs, jac, prepare = _make_rhs_jac(
            env["net"], "static", jac_net=env["jnet"],
            contraction=env["contraction"])

        def solve_one(u0, k):
            return bdf.bdf_solve(rhs, jac, u0, 0.0, TF, saveat,
                                 rtol=RTOL, atol=ATOL, max_steps=6000,
                                 nonnegative_project=True,
                                 lu_drift_tol=lu_drift_tol,
                                 jac_policy=jac_policy,
                                 prepare=prepare, args=(zero, k))

        fn = jax.jit(jax.vmap(solve_one))
        call = lambda: fn(env["u0s"], env["ks"])  # noqa: E731
    else:  # continuous_theta: per-lane T(t) = T0 + ramp*t, like production
        Ea, A, k_max = env["Ea"], env["A"], env["k_max"]

        def k_fn(t, theta):
            T = theta + ramp * t
            k_raw = A * jnp.exp(-Ea / (constants.R * T)) * constants.N_A
            return 1.0 / (1.0 / k_max + 1.0 / k_raw)

        rhs, jac, prepare = _make_rhs_jac(
            env["net"], "continuous_theta", k_fn=k_fn, jac_net=env["jnet"],
            contraction=env["contraction"])

        def solve_one(u0, T0):
            return bdf.bdf_solve(rhs, jac, u0, 0.0, TF, saveat,
                                 rtol=RTOL, atol=ATOL, max_steps=6000,
                                 nonnegative_project=True,
                                 lu_drift_tol=lu_drift_tol,
                                 jac_policy=jac_policy,
                                 prepare=prepare, args=(zero, T0))

        fn = jax.jit(jax.vmap(solve_one))
        call = lambda: fn(env["u0s"], env["T0s"])  # noqa: E731

    res = call()
    steps = int(np.asarray(res.n_steps).max())
    ok = int(np.asarray(res.status).min())
    np.asarray(res.ys)
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        res = call()
    np.asarray(res.ys)
    dt = (time.perf_counter() - t0) / n_rep
    print(f"{name:38s} {dt*1e3:8.1f} ms/chunk  max_steps={steps:5d} "
          f"ms/step={dt*1e3/steps:6.2f}  status_min={ok} "
          f"fev={int(np.asarray(res.n_fev).max())} "
          f"jev={int(np.asarray(res.n_jev).max())} "
          f"lu={int(np.asarray(res.n_lu).max())}", flush=True)


VARIANTS = {
    "static-k": dict(),
    "+prepare const-T": dict(mode="cont"),
    "+prepare ramp50": dict(mode="cont", ramp=50.0),
    "+dense saveat (28)": dict(mode="cont", ramp=50.0, n_save=29),
    "drift_tol=0.3": dict(mode="cont", ramp=50.0, lu_drift_tol=0.3),
    "drift_tol=0.02": dict(mode="cont", ramp=50.0, lu_drift_tol=0.02),
    "jac=always": dict(mode="cont", ramp=50.0, jac_policy="always"),
    "static-k jac=always": dict(jac_policy="always"),
}


def main():
    env = setup()
    print(f"nr={env['net'].nr} ns={env['net'].ns} B={B} chunk tf={TF} "
          f"contraction={type(env['contraction']).__name__}", flush=True)
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            run_variant(name, env, **VARIANTS[name])
        except Exception as exc:
            print(f"{name:38s} FAILED: {type(exc).__name__}: {exc}",
                  flush=True)


if __name__ == "__main__":
    main()
