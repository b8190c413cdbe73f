"""Cost attribution for the vmapped BDF step at nc=24 (1095 rxns, B=64).

Runs one representative chunk (static-k, stiff mass action) repeatedly
under controlled solver variants and reports ms/STEP (normalised by the
actual accepted+rejected step count), so variants with different step
counts stay comparable.

Run: python scripts/attrib_step_cost.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from kinetica_tpu import constants
from kinetica_tpu.calculators.builtin import PrecalculatedArrheniusCalculator
from kinetica_tpu.models.mass_action import build_mass_action
from kinetica_tpu.ops import bdf
from kinetica_tpu.testing.synthetic import synthetic_pyrolysis_network

NC = int(sys.argv[1]) if len(sys.argv) > 1 else 24
B = 64
TF = 0.1          # one chunk
RTOL, ATOL = 1e-8, 1e-10


def setup():
    sd, rd, Ea, A = synthetic_pyrolysis_network(NC)
    calc = PrecalculatedArrheniusCalculator(Ea, A, k_max=1e12)
    net64 = build_mass_action(rd, sd.n, dtype=jnp.float64)
    net32 = build_mass_action(rd, sd.n, dtype=jnp.float32)
    ns = sd.n
    # per-lane temperatures -> k tables (B, nr); pure numpy — eager
    # emulated-f64 device dispatches here have crashed the remote worker
    from kinetica_tpu import constants
    Ts = np.linspace(500.0, 560.0, B)
    k_raw = (np.asarray(A)[None, :]
             * np.exp(-np.asarray(Ea)[None, :] / (constants.R * Ts[:, None]))
             * constants.N_A)
    ks = 1.0 / (1.0 / calc.k_max + 1.0 / k_raw)
    u0 = np.zeros(ns)
    u0[sd.toInt[f"C{NC}"]] = 1.0
    return net64, net32, jnp.asarray(ks), jnp.asarray(np.tile(u0, (B, 1)))


def run_variant(name, net64, net32, ks, u0s, rhs_mode="f64", jac_mode="f32",
                refine=1, linsolve="auto", rtol=RTOL, atol=ATOL):
    saveat = jnp.asarray([TF])

    if rhs_mode == "f64":
        def rhs(t, u, k):
            return net64.rhs(u, k)
    elif rhs_mode == "f32":
        def rhs(t, u, k):
            return net32.rhs(u.astype(jnp.float32),
                             k.astype(jnp.float32)).astype(u.dtype)
    if jac_mode == "f32":
        def jac(t, u, k):
            return net32.jac(u.astype(jnp.float32), k.astype(jnp.float32))
    else:
        def jac(t, u, k):
            return net64.jac(u, k)

    def solve_one(u0, k):
        return bdf.bdf_solve(rhs, jac, u0, 0.0, TF, saveat,
                             rtol=rtol, atol=atol, max_steps=2500,
                             nonnegative_project=True, refine=refine,
                             linsolve=linsolve, args=k)

    fn = jax.jit(jax.vmap(solve_one))
    res = fn(u0s, ks)
    steps = int(np.asarray(res.n_steps).max())
    ok = np.asarray(res.status).min()
    np.asarray(res.ys)
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        res = fn(u0s, ks)
    np.asarray(res.ys)
    dt = (time.perf_counter() - t0) / n_rep
    print(f"{name:34s} {dt*1e3:8.1f} ms/chunk  max_steps={steps:5d} "
          f"ms/step={dt*1e3/steps:6.2f}  status_min={ok} "
          f"fev={int(np.asarray(res.n_fev).max())} "
          f"jev={int(np.asarray(res.n_jev).max())} "
          f"lu={int(np.asarray(res.n_lu).max())}")
    return res


def main():
    net64, net32, ks, u0s = setup()
    print(f"nr={net64.nr} ns={net64.ns} B={B} chunk tf={TF}")
    import traceback
    if net64.nr > 3000 and jax.default_backend() not in ("cpu",):
        # the raw emulated-f64 dense RHS/jac at >~3000 reactions has
        # repeatedly CRASHED the remote-attached TPU worker (kernel
        # fault, multi-minute recovery); this script exists for the
        # f64-vs-f32 attribution at bench scale — at multi-tile scale
        # use scripts/attrib_step_parts.py (production builders) instead.
        print("SKIP: nr > 3000 on an accelerator backend — raw-f64 dense "
              "variants crash the remote TPU worker; use "
              "attrib_step_parts.py for this scale.")
        return
    variants = [
        ("baseline f64rhs/f32jac/inv/ref1", {}),
        ("rhs f32 @rtol1e-6 (attribution)", dict(rhs_mode="f32", rtol=1e-6, atol=1e-8)),
        ("baseline @rtol1e-6 (for f32 cmp)", dict(rtol=1e-6, atol=1e-8)),
        ("refine=0", dict(refine=0)),
        ("jac f64", dict(jac_mode="f64")),
        ("linsolve=lu", dict(linsolve="lu")),
    ]
    for name, kw in variants:
        try:
            run_variant(name, net64, net32, ks, u0s, **kw)
        except Exception:
            traceback.print_exc()
        sys.stdout.flush()


if __name__ == "__main__":
    main()
