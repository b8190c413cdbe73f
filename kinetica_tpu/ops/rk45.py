"""Adaptive explicit Runge-Kutta (Dormand-Prince 5(4)) in JAX.

The non-stiff companion to :mod:`kinetica_tpu.ops.bdf`: used for gradient
condition-profile integration (the reference uses OwrenZen5 there,
condition_set.jl:260-268), the molecule-system packer's damped spring ODE
(molecule_system.jl:164-225), and CRNs mild enough not to need Newton.
Same conventions as bdf_solve: statically-shaped saveat grid filled from
dense output (quartic Hermite on the DP5 stages), optional stops clamping,
jit/vmap-safe ``lax.while_loop`` stepping, (t, y[, args]) RHS signature.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

RUNNING, DONE, FAIL_MAX_STEPS, FAIL_H_UNDERFLOW = 0, 1, -1, -2

# Dormand-Prince 5(4) tableau
# tableau as host numpy: creating jnp arrays at module import would
# initialise the JAX backend as a side effect of `import kinetica_tpu`
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B_ERR = _B - np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                         -92097 / 339200, 187 / 2100, 1 / 40])
# dense output (quartic interpolant) coefficients for DP5
_P = np.array([
    [1.0, -8048581381 / 2820520608, 8663915743 / 2820520608, -12715105075 / 11282082432],
    [0.0, 0.0, 0.0, 0.0],
    [0.0, 131558114200 / 32700410799, -68118460800 / 10900136933, 87487479700 / 32700410799],
    [0.0, -1754552775 / 470086768, 14199869525 / 1410260304, -10690763975 / 1880347072],
    [0.0, 127303824393 / 49829197408, -318862633887 / 49829197408, 701980252875 / 199316789632],
    [0.0, -282668133 / 205662961, 2019193451 / 616988883, -1453857185 / 822651844],
    [0.0, 40617522 / 29380423, -110615467 / 29380423, 69997945 / 29380423],
])


class RK45Results(NamedTuple):
    ys: jnp.ndarray
    status: jnp.ndarray
    t: jnp.ndarray
    y_final: jnp.ndarray
    n_steps: jnp.ndarray
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    h: jnp.ndarray


def _rms(x):
    return jnp.sqrt(jnp.mean(x * x))


@partial(jax.jit, static_argnames=("rhs", "max_steps", "nonnegative"))
def rk45_solve(rhs: Callable, y0: jnp.ndarray, t0, tf, saveat: jnp.ndarray,
               rtol=1e-6, atol=1e-9, stops: jnp.ndarray | None = None,
               max_steps: int = 100000, first_step=None,
               nonnegative: bool = False, args=None) -> RK45Results:
    """Integrate dy/dt = rhs(t, y[, args]) with adaptive DP5(4)."""
    import inspect

    def _adapt(fn):
        try:
            n = len(inspect.signature(fn).parameters)
        except (TypeError, ValueError):
            n = 3
        if n >= 4:
            return lambda t, y, t_start: fn(t, y, args, t_start)
        if n == 3:
            return lambda t, y, t_start: fn(t, y, args)
        return lambda t, y, t_start: fn(t, y)

    f = _adapt(rhs)
    dtype = y0.dtype
    ns = y0.shape[0]
    t0 = jnp.asarray(t0, dtype)
    tf = jnp.asarray(tf, dtype)
    saveat = jnp.asarray(saveat, dtype)
    n_save = saveat.shape[0]
    stops = (jnp.full((1,), jnp.inf, dtype=dtype) if stops is None
             else jnp.asarray(stops, dtype))
    n_stops = stops.shape[0]
    eps = jnp.finfo(dtype).eps
    tscale = jnp.maximum(jnp.abs(tf), 1.0)

    f0 = f(t0, y0, t0)
    scale0 = atol + jnp.abs(y0) * rtol
    d0 = _rms(y0 / scale0)
    d1 = _rms(f0 / scale0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    if first_step is not None:
        h0 = jnp.asarray(first_step, dtype)
    h0 = jnp.minimum(h0, tf - t0)

    A_rows = [jnp.asarray(row + [0.0] * (7 - len(row)), dtype) for row in _A]

    class S(NamedTuple):
        t: jnp.ndarray
        y: jnp.ndarray
        fcur: jnp.ndarray
        h: jnp.ndarray
        status: jnp.ndarray
        n_steps: jnp.ndarray
        n_acc: jnp.ndarray
        n_rej: jnp.ndarray
        save_ptr: jnp.ndarray
        ys: jnp.ndarray
        stop_ptr: jnp.ndarray

    save_ptr0 = jnp.searchsorted(saveat, t0, side="right").astype(jnp.int32)
    stop_ptr0 = jnp.searchsorted(stops, t0 + 4 * eps * tscale,
                                 side="left").astype(jnp.int32)
    s0 = S(t0, y0, f0, h0, jnp.asarray(RUNNING, jnp.int32),
           jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
           jnp.asarray(0, jnp.int32), save_ptr0,
           jnp.zeros((n_save, ns), dtype), stop_ptr0)

    def attempt(s: S) -> S:
        h_min = jnp.abs(s.t) * eps * 10 + jnp.finfo(dtype).tiny * 1e4
        next_stop = jnp.where(s.stop_ptr < n_stops,
                              stops[jnp.minimum(s.stop_ptr, n_stops - 1)],
                              jnp.asarray(jnp.inf, dtype))
        t_bound = jnp.minimum(tf, next_stop)
        clamp = (s.t + 1.02 * s.h) >= (t_bound - 4 * eps * tscale)
        h = jnp.where(clamp, jnp.maximum(t_bound - s.t, h_min), s.h)
        t_new = jnp.where(clamp, t_bound, s.t + h)

        ks = [s.fcur]
        for i in range(1, 7):
            a = A_rows[i]
            incr = sum(a[j] * ks[j] for j in range(i))
            ti = s.t + _C[i].astype(dtype) * h
            ks.append(f(jnp.where(i == 6, t_new, ti), s.y + h * incr, s.t))
        K = jnp.stack(ks)                                 # (7, ns)
        y_new = s.y + h * (_B.astype(dtype) @ K)
        err = h * (_B_ERR.astype(dtype) @ K)
        scale = atol + rtol * jnp.maximum(jnp.abs(s.y), jnp.abs(y_new))
        err_norm = _rms(err / scale)
        neg = jnp.asarray(nonnegative) & (jnp.min(y_new) < 0.0)
        accept = (err_norm <= 1.0) & (~neg) & jnp.all(jnp.isfinite(y_new))

        factor = jnp.where(err_norm > 0,
                           0.9 * err_norm ** (-0.2),
                           jnp.asarray(10.0, dtype))
        factor = jnp.clip(factor, 0.2, 10.0)
        factor = jnp.where(jnp.isfinite(factor) & (factor > 0), factor, 0.5)
        factor = jnp.where(neg, jnp.minimum(factor, 0.5), factor)

        def on_accept():
            # dense output: y(t + s*h) = y + h * sum_i K_i * P poly(s)
            def dense(tq):
                x = (tq - s.t) / h
                xp = jnp.stack([x, x ** 2, x ** 3, x ** 4])
                coeff = _P.astype(dtype) @ xp[: _P.shape[1]]
                return s.y + h * (coeff @ K)

            def fill_cond(c):
                ptr, _ = c
                ok = saveat[jnp.minimum(ptr, n_save - 1)] <= t_new + 4 * eps * tscale
                return (ptr < n_save) & ok

            def fill_body(c):
                ptr, ys = c
                ys = lax.dynamic_update_slice(ys, dense(saveat[ptr])[None, :],
                                              (ptr, jnp.asarray(0, ptr.dtype)))
                return ptr + 1, ys

            save_ptr, ys = lax.while_loop(fill_cond, fill_body,
                                          (s.save_ptr, s.ys))
            done = t_new >= tf - 4 * eps * tscale
            hit = jnp.abs(t_new - next_stop) <= 4 * eps * tscale
            new_h = jnp.where(clamp, s.h, h * factor)
            return s._replace(
                t=t_new, y=y_new, fcur=K[6], h=new_h,
                status=jnp.where(done, DONE, RUNNING).astype(jnp.int32),
                n_acc=s.n_acc + 1, save_ptr=save_ptr, ys=ys,
                stop_ptr=s.stop_ptr + hit.astype(jnp.int32))

        def on_reject():
            return s._replace(h=h * jnp.minimum(factor, 0.9),
                              n_rej=s.n_rej + 1)

        s2 = lax.cond(accept, on_accept, on_reject)
        s2 = s2._replace(n_steps=s.n_steps + 1)
        status = jnp.where(s2.status == DONE, DONE,
                           jnp.where(s2.n_steps >= max_steps, FAIL_MAX_STEPS,
                                     jnp.where(s2.h < h_min, FAIL_H_UNDERFLOW,
                                               RUNNING)))
        return s2._replace(status=status.astype(jnp.int32))

    final = lax.while_loop(
        lambda s: s.status == RUNNING,
        lambda s: lax.cond(s.status == RUNNING, attempt, lambda x: x, s),
        s0)
    return RK45Results(ys=final.ys, status=final.status, t=final.t,
                       y_final=final.y, n_steps=final.n_steps,
                       n_accepted=final.n_acc, n_rejected=final.n_rej,
                       h=final.h)
