"""Condition profiles: static values and time-varying ramps.

Same capability as the reference's conditions layer
(/root/reference/src/conditions/): a profile is either

* static — a constant (static.jl:7-9),
* direct — a closed form X(t) (direct_variable.jl),
* gradient — defined by dX/dt(t) (gradient_variable.jl).

All time functions here are written as branchless ``jnp.where`` chains so
they are jit/vmap-traceable — the reference writes the same piecewise forms
branchlessly for Symbolics compatibility (direct_variable.jl:144-150), which
translates one-to-one. Gradient profiles additionally carry an exact
closed-form ``value(t)`` (the analytic antiderivative) where the reference
integrates a one-equation MTK ODESystem (gradient_variable.jl:35-64);
user-defined gradient profiles without a closed form are integrated
numerically by :meth:`GradientProfile.solve`.

Authoring contract for new profiles (mirrors
docs/src/development/condition-profiles.md:26-62): subclass
``DirectProfile``/``GradientProfile``, provide ``f``/``grad``, ``X_start``,
``t_end`` and a ``create_discrete_tstops`` method.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.interpolation import TimeSeries
from ..utils.time_units import create_savepoints


class AbstractProfile:
    is_static = False
    is_variable = False
    is_gradient = False
    is_direct = False

    # -- batched (theta-parameterised) evaluation ------------------------
    # ``theta_fields`` lists the float attributes ``value(t)`` reads;
    # packing them into a vector lets one traced evaluation serve a whole
    # ensemble of same-class profiles (vmap over theta) — the continuous
    # rate mode of parallel.batching builds k(T(t, theta)) this way.
    # ``static_attrs`` are non-numeric attributes that select trace-time
    # branches (e.g. DoubleRamp's ``blended``); members batched together
    # must agree on them (checked via ``static_key``).
    theta_fields: tuple = ()
    static_attrs: tuple = ()

    def theta(self) -> np.ndarray:
        """Numeric parameter vector consumed by :meth:`value_theta`."""
        if not self.theta_fields:
            raise NotImplementedError(
                f"{type(self).__name__} does not define theta_fields; "
                "batched continuous evaluation is unavailable for it.")
        return np.array([float(getattr(self, f)) for f in self.theta_fields])

    def static_key(self) -> tuple:
        """Trace signature: profiles sharing it can be batched together."""
        return (type(self).__name__,) + tuple(
            getattr(self, f) for f in self.static_attrs)

    @classmethod
    def value_theta(cls, t, theta, static_vals: tuple = ()):
        """Evaluate the profile value at ``t`` from a traced theta vector."""
        if not cls.theta_fields:
            raise NotImplementedError(
                f"{cls.__name__} does not define theta_fields.")
        obj = object.__new__(cls)
        for name, v in zip(cls.static_attrs, static_vals):
            setattr(obj, name, v)
        for i, name in enumerate(cls.theta_fields):
            setattr(obj, name, theta[i])
        return obj.value(t)


class StaticConditionProfile(AbstractProfile):
    """Constant condition (reference static.jl:7-9)."""
    is_static = True
    theta_fields = ("value",)

    def __init__(self, value: float):
        self.value = float(value)

    @classmethod
    def value_theta(cls, t, theta, static_vals: tuple = ()):
        return theta[0] * jnp.ones_like(jnp.asarray(t, jnp.result_type(float)))

    def __repr__(self):
        return f"StaticConditionProfile({self.value})"


class VariableProfile(AbstractProfile):
    """Base for time-varying profiles; carries tstops and a solved series."""
    is_variable = True

    X_start: float
    t_end: float

    def __init__(self):
        self.tstops: np.ndarray = np.array([])
        self.sol: TimeSeries | None = None

    # -- traceable condition value at time t (jnp scalar or array) --
    def value(self, t):
        raise NotImplementedError

    def create_discrete_tstops(self, ts_update: float) -> None:
        """Default: uniform stops every ``ts_update`` over [0, t_end]."""
        if ts_update > self.t_end:
            raise ValueError("Error defining tstops, `ts_update` is too large.")
        self.tstops = create_savepoints(0.0, self.t_end, ts_update)

    def solve(self, pars, reset: bool = False) -> None:
        """Tabulate the profile over ``pars.tspan`` into ``self.sol``.

        Mirrors solve_variable_condition! (direct_variable.jl:34-43): direct
        profiles are tabulated exactly; gradient profiles use their analytic
        ``value`` when available, else adaptive RK integration.
        """
        if self.sol is not None and not reset:
            return
        save_interval = (pars.save_interval if pars.save_interval is not None
                         else pars.tspan[1] / 1000)
        t = create_savepoints(pars.tspan[0], pars.tspan[1], save_interval)
        if len(self.tstops):
            t = np.unique(np.concatenate([t, np.asarray(self.tstops, dtype=np.float64)]))
        # Tabulation is host work: pin it to the CPU backend so a remote
        # accelerator (if registered) is not hit with one tunnel dispatch
        # per profile (~25-45 ms each when batching ensembles).
        import jax
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            u = np.asarray(self.value(jax.device_put(t, cpu)),
                           dtype=np.float64)
        self.sol = TimeSeries(t, u)

    def minimum(self) -> float:
        if self.sol is None:
            raise RuntimeError("Condition profile is missing a solution.")
        return self.sol.min()

    def maximum(self) -> float:
        if self.sol is None:
            raise RuntimeError("Condition profile is missing a solution.")
        return self.sol.max()


class DirectProfile(VariableProfile):
    """Profile defined by a closed-form f(t) (direct_variable.jl)."""
    is_direct = True

    def f(self, t):
        raise NotImplementedError

    def value(self, t):
        return self.f(t)


class GradientProfile(VariableProfile):
    """Profile defined by dX/dt(t) (gradient_variable.jl).

    Subclasses should provide ``grad(t)`` and, when possible, an exact
    ``value(t)``; otherwise ``value`` integrates ``grad`` numerically on a
    dense grid at construction time (set ``_needs_numeric=True``).
    """
    is_gradient = True
    _needs_numeric = False

    def grad(self, t):
        raise NotImplementedError

    def value(self, t):
        if not self._needs_numeric:
            raise NotImplementedError
        if self.sol is None:
            raise RuntimeError("Numeric gradient profile must be solved first.")
        tq = np.asarray(t, dtype=np.float64)
        return jnp.asarray(self.sol(tq))

    def solve(self, pars, reset: bool = False) -> None:
        if not self._needs_numeric:
            return super().solve(pars, reset=reset)
        if self.sol is not None and not reset:
            return
        # Dense cumulative integration of grad() with Simpson-grade accuracy.
        save_interval = (pars.save_interval if pars.save_interval is not None
                         else pars.tspan[1] / 1000)
        t = create_savepoints(pars.tspan[0], pars.tspan[1], save_interval)
        if len(self.tstops):
            t = np.unique(np.concatenate([t, np.asarray(self.tstops, dtype=np.float64)]))
        # Refine each interval with midpoint sampling (Simpson's rule).
        g = np.asarray(self.grad(jnp.asarray(t)), dtype=np.float64)
        tm = 0.5 * (t[:-1] + t[1:])
        gm = np.asarray(self.grad(jnp.asarray(tm)), dtype=np.float64)
        dt = np.diff(t)
        increments = dt / 6.0 * (g[:-1] + 4.0 * gm + g[1:])
        u = self.X_start + np.concatenate([[0.0], np.cumsum(increments)])
        self.sol = TimeSeries(t, u)


# -----------------------------------------------
# Direct profiles (reference direct_variable.jl)
# -----------------------------------------------

class NullDirectProfile(DirectProfile):
    """Debug profile: X(t) = X_start always (direct_variable.jl:49-92)."""

    theta_fields = ("X_start",)

    def __init__(self, X_start: float, t_end: float):
        super().__init__()
        self.X_start = float(X_start)
        self.t_end = float(t_end)
        self.tstops = np.array([self.t_end])

    def f(self, t):
        return jnp.full_like(jnp.asarray(t, dtype=jnp.result_type(float)), self.X_start)


class LinearDirectProfile(DirectProfile):
    """Linear ramp X_start -> X_end at ``rate`` (direct_variable.jl:107-155)."""

    theta_fields = ("rate", "X_start", "X_end", "t_end")

    def __init__(self, rate: float, X_start: float, X_end: float):
        super().__init__()
        if (X_end < X_start and rate > 0) or (X_end > X_start and rate < 0):
            raise ValueError("Impossible condition ramp defined. "
                             "Check heating rates have the correct signs.")
        self.rate = float(rate)
        self.X_start = float(X_start)
        self.X_end = float(X_end)
        self.t_end = (X_end - X_start) / rate
        self.tstops = np.array([self.t_end])

    def f(self, t):
        t = jnp.asarray(t, dtype=jnp.result_type(float))
        ramp = self.X_start + self.rate * t
        return jnp.where(t <= 0.0, self.X_start,
                         jnp.where(t <= self.t_end, ramp, self.X_end))


# -----------------------------------------------
# Gradient profiles (reference gradient_variable.jl)
# -----------------------------------------------

class NullGradientProfile(GradientProfile):
    """Debug profile: dX/dt = 0 (gradient_variable.jl:70-114)."""

    theta_fields = ("X_start",)

    def __init__(self, X_start: float, t_end: float):
        super().__init__()
        self.X_start = float(X_start)
        self.t_end = float(t_end)
        self.tstops = np.array([self.t_end])

    def grad(self, t):
        return jnp.zeros_like(jnp.asarray(t, dtype=jnp.result_type(float)))

    def value(self, t):
        return jnp.full_like(jnp.asarray(t, dtype=jnp.result_type(float)), self.X_start)


class LinearGradientProfile(GradientProfile):
    """dX/dt = rate until X_end is reached (gradient_variable.jl:120-175)."""

    theta_fields = ("rate", "X_start", "X_end", "t_end")

    def __init__(self, rate: float, X_start: float, X_end: float):
        super().__init__()
        if (X_end < X_start and rate > 0) or (X_end > X_start and rate < 0):
            raise ValueError("Impossible condition ramp defined. "
                             "Check heating rates have the correct signs.")
        self.rate = float(rate)
        self.X_start = float(X_start)
        self.X_end = float(X_end)
        self.t_end = (X_end - X_start) / rate
        self.tstops = np.array([self.t_end])

    def grad(self, t):
        t = jnp.asarray(t, dtype=jnp.result_type(float))
        return jnp.where(t <= self.t_end, self.rate, 0.0)

    def value(self, t):
        t = jnp.asarray(t, dtype=jnp.result_type(float))
        return jnp.where(t <= self.t_end, self.X_start + self.rate * t, self.X_end)


class DoubleRampGradientProfile(GradientProfile):
    """Two ramps with three plateaus and optional gradient blending.

    Geometry and tstop placement mirror reference
    gradient_variable.jl:181-309::

                      ------   X_mid
              rate1  /      \\
                    /        \\  rate2
        X_start ----          \\
                               ----- X_end
    """

    theta_fields = ("X_start", "X_mid", "X_end", "rate1", "rate2",
                    "t_startr1", "t_endr1", "t_startr2", "t_endr2", "t_blend")
    static_attrs = ("blended",)
    def __init__(self, X_start: float, t_start_plateau: float, rate1: float,
                 X_mid: float, t_mid_plateau: float, rate2: float, X_end: float,
                 t_end_plateau: float, t_blend: float | None = None):
        super().__init__()
        if ((X_mid > X_start and rate1 < 0) or (X_mid < X_start and rate1 > 0)
                or (X_end > X_mid and rate2 < 0) or (X_end < X_mid and rate2 > 0)):
            raise ValueError("Impossible condition ramp defined. "
                             "Check heating rates have the correct signs.")
        self.X_start, self.X_mid, self.X_end = float(X_start), float(X_mid), float(X_end)
        self.rate1, self.rate2 = float(rate1), float(rate2)
        self.t_start_plateau = float(t_start_plateau)
        self.t_mid_plateau = float(t_mid_plateau)
        self.t_end_plateau = float(t_end_plateau)
        self.t_startr1 = float(t_start_plateau)
        self.t_endr1 = self.t_startr1 + (X_mid - X_start) / rate1
        self.t_startr2 = self.t_endr1 + t_mid_plateau
        self.t_endr2 = self.t_startr2 + (X_end - X_mid) / rate2
        self.t_end = self.t_endr2 + t_end_plateau
        self.t_blend = 0.0 if t_blend is None else float(t_blend)
        self.blended = t_blend is not None
        if not self.blended:
            self.tstops = np.array([self.t_startr1, self.t_endr1, self.t_startr2,
                                    self.t_endr2, self.t_end])
        else:
            b = self.t_blend
            self.tstops = np.array([
                self.t_startr1 - b, self.t_startr1 + b,
                self.t_endr1 - b, self.t_endr1 + b,
                self.t_startr2 - b, self.t_startr2 + b,
                self.t_endr2 - b, self.t_endr2 + b,
                self.t_end])

    def grad(self, t):
        t = jnp.asarray(t, dtype=jnp.result_type(float))
        ts1, te1, ts2, te2 = self.t_startr1, self.t_endr1, self.t_startr2, self.t_endr2
        r1, r2 = self.rate1, self.rate2
        if not self.blended:
            return ((( (t >= ts1) & (t < te1)) * r1)
                    + (((t >= ts2) & (t < te2)) * r2))
        b = self.t_blend
        return (
            (((t >= ts1 - b) & (t < ts1 + b)) * (r1 * (t - ts1 - b) / (2 * b) + r1))
            + (((t >= ts1 + b) & (t < te1 - b)) * r1)
            + (((t >= te1 - b) & (t < te1 + b)) * (-r1 * (t - te1 - b) / (2 * b)))
            + (((t >= ts2 - b) & (t < ts2 + b)) * (r2 * (t - ts2 - b) / (2 * b) + r2))
            + (((t >= ts2 + b) & (t < te2 - b)) * r2)
            + (((t >= te2 - b) & (t < te2 + b)) * (-r2 * (t - te2 - b) / (2 * b)))
        )

    def value(self, t):
        t = jnp.asarray(t, dtype=jnp.result_type(float))
        ts1, te1, ts2, te2 = self.t_startr1, self.t_endr1, self.t_startr2, self.t_endr2
        r1, r2 = self.rate1, self.rate2
        X0, Xm, Xe = self.X_start, self.X_mid, self.X_end
        if not self.blended:
            return jnp.where(
                t < ts1, X0,
                jnp.where(t < te1, X0 + r1 * (t - ts1),
                          jnp.where(t < ts2, Xm,
                                    jnp.where(t < te2, Xm + r2 * (t - ts2), Xe))))
        b = self.t_blend
        # Analytic antiderivative of the blended gradient: quadratic ease-in
        # / ease-out in each +-b window around the ramp corners.
        def ramp_value(t, t_on, t_off, X_lo, rate):
            # rising-edge blend
            tau_on = jnp.clip(t - (t_on - b), 0.0, 2 * b)
            inc_on = rate * tau_on**2 / (4 * b)
            # linear mid-section
            tau_mid = jnp.clip(t - (t_on + b), 0.0, (t_off - b) - (t_on + b))
            inc_mid = rate * tau_mid
            # falling-edge blend: grad = rate*(2b - tau)/(2b)
            tau_off = jnp.clip(t - (t_off - b), 0.0, 2 * b)
            inc_off = rate * (tau_off - tau_off**2 / (4 * b))
            return X_lo + inc_on + inc_mid + inc_off
        X_after_r1 = ramp_value(t, ts1, te1, X0, r1)
        X_after_r2 = ramp_value(t, ts2, te2, Xm, r2)
        return jnp.where(t < ts2 - b, X_after_r1, X_after_r2)

    def create_discrete_tstops(self, ts_update: float) -> None:
        """Stops only where the profile varies (gradient_variable.jl:301-309)."""
        if ts_update > self.t_end:
            raise ValueError("Error defining tstops, `ts_update` is too large.")
        b = self.t_blend
        self.tstops = np.concatenate([
            [0.0],
            create_savepoints(self.t_startr1 - b, self.t_endr1 + b, ts_update),
            create_savepoints(self.t_startr2 - b, self.t_endr2 + b, ts_update),
            [self.t_end],
        ])


# Trait helpers mirroring the reference's isstatic/isvariable/etc.
def isstatic(p: AbstractProfile) -> bool:
    return p.is_static


def isvariable(p: AbstractProfile) -> bool:
    return p.is_variable


def isgradientprofile(p: AbstractProfile) -> bool:
    return p.is_gradient


def isdirectprofile(p: AbstractProfile) -> bool:
    return p.is_direct


class SawtoothDirectProfile(DirectProfile):
    """Periodic sawtooth ramp oscillating about ``X_mid``.

    No reference equivalent (BASELINE config 2 exercises sawtooth T(t)
    ramps); follows the direct-profile authoring contract
    (docs/src/development/condition-profiles.md:26-62). The condition rises
    from ``X_mid - amplitude`` to ``X_mid + amplitude`` over ``period`` and
    resets, for ``n_periods`` cycles.
    """

    theta_fields = ("amplitude", "period", "X_mid", "X_start", "t_end")

    def __init__(self, amplitude: float, period: float, X_mid: float,
                 n_periods: int = 1, X_start: float | None = None):
        super().__init__()
        self.amplitude = float(amplitude)
        self.period = float(period)
        self.X_mid = float(X_mid)
        self.n_periods = int(n_periods)
        self.X_start = self.X_mid - self.amplitude if X_start is None else float(X_start)
        self.t_end = self.period * self.n_periods
        # discontinuities at every period boundary
        self.tstops = np.arange(1, self.n_periods + 1) * self.period

    def f(self, t):
        t = jnp.asarray(t, dtype=jnp.result_type(float))
        phase = jnp.mod(jnp.clip(t, 0.0, self.t_end), self.period) / self.period
        # the final instant belongs to the top of the last ramp
        at_end = t >= self.t_end
        val = (self.X_mid - self.amplitude) + 2 * self.amplitude * phase
        return jnp.where(at_end, self.X_mid + self.amplitude,
                         jnp.where(t <= 0.0, self.X_start, val))

    def create_discrete_tstops(self, ts_update: float) -> None:
        if ts_update > self.t_end:
            raise ValueError("Error defining tstops, `ts_update` is too large.")
        self.tstops = np.unique(np.concatenate([
            create_savepoints(0.0, self.t_end, ts_update),
            np.arange(1, self.n_periods + 1) * self.period]))
