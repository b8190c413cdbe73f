"""Device-side lookup/interpolation primitives for traced code.

Used to embed tabulated condition profiles and precomputed discrete rate
tables into jitted RHS functions (the XLA-native replacement for the
reference's DiffEqArray interpolation + callback machinery,
solve_utils.jl:91-109 and 435-509).
"""
from __future__ import annotations

import jax.numpy as jnp


def linear_interp(tq, t_grid, u_grid):
    """Linear interpolation of u_grid rows at tq (clamped to grid ends).

    t_grid: (nt,) sorted; u_grid: (nt, ...) — traceable, vmappable.
    """
    tq = jnp.clip(tq, t_grid[0], t_grid[-1])
    idx = jnp.clip(jnp.searchsorted(t_grid, tq, side="right") - 1, 0, t_grid.shape[0] - 2)
    t0 = t_grid[idx]
    t1 = t_grid[idx + 1]
    w = jnp.where(t1 > t0, (tq - t0) / jnp.where(t1 > t0, t1 - t0, 1.0), 0.0)
    return (1.0 - w) * u_grid[idx] + w * u_grid[idx + 1]


def left_constant_lookup(tq, t_grid, u_grid):
    """Piecewise-constant, left-anchored lookup: u_grid[i] for t in [t_i, t_{i+1}).

    This is the semantics of discrete rate updates: the rate vector set at a
    tstop holds until the next tstop (reference ChunkwiseRateUpdateAffect,
    solve_utils.jl:488-509).
    """
    idx = jnp.clip(jnp.searchsorted(t_grid, tq, side="right") - 1, 0, t_grid.shape[0] - 1)
    return u_grid[idx]
