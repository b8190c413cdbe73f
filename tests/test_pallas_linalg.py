"""Tests for the Pallas Gauss-Jordan inverse and the "inv" Newton path.

Runs the kernel in interpreter mode (tests execute on the CPU backend;
on TPU the same kernel compiles via Mosaic — exercised by bench.py and the
driver's entry checks).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinetica_tpu.ops import bdf
from kinetica_tpu.ops.linalg import newton_factor, newton_solve, resolve_linsolve
from kinetica_tpu.ops.pallas_linalg import MAX_PALLAS_BATCH, gj_inverse


@pytest.mark.parametrize("n", [2, 5, 8, 49, 100, 128])
def test_gj_inverse_matches_numpy(n):
    rng = np.random.default_rng(n)
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    Minv = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    ref = np.linalg.inv(A)
    assert np.abs(Minv - ref).max() / np.abs(ref).max() < 1e-4


def test_gj_inverse_needs_pivoting():
    # zero diagonal: fails without partial pivoting
    A = np.array([[0.0, 2.0], [1.0, 0.0]])
    Minv = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    assert np.abs(Minv - np.linalg.inv(A)).max() < 1e-6


def test_gj_inverse_singular_is_finite():
    A = np.zeros((3, 3))
    Minv = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    assert np.all(np.isfinite(Minv))


def test_gj_inverse_batch_chunking():
    # force the > MAX_PALLAS_BATCH chunked path
    B = MAX_PALLAS_BATCH + 3
    rng = np.random.default_rng(0)
    A = np.eye(6)[None] + 0.1 * rng.standard_normal((B, 6, 6))
    from kinetica_tpu.ops.pallas_linalg import _gj_call
    Minv = np.asarray(_gj_call(jnp.asarray(A), interpret=True))
    ref = np.linalg.inv(A)
    assert np.abs(Minv - ref).max() < 1e-4


def test_gj_inverse_rejects_wide():
    with pytest.raises(ValueError):
        gj_inverse(jnp.eye(129), interpret=True)


def test_resolve_linsolve():
    # on the CPU test backend auto must resolve to "lu"
    assert resolve_linsolve("auto", 49) == "lu"
    assert resolve_linsolve("lu", 49) == "lu"
    assert resolve_linsolve("inv", 49) == "inv"
    assert resolve_linsolve("auto", 500) == "lu"


def test_newton_inv_path_solves():
    """The "inv" factor/solve pair must solve (I - cJ) dy = b accurately.

    Uses jnp.linalg.inv semantics through the same newton_solve refinement
    machinery the BDF loop uses (gj_inverse in interpret mode is too slow
    to embed in a solver loop on CPU; the algebra is identical).
    """
    rng = np.random.default_rng(1)
    n = 12
    J = jnp.asarray(rng.standard_normal((n, n)))
    c = jnp.asarray(0.05)
    b = jnp.asarray(rng.standard_normal(n))
    A = np.eye(n) - 0.05 * np.asarray(J)

    f = newton_factor(J, c, method="lu")
    # emulate the inv path with an explicit inverse of matching precision
    finv = f._replace(lu=jnp.asarray(np.linalg.inv(A), jnp.float32),
                      piv=jnp.zeros((n,), jnp.int32))
    dy = newton_solve(finv, b, refine=2, method="inv")
    ref = np.linalg.solve(A, np.asarray(b))
    assert np.abs(np.asarray(dy) - ref).max() < 1e-10


def test_bdf_linsolve_inv_cpu_interpretless():
    """bdf_solve(linsolve=...) resolves and runs on CPU via the lu path."""
    Adec = -jnp.eye(3)
    rhs = lambda t, y, a: Adec @ y
    jac = lambda t, y, a: Adec
    saveat = jnp.array([0.5, 1.0])
    res = bdf.bdf_solve(rhs, jac, jnp.ones(3), 0.0, 1.0, saveat,
                        rtol=1e-8, atol=1e-10, linsolve="auto", args=0.0)
    assert int(res.status) == bdf.DONE
    assert np.allclose(np.asarray(res.ys[-1]), np.exp(-1.0), atol=1e-7)


def test_gj_inverse_jvp_registered_rule(monkeypatch):
    """jax.jvp through gj_inverse exercises the REGISTERED custom rule
    (primal forced through the interpreter so no TPU is needed) and the
    tangent matches finite differences of the primal."""
    from kinetica_tpu.ops import pallas_linalg as pl_mod

    real_call = pl_mod._gj_call
    monkeypatch.setattr(pl_mod, "_gj_call",
                        lambda A, interpret: real_call(A, True))

    rng = np.random.default_rng(3)
    n = 6
    A = jnp.asarray(np.eye(n) * 3.0 + rng.normal(size=(n, n)) * 0.3)
    dA = jnp.asarray(rng.normal(size=(n, n)) * 0.1)

    Minv, dMinv = jax.jvp(pl_mod.gj_inverse, (A,), (dA,))
    eps = 1e-3
    fd = (np.asarray(real_call((A + eps * dA)[None].astype(jnp.float32), True)[0],
                     np.float64)
          - np.asarray(real_call((A - eps * dA)[None].astype(jnp.float32), True)[0],
                       np.float64)) / (2 * eps)
    scale = np.abs(np.asarray(dMinv)).max()
    assert np.abs(np.asarray(dMinv, dtype=np.float64) - fd).max() / scale < 5e-3
