"""ops/gating.lane_compacted: lane-compacted gated evaluation under vmap."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinetica_tpu.ops.gating import lane_compacted


def test_unbatched_is_identity():
    g = lane_compacted(lambda x: x * 2 + 1)
    x = jnp.arange(4.0)
    np.testing.assert_array_equal(g(jnp.asarray(True), x), x * 2 + 1)


def test_compacted_matches_on_needing_lanes():
    B, n = 24, 5
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, n, n)))
    need = np.zeros(B, bool)
    need[[1, 7, 20]] = True

    fn = lambda a: jnp.linalg.inv(a)
    out = jax.vmap(lane_compacted(fn))(jnp.asarray(need), A)
    ref = jax.vmap(fn)(A)
    np.testing.assert_allclose(np.asarray(out)[need], np.asarray(ref)[need],
                               rtol=1e-10)
    # the contract: non-needing lanes are zeros or arbitrary bucket
    # fill-in — they must NOT be relied upon, only masked. Lanes outside
    # the bucket are exact zeros.
    zero_rows = np.abs(np.asarray(out)).reshape(B, -1).max(axis=1) == 0
    assert zero_rows.sum() >= B - 8  # bucket is 8-padded B/4


def test_majority_need_falls_back_to_full_batch():
    B = 24
    x = jnp.arange(float(B))
    need = jnp.asarray(np.ones(B, bool))
    out = jax.vmap(lane_compacted(lambda v: v + 1))(need, x)
    np.testing.assert_array_equal(out, x + 1)


def test_pytree_output_and_unbatched_args():
    B = 16
    y = jnp.ones((B, 3))
    w = jnp.asarray([1.0, 2.0, 3.0])       # shared (unbatched under vmap)
    need = jnp.asarray(np.eye(B, 1, dtype=bool).ravel())

    def fn(yy, ww):
        return {"a": yy * ww, "b": (jnp.sum(yy),)}

    out = jax.vmap(lane_compacted(fn), in_axes=(0, 0, None))(need, y, w)
    assert out["a"].shape == (B, 3) and out["b"][0].shape == (B,)
    np.testing.assert_array_equal(np.asarray(out["a"])[0], np.asarray(w))


def test_batched_closure_capture():
    """The regression that bit the BDF jac: fn closing over a BATCHED
    tracer (custom_vmap rejects batched closure consts; lane_compacted
    must extract the closure into explicit operands)."""
    B, n = 20, 3
    tables = jnp.asarray(np.random.default_rng(1).standard_normal((B, n, n)))
    ys = jnp.ones((B, n))
    need = jnp.asarray((np.arange(B) % 7 == 0))

    def outer(table, y, nd):
        fn = lambda yy: table @ yy          # captures the batched `table`
        return lane_compacted(fn)(nd, y)

    out = jax.vmap(outer)(tables, ys, need)
    ref = jnp.einsum("bij,bj->bi", tables, ys)
    np.testing.assert_allclose(np.asarray(out)[np.asarray(need)],
                               np.asarray(ref)[np.asarray(need)], rtol=1e-12)


def test_small_batch_runs_full():
    B = 8  # < 16: no compaction
    x = jnp.arange(float(B))
    need = jnp.asarray(np.zeros(B, bool))
    out = jax.vmap(lane_compacted(lambda v: v * 3))(need, x)
    np.testing.assert_array_equal(out, x * 3)
