"""Lane-compacted gated evaluation under vmap.

Generalises the ``linalg._inv_factor_gated`` pattern (the round-3/4
factor-path win) to arbitrary per-lane computations: a BDF step gates
expensive rebuilds (Jacobian refresh, factor rebuild) behind zero-trip
while_loops, but vmap batches those loops as run-while-ANY-lane-needs —
with per-lane need rates p and batch B the any-lane probability is
1-(1-p)^B ~ 1 at production B, so the full-batch computation runs
nearly every step even though only ~pB lanes consume the result.

:func:`lane_compacted` wraps a function so that, under vmap, the
needing lanes are gathered into a small power-of-two bucket (B/4 or
B/2, 8-aligned), evaluated, and scattered back. Non-needing lanes
receive ZEROS or arbitrary bucket fill-in values and MUST be masked by
the caller — the vmapped while_loop's per-lane carry select does
exactly that (lanes whose predicate is false keep their old carry).
Falls back to the full batch when more than B/2 lanes need the value
or B < 16.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pad8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


def lane_compacted(fn):
    """Wrap ``fn(*args)`` as ``gated(need, *args)`` with a compacting vmap
    batch rule.

    ``need`` is a per-lane bool; unbatched args are passed through whole
    (the sub-batch vmap maps them with ``in_axes=None``). The output may
    be any pytree of arrays whose shapes do not depend on the lane.

    ``fn`` may close over traced values (e.g. the BDF jac closes over the
    solve's ``args`` payload): custom_vmap rejects batched closure
    constants, so the wrapper traces ``fn`` to a jaxpr at call time and
    passes the closed-over constants as explicit leading operands —
    batched captures then ride through the compaction (gathered per
    bucket) like any other arg. (``jax.closure_convert`` is NOT enough:
    it hoists autodiff tracers but passes vmap BatchTracers through as
    constants, which is exactly the case that trips custom_vmap.)
    """

    def call(need, *args):
        args_flat, in_tree = jax.tree.flatten(args)
        out_tree_box = []

        def fn_flat(*flat):
            out = fn(*jax.tree.unflatten(in_tree, flat))
            out_flat, out_tree = jax.tree.flatten(out)
            out_tree_box.append(out_tree)
            return out_flat

        closed = jax.make_jaxpr(fn_flat)(*args_flat)
        consts = closed.consts
        n_consts = len(consts)
        out_tree = out_tree_box[0]

        def pure(*all_flat):
            outs = jax.core.eval_jaxpr(closed.jaxpr, all_flat[:n_consts],
                                       *all_flat[n_consts:])
            return jax.tree.unflatten(out_tree, outs)

        return _make_gated(pure)(need, *consts, *args_flat)

    return call


def _make_gated(fn):
    @jax.custom_batching.custom_vmap
    def gated(need, *args):
        del need
        return fn(*args)

    @gated.def_vmap
    def _rule(axis_size, in_batched, need, *args):
        need_b = in_batched[0]
        args_b = in_batched[1:]
        flat_args, treedef = jax.tree.flatten(args)
        flat_b = jax.tree.leaves(args_b)
        in_axes = treedef.unflatten([0 if b else None for b in flat_b])
        full = jax.vmap(fn, in_axes=in_axes)
        B = axis_size
        if not any(flat_b):
            # Only ``need`` carries the batch axis (e.g. a vmapped
            # forward-sensitivity solve whose primal state — and hence
            # jac inputs — is identical across tangent lanes): every
            # lane shares the same args, so evaluate once unbatched and
            # let vmap broadcast the result. jax.vmap with all-None
            # in_axes is invalid, so this case cannot go through
            # ``full``.
            out = fn(*args)
            return out, jax.tree.map(lambda _: False, out)
        if (not need_b) or B < 16:
            out = full(*args)
            return out, jax.tree.map(lambda _: True, out)

        need_arr = need if need_b else jnp.broadcast_to(need, (B,))

        def gather(leaf, b, idx):
            return leaf[idx] if b else leaf

        def bucketed(bucket):
            idx = jnp.argsort(~need_arr)[:bucket]
            sub_args = treedef.unflatten(
                [gather(l, b, idx) for l, b in zip(flat_args, flat_b)])
            sub = full(*sub_args)
            return jax.tree.map(
                lambda s: jnp.zeros((B,) + s.shape[1:], s.dtype
                                    ).at[idx].set(s), sub)

        tiers = sorted({b for b in (_pad8(-(-B // 4)), _pad8(-(-B // 2)))
                        if b < B})
        if not tiers:
            out = full(*args)
            return out, jax.tree.map(lambda _: True, out)
        count = jnp.sum(need_arr)

        def dispatch(remaining):
            if not remaining:
                return full(*args)
            b = remaining[0]
            return lax.cond(count <= b, lambda _: bucketed(b),
                            lambda _: dispatch(remaining[1:]), operand=None)

        out = dispatch(tiers)
        return out, jax.tree.map(lambda _: True, out)

    return gated
