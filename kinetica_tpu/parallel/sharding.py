"""Device-mesh sharding for ensemble sweeps.

The reference has no distributed compute (SURVEY.md §2.10); the TPU-native
"parallelism layer" is the batch axis over a ``jax.sharding.Mesh``:

* ensemble members (condition profiles / u0 / parameter sets) shard over
  the ``batch`` mesh axis — embarrassingly parallel, collectives-free on
  the hot path, scaling linearly over ICI;
* on a 2-D ``("batch", "model")`` mesh (:func:`ensemble_shardings`), the
  reaction axis of the discrete rate tables additionally shards over
  ``model``: rate evaluation is then reaction-sharded and the SPMD
  partitioner inserts the ``psum`` (all-reduce over ICI) in the
  ``r @ N`` contraction that assembles du/dt — useful once nr is large
  enough that a single member's RHS work dominates. Equality with the
  1-D path is tested on an 8-device virtual mesh
  (tests/test_parallel.py) and exercised by ``dryrun_multichip``.

Validated on a virtual multi-device CPU mesh
(``--xla_force_host_platform_device_count``); the same code runs unchanged
on real multi-chip TPU meshes.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("batch",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Create a device mesh. 1-D ``(batch,)`` by default.

    ``shape`` allows multi-axis meshes, e.g. ``shape=(4, 2)`` with
    ``axis_names=("batch", "model")``.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} does not use {n_devices} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Shard the leading (ensemble) axis over the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ensemble(mesh: Mesh, arrays, axis: str = "batch"):
    """Place a pytree of member-major arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), arrays)


def ensemble_shardings(mesh: Mesh):
    """Input shardings for an :class:`EnsembleProblem` solve over ``mesh``.

    Returns ``(u0_sharding, ktable_sharding)``:

    * 1-D ``("batch",)`` mesh — both shard the leading (member) axis;
      the hot path stays collectives-free (pure data parallelism).
    * 2-D ``("batch", "model")`` mesh — members shard over ``batch``
      while the REACTION axis of the discrete k-table (B, n_t, nr)
      shards over ``model``. Rate evaluation is then reaction-sharded
      and the SPMD partitioner inserts the ``psum`` over ``model`` in
      the ``r @ N`` contraction assembling du/dt (and in the Jacobian's
      segment-sum). Sharding is driven purely by input placement —
      the solver code is unchanged; XLA propagates the layout.

    State (u0, solution) is replicated over ``model``: every model-rank
    holds the full species vector, only per-reaction work is split.
    """
    if "model" in mesh.axis_names:
        return (NamedSharding(mesh, P("batch")),
                NamedSharding(mesh, P("batch", None, "model")))
    return (NamedSharding(mesh, P("batch")),
            NamedSharding(mesh, P("batch")))
