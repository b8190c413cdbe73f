"""Device-mesh sharding for ensemble sweeps.

The reference has no distributed compute (SURVEY.md §2.10); the TPU-native
"parallelism layer" is the batch axis over a ``jax.sharding.Mesh``:

* ensemble members (condition profiles / u0 / parameter sets) shard over
  the ``batch`` mesh axis — embarrassingly parallel, collectives-free on
  the hot path, scaling linearly over ICI;
* optionally the reaction axis of the rate tables shards over a ``model``
  axis: rate evaluation is then reaction-sharded and XLA inserts a single
  ``psum`` (all-reduce over ICI) in the ``r @ N`` contraction that
  assembles du/dt — useful once nr is large enough that a single member's
  RHS work dominates.

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
