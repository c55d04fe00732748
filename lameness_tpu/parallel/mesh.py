"""Device mesh + sharding helpers.

The engine scales by **data-parallel sharding over clips** (the natural batch
axis — the reference's NATS fan-out collapses to this, SURVEY.md §2.5) with an
optional model axis for sharding ViT attention heads / MLP over ICI.

All sharding goes through `jax.sharding.NamedSharding` on a `Mesh`; XLA
inserts the collectives.  Nothing here touches NCCL-style primitives.
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    On a v5e-4 slice the default is a pure data mesh (4, 1); pass
    model_parallel>1 to shard the ViT encoders' heads/MLP over ICI too.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if data_parallel is None:
        data_parallel = max(1, n_devices // model_parallel)
    grid = np.array(devices).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array leaf with its leading axis sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate_params(mesh: Mesh, params):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)


def pad_batch_to_multiple(tree, multiple: int) -> Tuple[object, int]:
    """Pad every leaf's leading dim to a multiple of `multiple` (for even
    data-parallel sharding).  Returns (padded_tree, original_batch)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return tree, 0
    b = leaves[0].shape[0]
    target = -(-b // multiple) * multiple
    if target == b:
        return tree, b
    pad = target - b

    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)

    return jax.tree_util.tree_map(_pad, tree), b


@contextmanager
def mesh_context(mesh: Mesh):
    with mesh:
        yield mesh
