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


def dino_tp_spec(path, leaf) -> P:
    """Megatron-style tensor-parallel layout for a ViT param leaf:
    QKV / MLP-in column-sharded, attention-out / MLP-out row-sharded
    over the model axis; everything else replicated.  Matches both the
    DINO tower ("query"/"key"/"value", "fc1"/"fc2") and the SAM encoder
    ("qkv", "lin1"/"lin2") naming."""
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if leaf.ndim == 2:
        if any(k in joined for k in ("query", "key", "value", "fc1",
                                     "qkv", "lin1")):
            return P(None, MODEL_AXIS)          # column parallel
        if any(k in joined for k in ("out", "fc2", "lin2", "proj")):
            return P(MODEL_AXIS, None)          # row parallel
    return P()


def shard_params_tp(mesh: Mesh, params, subtrees=("dino",),
                    spec_fn=dino_tp_spec):
    """Place a param tree for tensor-parallel inference: leaves under the
    named top-level ``subtrees`` get ``spec_fn`` over the model axis
    (sharded dims must divide by the axis size, else replicated);
    everything else is replicated over the whole mesh."""
    msize = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        spec = P()
        if path and getattr(path[0], "key", None) in subtrees:
            spec = spec_fn(tuple(path[1:]), leaf)
            # even-divisibility guard: fall back to replication
            for dim, entry in enumerate(spec):
                if entry is not None and leaf.shape[dim] % msize:
                    spec = P()
                    break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


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
