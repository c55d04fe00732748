"""FSDP (ZeRO-3-style) sharding for the training state.

The reference has zero distributed training (SURVEY.md §2.5); the TPU
rebuild's train step (``pipeline/train.py``) already runs dp over the
clip batch and tp over the DINO ViT weights.  This module adds the third
memory axis: **fully-sharded data parallel** — every parameter AND its
AdamW moments are sharded over the ``data`` axis, so per-chip state
memory drops ~1/dp and XLA inserts the all-gather-on-use /
reduce-scatter-on-grad collectives itself (the standard JAX FSDP recipe:
annotate shardings, let SPMD partition — no hand-written collectives,
exactly how "How to Scale Your Model" frames ZeRO).

Usage::

    state, tx = init_train_state(rng, mesh, models)
    state = shard_train_state_fsdp(state, mesh, tp_spec=dino_tp_spec)
    step_fn, batch_sh = make_train_step(mesh, models, tx)   # unchanged

The SAME jitted train step runs either way: ``jax.jit`` picks the layout
up from the committed input shardings and keeps the new state in the
FSDP layout (validated in tests/test_fsdp.py and, budget permitting,
``__graft_entry__.dryrun_multichip``).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = ["fsdp_leaf_spec", "shard_params_fsdp", "shard_train_state_fsdp"]


def fsdp_leaf_spec(leaf, dp: int, base: Optional[P] = None,
                   min_size: int = 1024) -> P:
    """FSDP PartitionSpec for one parameter leaf.

    Shards the LARGEST axis whose size divides evenly by ``dp`` and is
    not already taken by a tensor-parallel axis in ``base``; leaves
    smaller than ``min_size`` elements stay replicated (biases, norms —
    sharding them is all collective overhead, no memory win).
    """
    shape = getattr(leaf, "shape", ())
    ndim = len(shape)
    base_entries = tuple(base) if base is not None else ()
    base_entries = base_entries + (None,) * (ndim - len(base_entries))
    size = 1
    for d in shape:
        size *= d
    if ndim == 0 or size < min_size:
        return P(*base_entries) if base is not None else P()
    # largest free axis divisible by dp (ties -> later axis, which for
    # row-major weights is the contiguous one)
    best = -1
    for ax in range(ndim):
        if base_entries[ax] is not None:
            continue
        if shape[ax] % dp == 0 and (best < 0
                                    or shape[ax] >= shape[best]):
            best = ax
    if best < 0:
        return P(*base_entries) if base is not None else P()
    entries = list(base_entries)
    entries[best] = DATA_AXIS
    while entries and entries[-1] is None:
        entries.pop()
    return P(*entries)


def _spec_tree(params, mesh: Mesh,
               tp_spec: Optional[Callable] = None, min_size: int = 1024):
    """Per-leaf NamedSharding tree for ``params``.  ``tp_spec(path, leaf)``
    supplies an existing tensor-parallel base spec (e.g.
    ``pipeline.train._dino_param_spec`` under the ``dino`` subtree) that
    FSDP composes with instead of overriding."""
    dp = mesh.shape[DATA_AXIS]

    def one(path, leaf):
        base = tp_spec(path, leaf) if tp_spec is not None else None
        return NamedSharding(
            mesh, fsdp_leaf_spec(leaf, dp, base=base, min_size=min_size))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_fsdp(params, mesh: Mesh,
                      tp_spec: Optional[Callable] = None,
                      min_size: int = 1024):
    """Re-place a parameter tree with every large leaf sharded over the
    data axis (composing with ``tp_spec`` tensor-parallel axes)."""
    specs = _spec_tree(params, mesh, tp_spec, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, specs)


def shard_train_state_fsdp(state, mesh: Mesh,
                           tp_spec: Optional[Callable] = None,
                           min_size: int = 1024):
    """ZeRO-3 placement of a ``pipeline.train.TrainState``: params and the
    optimizer moments (any opt_state subtree mirroring the params
    structure, i.e. AdamW's mu/nu) get the FSDP specs; stray scalars
    (step counts) replicate."""
    specs = _spec_tree(state.params, mesh, tp_spec, min_size)
    params = jax.tree_util.tree_map(jax.device_put, state.params, specs)
    p_struct = jax.tree_util.tree_structure(state.params)
    repl = NamedSharding(mesh, P())

    def walk(node):
        try:
            if jax.tree_util.tree_structure(node) == p_struct:
                return jax.tree_util.tree_map(jax.device_put, node, specs)
        except (ValueError, TypeError):
            pass
        if isinstance(node, tuple):            # (Named)tuple optax states
            mapped = [walk(c) for c in node]
            return type(node)(*mapped) if hasattr(node, "_fields") \
                else type(node)(mapped)
        if hasattr(node, "shape"):
            return jax.device_put(node, repl)
        return node

    opt_state = walk(state.opt_state)
    step = jax.device_put(state.step, repl)
    return type(state)(params, opt_state, step)
