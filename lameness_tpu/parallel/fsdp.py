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
    step_fn, batch_sh = make_train_step(
        mesh, models, tx, state_shardings=state_shardings(state))

The same ``train_step`` FUNCTION runs either layout; pass
``state_shardings`` so the jit pins the state input/output layouts —
without the pin GSPMD may re-lay-out the updated state on the way out
(it re-replicated the dino tp×fsdp leaves in practice; pinned + tested
in tests/test_fsdp.py and ``__graft_entry__.dryrun_multichip``).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = ["fsdp_leaf_spec", "shard_params_fsdp", "shard_train_state_fsdp",
           "state_shardings"]


def state_shardings(state):
    """Per-leaf sharding tree of a placed TrainState — pass to
    ``pipeline.train.make_train_step(..., state_shardings=...)`` so the
    jitted step keeps this exact (e.g. ZeRO-3) layout on its output."""
    return jax.tree_util.tree_map(lambda x: x.sharding, state)


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
    if any(e == DATA_AXIS or (isinstance(e, tuple) and DATA_AXIS in e)
           for e in base_entries):
        # base already consumes the data axis — adding it again would be
        # a duplicate mesh axis (opaque NamedSharding error); the leaf is
        # already data-sharded, keep the caller's spec
        return P(*base_entries)
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
    p_shapes = [getattr(l, "shape", ())
                for l in jax.tree_util.tree_leaves(state.params)]
    repl = NamedSharding(mesh, P())
    placed = [0]                     # array leaves actually visited

    def _is_moment_tree(node) -> bool:
        """True iff ``node`` mirrors the params tree structure AND every
        leaf has the corresponding param's shape — structure equality
        alone would device_put a coincidentally-shaped subtree with
        mismatched FSDP specs (shape/divisibility errors)."""
        try:
            if jax.tree_util.tree_structure(node) != p_struct:
                return False
        except (ValueError, TypeError):
            return False
        shapes = [getattr(l, "shape", ())
                  for l in jax.tree_util.tree_leaves(node)]
        return shapes == p_shapes

    def walk(node):
        if _is_moment_tree(node):
            placed[0] += len(p_shapes)
            return jax.tree_util.tree_map(jax.device_put, node, specs)
        if isinstance(node, tuple):            # (Named)tuple optax states
            mapped = [walk(c) for c in node]
            return type(node)(*mapped) if hasattr(node, "_fields") \
                else type(node)(mapped)
        if isinstance(node, list):
            return [walk(c) for c in node]
        import collections.abc
        if isinstance(node, collections.abc.Mapping):
            # dict / FrozenDict-valued optax states (multi_transform,
            # inject_hyperparams, masked)
            return type(node)({k: walk(v) for k, v in node.items()})
        if hasattr(node, "shape"):
            placed[0] += 1
            return jax.device_put(node, repl)
        return node

    opt_state = walk(state.opt_state)
    n_leaves = len([l for l in jax.tree_util.tree_leaves(state.opt_state)
                    if hasattr(l, "shape")])
    if placed[0] != n_leaves:
        # an unhandled container type silently skipped array leaves —
        # those moments would stay on their original (unsharded) devices
        raise TypeError(
            f"shard_train_state_fsdp placed {placed[0]} of {n_leaves} "
            "opt_state array leaves; opt_state contains a container type "
            "walk() does not recurse into")
    step = jax.device_put(state.step, repl)
    return type(state)(params, opt_state, step)
