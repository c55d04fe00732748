"""FSDP (ZeRO-3) training-state sharding (parallel/fsdp.py).

The same jitted train step must run with the state fully sharded over
the data axis, produce the same loss as the replicated layout, and keep
the new state in the FSDP layout (8 virtual CPU devices — conftest)."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lameness_tpu.parallel.fsdp import (fsdp_leaf_spec,
                                        shard_train_state_fsdp,
                                        state_shardings)
from lameness_tpu.parallel.mesh import DATA_AXIS, make_mesh
from lameness_tpu.pipeline import train as T
from lameness_tpu.pipeline.train import _dino_param_spec


def _tp_spec(path, leaf):
    names = [getattr(p, "key", str(p)) for p in path]
    if names and names[0] == "dino":
        return _dino_param_spec(tuple(path[1:]), leaf)
    return None


def test_fsdp_leaf_spec_rules():
    class L:
        def __init__(self, shape):
            self.shape = shape

    # largest dp-divisible axis sharded (dp=4): 64 > 32
    assert fsdp_leaf_spec(L((32, 64)), 4) == P(None, DATA_AXIS)
    # small leaves (biases/norms) stay replicated
    assert fsdp_leaf_spec(L((64,)), 4) == P()
    # no divisible axis -> replicated
    assert fsdp_leaf_spec(L((33, 35)), 4, min_size=1) == P()
    # composes with an existing tp axis: data goes to the free axis
    assert fsdp_leaf_spec(L((64, 64)), 4, base=P(None, "model"),
                          min_size=1) == P(DATA_AXIS, "model")
    # tp axis occupies the only divisible axis -> tp spec kept as-is
    assert fsdp_leaf_spec(L((33, 64)), 4, base=P(None, "model"),
                          min_size=1) == P(None, "model")


@pytest.mark.slow
def test_fsdp_train_step_matches_replicated():
    mesh = make_mesh(8)
    models = T.make_models(hidden=64, layers=2, heads=4)
    state, tx = T.init_train_state(jax.random.PRNGKey(0), mesh, models,
                                   image_size=56)
    step_fn, batch_sh = T.make_train_step(mesh, models, tx)

    rng = np.random.default_rng(0)
    batch = T.make_batch(rng, 16, image_size=56)
    batch = {k: jax.device_put(v, batch_sh[k]) for k, v in batch.items()}

    with mesh:
        _, loss_ref, _ = step_fn(state, batch, jax.random.PRNGKey(1))

    fstate = shard_train_state_fsdp(state, mesh, tp_spec=_tp_spec,
                                    min_size=256)
    # params actually sharded: some leaf's spec carries the data axis and
    # its per-device shard is smaller than the global shape
    sharded = [p for p in jax.tree_util.tree_leaves(fstate.params)
               if DATA_AXIS in tuple(p.sharding.spec)]
    assert sharded, "no parameter leaf picked up the data axis"
    biggest = max(sharded, key=lambda p: p.size)
    shard_shape = biggest.sharding.shard_shape(biggest.shape)
    assert np.prod(shard_shape) < biggest.size

    # AdamW moments sharded EXACTLY like their params, every leaf
    # (structure-aware tree_map, not zip order; any() would let a
    # mostly-misaligned regression pass)
    adam = fstate.opt_state[0]          # ScaleByAdamState
    for name, mom in (("mu", adam.mu), ("nu", adam.nu)):
        ok = jax.tree_util.tree_map(
            lambda m, p: m.sharding == p.sharding, mom, fstate.params)
        bad = [k for k, v in
               jax.tree_util.tree_flatten_with_path(ok)[0] if not v]
        assert not bad, (name, bad[:5])

    # pinned-layout step: the jit keeps the ZeRO-3 placement on output
    fstep, _ = T.make_train_step(mesh, models, tx,
                                 state_shardings=state_shardings(fstate))
    with mesh:
        new_state, loss_fsdp, _ = fstep(fstate, batch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_fsdp))
    np.testing.assert_allclose(float(loss_fsdp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    # the updated state keeps the FULL FSDP layout, leaf for leaf — a
    # regression that re-replicates all but one leaf must fail
    kept = jax.tree_util.tree_map(
        lambda n, f: n.sharding == f.sharding,
        new_state.params, fstate.params)
    bad = [k for k, v in jax.tree_util.tree_flatten_with_path(kept)[0]
           if not v]
    assert not bad, f"train step changed param shardings: {bad[:5]}"
    new_adam = new_state.opt_state[0]
    kept_mu = jax.tree_util.tree_map(
        lambda n, p: n.sharding == p.sharding, new_adam.mu,
        new_state.params)
    assert all(jax.tree_util.tree_leaves(kept_mu)), \
        "updated mu shardings diverged from their params"


def test_fsdp_leaf_spec_base_already_data_sharded():
    """A base spec that already carries the data axis is returned as-is
    (no duplicate-axis NamedSharding error)."""
    class L:
        def __init__(self, shape):
            self.shape = shape

    assert fsdp_leaf_spec(L((64, 64)), 4, base=P(DATA_AXIS, "model"),
                          min_size=1) == P(DATA_AXIS, "model")
    assert fsdp_leaf_spec(L((64, 64)), 4, base=P((DATA_AXIS, "model"),),
                          min_size=1) == P((DATA_AXIS, "model"),)


@pytest.mark.slow
def test_fsdp_dict_valued_opt_state_and_shape_guard():
    """walk() recurses into dict/list-valued optax states (e.g.
    multi_transform) and a params-structure-shaped subtree with WRONG
    leaf shapes is replicated, not FSDP-spec'd."""
    import optax
    mesh = make_mesh(8)
    models = T.make_models(hidden=64, layers=2, heads=4)
    state, _ = T.init_train_state(jax.random.PRNGKey(0), mesh, models,
                                  image_size=56)
    adam = state.opt_state[0]
    # a decoy tree: params structure, wrong shapes (scalar leaves)
    decoy = jax.tree_util.tree_map(lambda p: np.zeros(()), state.params)
    wrapped = type(state)(
        state.params,
        (adam, {"nested": [adam.mu, decoy]}, state.opt_state[1:]),
        state.step)
    fstate = shard_train_state_fsdp(wrapped, mesh, tp_spec=_tp_spec,
                                    min_size=256)
    _, inner, _ = fstate.opt_state
    # dict/list recursed: the nested mu copy got the param specs
    ok = jax.tree_util.tree_map(
        lambda m, p: m.sharding == p.sharding,
        inner["nested"][0], fstate.params)
    assert all(jax.tree_util.tree_leaves(ok))
    # the decoy (structure match, shape mismatch) stayed replicated
    for leaf in jax.tree_util.tree_leaves(inner["nested"][1]):
        assert leaf.sharding.spec == P(), leaf.sharding
    # no array leaf may be silently skipped: a pytree-REGISTERED
    # container walk() can't enter makes the visit counter raise
    # (an unregistered object is itself a shapeless leaf — harmless)
    @jax.tree_util.register_pytree_node_class
    class Opaque:
        def __init__(self, inner):
            self.inner = inner

        def tree_flatten(self):
            return (self.inner,), None

        @classmethod
        def tree_unflatten(cls, aux, children):
            return cls(*children)

    with pytest.raises(TypeError, match="does not recurse"):
        shard_train_state_fsdp(
            type(state)(state.params, (Opaque(adam.mu),), state.step),
            mesh)
