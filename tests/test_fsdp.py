"""FSDP (ZeRO-3) training-state sharding (parallel/fsdp.py).

The same jitted train step must run with the state fully sharded over
the data axis, produce the same loss as the replicated layout, and keep
the new state in the FSDP layout (8 virtual CPU devices — conftest)."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lameness_tpu.parallel.fsdp import (fsdp_leaf_spec,
                                        shard_train_state_fsdp)
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

    # AdamW moments sharded like their params
    adam = fstate.opt_state[0]          # ScaleByAdamState
    mu_leaves = jax.tree_util.tree_leaves(adam.mu)
    p_leaves = jax.tree_util.tree_leaves(fstate.params)
    assert any(m.sharding == p.sharding and DATA_AXIS in str(
        m.sharding.spec) for m, p in zip(mu_leaves, p_leaves))

    with mesh:
        new_state, loss_fsdp, _ = step_fn(fstate, batch,
                                          jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_fsdp))
    np.testing.assert_allclose(float(loss_fsdp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    # the updated params keep the FSDP layout (no silent re-replication)
    assert any(DATA_AXIS in tuple(p.sharding.spec)
               for p in jax.tree_util.tree_leaves(new_state.params)), \
        "train step re-replicated the FSDP params"
