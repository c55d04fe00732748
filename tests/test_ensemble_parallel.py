"""Ensemble (MC-dropout) parallelism: sharded samples == unsharded vmap."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lameness_tpu.models.tcn import TCN
from lameness_tpu.parallel.ensemble_parallel import (make_ensemble_mesh,
                                                     mc_dropout_sharded)


@pytest.fixture(scope="module")
def tcn_setup():
    model = TCN(channels=(8, 8), kernel_size=3, input_dim=44)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 125, 44)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
    return model, params, feats


def test_sharded_mc_matches_vmap(tcn_setup):
    """Sharding the MC sample axis over 8 devices keeps each sample's
    dropout mask identical (a function of its key only); values agree to
    float reassociation (~1e-7 — the partitioned program fuses
    differently)."""
    model, params, feats = tcn_setup
    rng = jax.random.PRNGKey(42)
    n = 8

    def one(k):
        return model.apply(params, feats, deterministic=False,
                           rngs={"dropout": k})

    mesh = make_ensemble_mesh(8)
    sharded = mc_dropout_sharded(one, mesh, rng, n)
    want = jax.vmap(one)(jax.random.split(rng, n))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    assert sharded.shape[0] == n
    # the sample axis is actually distributed (one shard per device)
    assert len(sharded.sharding.device_set) == 8


def test_sharded_mc_statistics(tcn_setup):
    """Mean/std over the sharded samples reproduce the MC-dropout
    uncertainty estimate (tcn-pipeline/app/main.py:169-195 semantics)."""
    model, params, feats = tcn_setup
    mesh = make_ensemble_mesh(8)

    def one(k):
        return model.apply(params, feats, deterministic=False,
                           rngs={"dropout": k})

    preds = mc_dropout_sharded(one, mesh, jax.random.PRNGKey(7), 16)
    mean = np.asarray(preds.mean(axis=0)).ravel()
    std = np.asarray(preds.std(axis=0)).ravel()
    assert mean.shape == (2,) and np.isfinite(mean).all()
    assert (std >= 0).all() and std.max() > 0   # dropout actually varies


def test_rejects_indivisible_samples(tcn_setup):
    model, params, feats = tcn_setup
    mesh = make_ensemble_mesh(8)
    with pytest.raises(AssertionError, match="multiple"):
        mc_dropout_sharded(
            lambda k: model.apply(params, feats, deterministic=False,
                                  rngs={"dropout": k}),
            mesh, jax.random.PRNGKey(0), 10)
