"""GPipe-style pipeline parallelism: exact vs sequential reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.parallel.pipeline_parallel import (make_stage_mesh,
                                                     pipeline_apply,
                                                     sequential_reference,
                                                     stack_stage_params)


def _mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def _make_params(rng, d, n_stages):
    out = []
    for _ in range(n_stages):
        out.append({
            "w1": jnp.asarray(rng.standard_normal((d, d)).astype(np.float32)
                              * 0.2),
            "b1": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1),
            "w2": jnp.asarray(rng.standard_normal((d, d)).astype(np.float32)
                              * 0.2),
            "b2": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1),
        })
    return out


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (4, 8), (8, 4), (2, 6)])
def test_pipeline_matches_sequential(rng, n_stages, n_micro):
    d = 16
    b = n_micro * 3
    per_stage = _make_params(rng, d, n_stages)
    x = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    ref = sequential_reference(_mlp_stage, per_stage, x)
    mesh = make_stage_mesh(n_stages)
    stacked = stack_stage_params(per_stage)
    got = pipeline_apply(_mlp_stage, stacked, x, mesh, n_micro)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_jittable(rng):
    d, n_stages, n_micro = 8, 4, 4
    per_stage = _make_params(rng, d, n_stages)
    mesh = make_stage_mesh(n_stages)
    stacked = stack_stage_params(per_stage)
    x = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))

    fn = jax.jit(lambda p, xx: pipeline_apply(_mlp_stage, p, xx, mesh,
                                              n_micro))
    got = fn(stacked, x)
    ref = sequential_reference(_mlp_stage, per_stage, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
