"""Ring attention (sequence parallel) vs full attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.ops.attention import reference_attention
from lameness_tpu.parallel.ring_attention import (make_seq_mesh,
                                                  ring_attention)


@pytest.mark.parametrize("n_dev,s", [(4, 64), (8, 64), (2, 32)])
def test_ring_matches_full_attention(rng, n_dev, s):
    b, h, d = 2, 3, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    ref = reference_attention(q, k, v)
    mesh = make_seq_mesh(n_dev)
    got = ring_attention(q, k, v, mesh)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ring_attention_jittable(rng):
    b, h, s, d = 1, 2, 32, 8
    mesh = make_seq_mesh(4)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    fn = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))
    got = fn(q, q, q)
    ref = reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
