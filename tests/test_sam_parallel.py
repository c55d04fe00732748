"""Multi-chip SAM scaling paths: exactness vs sequential references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.models.sam import Sam, SamVisionEncoder
from lameness_tpu.ops.sam_attention import (project_rel_tables,
                                            sam_attention_reference)
from lameness_tpu.parallel.pipeline_parallel import make_stage_mesh
from lameness_tpu.parallel.ring_attention import make_seq_mesh
from lameness_tpu.parallel.sam_parallel import (sam_encoder_pipeline,
                                                sam_ring_attention)

needs4 = pytest.mark.skipif(jax.device_count() < 4,
                            reason="needs >= 4 devices")


@needs4
def test_pipeline_encoder_matches_sequential(rng):
    """4-stage pipelined ViTDet encoder == plain encode (tiny geometry:
    depth 8, pattern [window, global] repeating, 2 layers/stage)."""
    enc = SamVisionEncoder(img_size=64, patch_size=16, dim=32, depth=8,
                           heads=4, mlp_ratio=2.0, out_chans=16,
                           window_size=2,
                           global_attn_indexes=(1, 3, 5, 7))
    imgs = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), imgs)
    # nonzero rel-pos so the bias path matters
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 2 else a, params)
    want = jax.jit(enc.apply)(params, imgs)

    mesh = make_stage_mesh(4)
    got = sam_encoder_pipeline(enc, params, imgs, mesh, num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@needs4
def test_ring_attention_matches_reference(rng):
    """Sequence-parallel biased attention == the unfused reference."""
    g, d, bh = 8, 16, 6                     # N = 64 tokens over 4 devices
    q = jnp.asarray(rng.standard_normal((bh, g * g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, g * g, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, g * g, d)), jnp.float32)
    rel_pos_h = jnp.asarray(rng.standard_normal((2 * g - 1, d)) * 0.2)
    rel_pos_w = jnp.asarray(rng.standard_normal((2 * g - 1, d)) * 0.2)
    rh, rw = project_rel_tables(q, rel_pos_h, rel_pos_w, g)

    want = sam_attention_reference(q, k, v, rh, rw)
    mesh = make_seq_mesh(4)
    got = sam_ring_attention(q, k, v, rh, rw, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
