"""Data-parallel inference over the 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from lameness_tpu.parallel.mesh import make_mesh
from lameness_tpu.pipeline.engine import make_test_engine


@pytest.mark.slow
def test_sharded_matches_single_device():
    eng_ref = make_test_engine()
    s = eng_ref.spec
    rng_np = np.random.default_rng(0)
    frames = rng_np.integers(0, 255, (5, s.clip_frames, s.frame_height,
                                      s.frame_width, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(4)
    ref = eng_ref.process_clip_batch(frames, rng=rng)

    eng = make_test_engine()
    mesh = make_mesh(8)
    eng.shard_inference(mesh)
    got = eng.process_clip_batch_sharded(frames, rng=rng)

    assert got["tcn_probability"].shape == (5,)
    np.testing.assert_allclose(got["embeddings"], ref["embeddings"],
                               atol=1e-4)
    np.testing.assert_allclose(got["primary_boxes"], ref["primary_boxes"],
                               atol=1e-3)
    # MC-dropout rngs are shared per call, not per clip-row, so head outputs
    # match only when the padded batch equals the original; check shape+range
    assert np.all((got["tcn_probability"] >= 0)
                  & (got["tcn_probability"] <= 1))


def test_sharded_batch_divisible_exact():
    eng = make_test_engine()
    mesh = make_mesh(8)
    eng.shard_inference(mesh)
    s = eng.spec
    frames = np.random.default_rng(1).integers(
        0, 255, (8, s.clip_frames, s.frame_height, s.frame_width, 3),
        dtype=np.uint8)
    out = eng.process_clip_batch_sharded(frames)
    assert out["tcn_probability"].shape == (8,)
    assert out["masks"].shape[0] == 8
