"""SAM flax model: end-to-end parity vs HF torch SamModel via conversion."""
import numpy as np
import pytest

import jax.numpy as jnp

from lameness_tpu.models.sam import (
    Sam, SamVisionEncoder, convert_hf_state_dict, postprocess_mask,
    window_partition, window_unpartition)


@pytest.fixture(scope="module")
def small_sam():
    torch = pytest.importorskip("torch")
    from transformers import SamConfig, SamModel
    cfg = SamConfig(
        vision_config=dict(hidden_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=128,
                           patch_size=16, global_attn_indexes=[1],
                           window_size=14, output_channels=256),
        prompt_encoder_config=dict(image_size=128, image_embedding_size=8),
    )
    torch.manual_seed(0)
    tm = SamModel(cfg).eval()
    fm = Sam(img_size=128, encoder_dim=64, encoder_depth=2, encoder_heads=4,
             global_attn_indexes=(1,))
    params = convert_hf_state_dict(tm.state_dict(), depth=2)
    return tm, fm, params


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 4)).astype(np.float32))
    parts, padded = window_partition(x, 7)
    back = window_unpartition(parts, 7, padded, (10, 12))
    assert np.allclose(back, x)


def test_sam_end_to_end_parity(small_sam, rng):
    import torch
    tm, fm, params = small_sam
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    boxes = np.array([[20.0, 30.0, 100.0, 110.0]], np.float32)
    with torch.no_grad():
        out = tm(pixel_values=torch.tensor(x).permute(0, 3, 1, 2),
                 input_boxes=torch.tensor(boxes)[:, None, :],
                 multimask_output=False)
    ref_masks = out.pred_masks.squeeze(1).numpy()      # (1, 1, 32, 32)
    ref_iou = out.iou_scores.squeeze(1).numpy()

    masks, iou = fm.apply(params, jnp.asarray(x), jnp.asarray(boxes))
    got_masks = np.asarray(masks)
    assert got_masks.shape == ref_masks.shape
    assert np.max(np.abs(got_masks - ref_masks)) < 5e-3
    assert np.max(np.abs(np.asarray(iou) - ref_iou)) < 1e-3
    # thresholded masks identical (up to borderline logits)
    agree = ((got_masks > 0) == (ref_masks > 0)).mean()
    assert agree > 0.999


def test_sam_encoder_parity(small_sam, rng):
    import torch
    tm, fm, params = small_sam
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm.vision_encoder(
            torch.tensor(x).permute(0, 3, 1, 2)).last_hidden_state.numpy()
    enc = SamVisionEncoder(img_size=128, dim=64, depth=2, heads=4,
                           global_attn_indexes=(1,))
    got = enc.apply({"params": params["params"]["vision_encoder"]},
                    jnp.asarray(x))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 2e-4


def test_encoder_pad_row_split_parity(rng):
    """content_rows static-pad split == full computation.

    On a bottom-padded canvas the pad token rows are identical across
    the batch, so the pre-global windowed layers may compute whole pad
    window-rows once and broadcast (SamVisionEncoder content_rows).
    Same per-window math at a different window-batch index — outputs
    must match the unsplit encoder to fp noise."""
    enc = SamVisionEncoder(img_size=256, dim=32, depth=3, heads=2,
                           global_attn_indexes=(2,))
    # content: pixel rows 0-143 (9 token rows of 16); rows 144+ are the
    # pad — constant (zero) across the batch, like pad_to_rect output
    x = rng.standard_normal((3, 256, 256, 3)).astype(np.float32)
    x[:, 144:] = 0.0
    import jax
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    full = enc.apply(params, jnp.asarray(x))
    split = enc.apply(params, jnp.asarray(x), 9)
    err = np.max(np.abs(np.asarray(full) - np.asarray(split)))
    assert err < 1e-5, err
    # content_rows covering the whole grid (or batch 1) => same program
    same = enc.apply(params, jnp.asarray(x), 16)
    assert np.max(np.abs(np.asarray(full) - np.asarray(same))) == 0.0
    one = enc.apply(params, jnp.asarray(x[:1]), 9)
    assert np.max(np.abs(np.asarray(full[:1]) - np.asarray(one))) < 1e-5


def test_postprocess_mask_geometry():
    low = jnp.full((256, 256), -5.0)
    low = low.at[:64, :].set(5.0)
    # source image 200x400 -> ratio = 1024/400 = 2.56; scaled img spans 512
    # canvas rows, so canvas rows < 256 (mask top quarter) -> orig rows < 100
    m = postprocess_mask(low, 1024 / 400, (200, 400), img_size=1024)
    assert m.shape == (200, 400)
    assert bool(m[10, 10]) and not bool(m[150, 10])
