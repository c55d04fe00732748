"""DINOv2 flax model: parity vs HF torch Dinov2Model via weight conversion."""
import numpy as np
import pytest

import jax.numpy as jnp

from lameness_tpu.models.dino import DinoV2, convert_hf_state_dict, preprocess_frames


@pytest.fixture(scope="module")
def small_pair():
    torch = pytest.importorskip("torch")
    from transformers import Dinov2Config, Dinov2Model
    cfg = Dinov2Config(hidden_size=64, num_hidden_layers=3,
                       num_attention_heads=4, intermediate_size=256,
                       patch_size=14, image_size=56, layerscale_value=1.0)
    torch.manual_seed(0)
    tm = Dinov2Model(cfg).eval()
    fm = DinoV2(hidden_size=64, num_layers=3, num_heads=4, patch_size=14,
                pos_grid=4, ls_init=1.0)
    params = convert_hf_state_dict(tm.state_dict(), num_layers=3)
    return tm, fm, params


def test_dino_parity_native_resolution(small_pair, rng):
    import torch
    tm, fm, params = small_pair
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 3, 1, 2)).last_hidden_state.numpy()
    got = fm.apply(params, jnp.asarray(x))["last_hidden_state"]
    assert got.shape == ref.shape
    assert np.max(np.abs(np.asarray(got) - ref)) < 2e-4


def test_dino_parity_interpolated_positions(small_pair, rng):
    import torch
    tm, fm, params = small_pair
    # 84x84 input -> 6x6 grid vs 4x4 pretrain grid: exercises pos interpolation
    x = rng.standard_normal((1, 84, 84, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 3, 1, 2)).last_hidden_state.numpy()
    got = np.asarray(fm.apply(params, jnp.asarray(x))["last_hidden_state"])
    assert got.shape == ref.shape
    # bicubic kernels differ slightly between jax and torch
    assert np.abs(got - ref).mean() < 5e-3


def test_dino_pooled_embedding_dim(small_pair, rng):
    _, fm, params = small_pair
    x = jnp.asarray(rng.standard_normal((1, 56, 56, 3)).astype(np.float32))
    out = fm.apply(params, x)
    assert out["pooled"].shape == (1, 64)
    np.testing.assert_allclose(
        np.asarray(out["pooled"]),
        np.asarray(out["last_hidden_state"]).mean(axis=1), rtol=1e-5)


def test_preprocess_frames_geometry(rng):
    frames = jnp.asarray(
        (rng.uniform(0, 255, (2, 120, 160, 3))).astype(np.uint8))
    out = preprocess_frames(frames)
    assert out.shape == (2, 224, 224, 3)
    assert np.asarray(out).std() > 0.5      # normalized
