"""TCN, GaitTransformer, and the 44-d sequence feature extraction."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.models import sequence_features as sf
from lameness_tpu.models.tcn import TCN, CausalConv1d, predict_with_uncertainty
from lameness_tpu.models.gait_transformer import GaitTransformer, sinusoidal_pe


def _pose_seq(t=10, conf=0.9):
    seq = []
    for i in range(t):
        kps = [{"name": f"kp{k}", "x": 100 + k + i, "y": 200 + k,
                "confidence": conf} for k in range(20)]
        seq.append({"frame": i * 5, "bbox": [50.0, 100.0, 450.0, 400.0],
                    "keypoints": kps, "detection_confidence": 0.95})
    return seq


# -------------------------------------------------------------- features ---
def test_feature_extraction_dims_and_normalization():
    feats, mask = sf.extract_from_pose_sequences(_pose_seq(8))
    assert feats.shape == (8, 44)
    assert mask.shape == (8,) and not mask.any()
    # first kp of first frame: (100-50)/400, (200-100)/300
    assert feats[0, 0] == pytest.approx(50 / 400)
    assert feats[0, 1] == pytest.approx(100 / 300)
    # extras: centroid/frame dims
    assert feats[0, 40] == pytest.approx(250 / 1280)
    assert feats[0, 41] == pytest.approx(250 / 720)
    assert feats[0, 42] == pytest.approx(400 * 300 / (1280 * 720))
    # velocity zero (static bbox)
    assert np.allclose(feats[:, 43], 0.0)


def test_feature_extraction_low_confidence_mask():
    feats, mask = sf.extract_from_pose_sequences(_pose_seq(4, conf=0.1))
    assert mask.all()


def test_pad_or_truncate():
    f = np.ones((10, 44), np.float32)
    m = np.zeros(10, bool)
    fp, mp = sf.pad_or_truncate(f, m, 20)
    assert fp.shape == (20, 44) and mp.shape == (20,)
    assert fp[:5].sum() == 0 and mp[:5].all()        # centered zero pad
    assert fp[5:15].sum() == 10 * 44 and not mp[5:15].any()
    f2 = sf.pad_or_truncate(np.arange(30)[:, None].astype(np.float32) *
                            np.ones((30, 44), np.float32), None, 20)
    assert f2.shape == (20, 44)
    assert f2[0, 0] == 5                              # center crop from 30->20


def test_device_feature_extraction_matches_host():
    seq = _pose_seq(6)
    host_feats, host_mask = sf.extract_from_pose_sequences(seq)
    kp_xy = np.array([[[kp["x"], kp["y"]] for kp in f["keypoints"]]
                      for f in seq], np.float32)
    kp_conf = np.full((6, 20), 0.9, np.float32)
    boxes = np.tile(np.array([50.0, 100.0, 450.0, 400.0], np.float32), (6, 1))
    det_conf = np.full((6,), 0.95, np.float32)
    dev_feats, dev_mask = sf.extract_from_arrays(
        jnp.asarray(kp_xy), jnp.asarray(kp_conf), jnp.asarray(boxes),
        jnp.asarray(det_conf), jnp.ones(6, bool))
    np.testing.assert_allclose(np.asarray(dev_feats), host_feats, atol=1e-5)
    assert np.array_equal(np.asarray(dev_mask), host_mask)


# ------------------------------------------------------------------- TCN ---
def test_causal_conv_is_causal(rng):
    conv = CausalConv1d(4, kernel_size=3, dilation=2)
    x = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), x)
    y1 = conv.apply(params, x)
    # perturb the future: outputs at t <= 7 unchanged
    x2 = x.at[0, 8:, :].add(100.0)
    y2 = conv.apply(params, x2)
    assert np.allclose(y1[0, :8], y2[0, :8], atol=1e-5)
    assert y1.shape == (1, 16, 4)


def test_tcn_forward_and_receptive_field():
    m = TCN()
    assert m.receptive_field == 61
    x = jnp.zeros((2, 125, 44))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_tcn_mc_dropout_uncertainty():
    m = TCN(dropout=0.5)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 125, 44)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    mean, std = predict_with_uncertainty(m, params, x,
                                         jax.random.PRNGKey(7), n_samples=10)
    assert mean.shape == (2, 1) and std.shape == (2, 1)
    assert np.all(np.asarray(std) > 0)           # dropout => nonzero variance
    # deterministic pass has no variance
    mean2, std2 = predict_with_uncertainty(
        TCN(dropout=0.0), TCN(dropout=0.0).init(jax.random.PRNGKey(0), x), x,
        jax.random.PRNGKey(7), n_samples=4)
    assert np.allclose(np.asarray(std2), 0.0, atol=1e-7)


# ----------------------------------------------------------- transformer ---
def test_sinusoidal_pe_matches_reference_formula():
    pe = sinusoidal_pe(10, 8)
    assert pe[0, 0] == 0 and pe[0, 1] == 1
    assert pe[1, 0] == pytest.approx(np.sin(1.0))
    assert pe[1, 1] == pytest.approx(np.cos(1.0))
    assert pe[2, 2] == pytest.approx(np.sin(2 * 10000 ** (-2 / 8)))


def test_gait_transformer_forward_masked():
    m = GaitTransformer()
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 125, 44)).astype(np.float32))
    mask = jnp.zeros((2, 125), bool).at[:, 100:].set(True)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    out = m.apply(params, x, mask)
    assert out["probability"].shape == (2, 1)
    assert out["saliency"].shape == (2, 125)
    # masked positions receive ~zero attention
    assert np.asarray(out["saliency"])[:, 100:].max() < 1e-6
    # fully-masked row still finite (mean-pool clamp)
    full = jnp.ones((2, 125), bool)
    out2 = m.apply(params, x, full)
    assert np.isfinite(np.asarray(out2["probability"])).all()


def test_gait_transformer_mask_invariance():
    """Masked frames must not influence the prediction."""
    m = GaitTransformer(dropout=0.0)
    rng_np = np.random.default_rng(3)
    x = rng_np.standard_normal((1, 50, 44)).astype(np.float32)
    mask = np.zeros((1, 50), bool)
    mask[:, 40:] = True
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    p1 = m.apply(params, jnp.asarray(x), jnp.asarray(mask))["probability"]
    x2 = x.copy()
    x2[:, 40:] = rng_np.standard_normal((1, 10, 44))
    p2 = m.apply(params, jnp.asarray(x2), jnp.asarray(mask))["probability"]
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
