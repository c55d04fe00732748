"""Device ops: boxes/IoU, batched NMS, fused preprocess, attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.ops import boxes as ob
from lameness_tpu.ops import nms as on
from lameness_tpu.ops import preprocess as op
from lameness_tpu.ops import attention as oa


# ----------------------------------------------------------------- boxes ---
def _np_iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / union if union > 0 else 0.0


def test_pairwise_iou_matches_scalar_reference(rng):
    a = rng.uniform(0, 100, (7, 4)).astype(np.float32)
    b = rng.uniform(0, 100, (5, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2]) + 1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2]) + 1
    got = np.asarray(ob.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(7):
        for j in range(5):
            assert got[i, j] == pytest.approx(_np_iou(a[i], b[j]), abs=1e-5)


def test_box_conversions_roundtrip(rng):
    x = rng.uniform(0, 50, (10, 4)).astype(np.float32)
    x[:, 2:] = x[:, :2] + 1 + np.abs(x[:, 2:])
    xyxy = jnp.asarray(x)
    assert np.allclose(ob.xywh_to_xyxy(ob.xyxy_to_xywh(xyxy)), xyxy, atol=1e-4)
    assert np.allclose(ob.zsr_to_xyxy(ob.xyxy_to_zsr(xyxy)), xyxy, atol=1e-2)


# ------------------------------------------------------------------- NMS ---
def _np_greedy_nms(boxes, scores, iou_thr):
    order = list(np.argsort(-scores))
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        order = [j for j in order if _np_iou(boxes[i], boxes[j]) <= iou_thr]
    return keep


def test_nms_matches_numpy_greedy(rng):
    n = 40
    boxes = rng.uniform(0, 200, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(20, 80, (n, 2))
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    classes = np.zeros(n, np.int32)
    ref_keep = _np_greedy_nms(boxes, scores, 0.5)

    b, s, c, valid = on.nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        max_out=16, iou_threshold=0.5)
    got_n = int(valid.sum())
    assert got_n == min(len(ref_keep), 16)
    # survivors in the same score order
    for slot, ref_i in enumerate(ref_keep[:got_n]):
        assert np.allclose(b[slot], boxes[ref_i], atol=1e-5)
        assert float(s[slot]) == pytest.approx(scores[ref_i])


def test_nms_score_threshold_and_padding(rng):
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.asarray([0.9, 0.05])
    classes = jnp.asarray([0, 0], jnp.int32)
    b, s, c, valid = on.nms_single(boxes, scores, classes, max_out=4,
                                   score_threshold=0.1)
    assert int(valid.sum()) == 1
    assert np.all(np.asarray(b[1:]) == 0)
    assert int(c[1]) == -1


def test_nms_multiclass_no_cross_suppression():
    # identical boxes, different classes: both survive class-aware NMS
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.asarray([0, 1], jnp.int32)
    _, _, _, valid = on.nms_single(boxes, scores, classes, max_out=4)
    assert int(valid.sum()) == 2
    _, _, _, valid_ag = on.nms_single(boxes, scores, classes, max_out=4,
                                      class_agnostic=True)
    assert int(valid_ag.sum()) == 1


def test_nms_batched_shapes(rng):
    boxes = jnp.asarray(rng.uniform(0, 100, (3, 20, 4)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 1, (3, 20)).astype(np.float32))
    classes = jnp.zeros((3, 20), jnp.int32)
    b, s, c, v = on.nms_batched(boxes, scores, classes, max_out=8)
    assert b.shape == (3, 8, 4) and v.shape == (3, 8)


# ------------------------------------------------------------ preprocess ---
def test_crop_resize_identity():
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = 255
    out = op.crop_resize(jnp.asarray(img), jnp.asarray([8.0, 8.0, 24.0, 24.0]),
                         (16, 16))
    assert np.asarray(out).mean() > 0.95   # white crop, normalized to [0,1]


def test_crop_resize_matches_cv2_upscale(rng):
    import cv2
    img = rng.uniform(0, 255, (64, 80, 3)).astype(np.uint8)
    box = [10.0, 5.0, 26.0, 21.0]     # 16x16 crop -> 24x24 (upscale: no AA)
    ours = np.asarray(op.crop_resize(jnp.asarray(img), jnp.asarray(box), (24, 24)))
    crop = img[5:21, 10:26].astype(np.float32) / 255.0
    ref = cv2.resize(crop, (24, 24), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2]).mean() < 0.01


def test_crop_resize_downscale_smooth(rng):
    # On downscale jax antialiases (correct resampling) while cv2 INTER_LINEAR
    # does not; on a smooth image both converge.
    import cv2
    yy, xx = np.mgrid[0:64, 0:80]
    img = ((yy + xx) / (64 + 80) * 255).astype(np.uint8)[..., None].repeat(3, -1)
    box = [10.0, 5.0, 58.0, 53.0]
    ours = np.asarray(op.crop_resize(jnp.asarray(img), jnp.asarray(box), (24, 24)))
    crop = img[5:53, 10:58].astype(np.float32) / 255.0
    ref = cv2.resize(crop, (24, 24), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2]).mean() < 0.01


def test_normalize():
    x = jnp.ones((4, 4, 3)) * 0.5
    out = op.normalize(x)
    expected = (0.5 - np.array(op.IMAGENET_MEAN)) / np.array(op.IMAGENET_STD)
    assert np.allclose(out[0, 0], expected, atol=1e-6)


def test_letterbox_geometry_and_inverse(rng):
    img = rng.uniform(0, 255, (90, 160, 3)).astype(np.uint8)
    canvas, ratio, pad = op.letterbox(jnp.asarray(img), 64)
    assert canvas.shape == (64, 64, 3)
    assert float(ratio) == pytest.approx(64 / 160)
    # 90*0.4=36 high → pad_y = (64-36)//2 = 14
    assert np.asarray(pad).tolist() == [0.0, 14.0]
    boxes = jnp.asarray([[0.0, 14.0, 64.0, 50.0]])
    back = op.unletterbox_boxes(boxes, ratio, pad)
    assert np.allclose(back, [[0, 0, 160, 90]], atol=1e-3)


def test_clip_views_shapes(rng):
    frames = jnp.asarray(rng.uniform(0, 255, (5, 72, 128, 3)).astype(np.uint8))
    yolo_v, dino_v = op.clip_views(frames, None, yolo_size=64, dino_size=32)
    assert yolo_v.shape == (5, 64, 64, 3)
    assert dino_v.shape == (5, 32, 32, 3)


# ------------------------------------------------------------- attention ---
def test_pallas_attention_matches_reference(rng):
    b, h, s, d = 2, 3, 100, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    ref = oa.reference_attention(q, k, v)
    got = oa.flash_attention(q, k, v, use_pallas=True, interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_attention_with_bias_uses_reference_path(rng):
    b, h, s, d = 1, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    bias = jnp.zeros((b, h, s, s))
    out = oa.flash_attention(q, q, q, bias=bias)
    ref = oa.reference_attention(q, q, q)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
