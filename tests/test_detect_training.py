"""YOLO detection training: assigner semantics + overfit on a toy set."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.models.yolo import YoloV8, detect
from lameness_tpu.pipeline.detect_training import (DetectTrainer, ciou,
                                                   detection_loss,
                                                   elementwise_iou,
                                                   flatten_levels,
                                                   task_aligned_assign)


def test_ciou_properties(rng):
    a = jnp.asarray([[0, 0, 10, 10.0]])
    assert float(ciou(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
    b = jnp.asarray([[100, 100, 110, 110.0]])
    assert float(ciou(a, b)[0]) < 0.0          # disjoint: penalty terms only
    c = jnp.asarray([[0, 0, 10, 20.0]])
    assert float(ciou(a, c)[0]) < float(elementwise_iou(a, c)[0])


def test_assigner_picks_anchors_inside_gt():
    b, a_n, c = 1, 16, 2
    xs = (np.arange(4) + 0.5) * 8
    gx, gy = np.meshgrid(xs, xs)
    anchors = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1),
                          jnp.float32)
    # perfect predictions: every anchor predicts the gt box of class 1
    gt_boxes = jnp.asarray([[[4.0, 4.0, 20.0, 20.0]]])
    gt_labels = jnp.asarray([[1]])
    gt_mask = jnp.asarray([[True]])
    pd_boxes = jnp.tile(gt_boxes, (1, a_n, 1)).reshape(b, a_n, 4)
    pd_scores = jnp.full((b, a_n, c), 0.9)
    tl, tb, ts, fg, gt_idx = task_aligned_assign(
        pd_scores, pd_boxes, anchors, gt_labels, gt_boxes, gt_mask)
    fg = np.asarray(fg[0])
    inside = np.asarray((anchors[:, 0] > 4) & (anchors[:, 0] < 20)
                        & (anchors[:, 1] > 4) & (anchors[:, 1] < 20))
    assert fg.sum() > 0
    assert np.all(~fg | inside)                 # fg only inside the box
    assert np.all(np.asarray(tl[0])[fg] == 1)
    assert np.allclose(np.asarray(tb[0])[fg], [4, 4, 20, 20])
    # soft scores live on the gt class only
    assert float(ts[0, :, 0].max()) == 0.0
    assert float(ts[0, :, 1].max()) > 0.5


def test_assigner_respects_padding_mask():
    anchors = jnp.asarray([[8.0, 8.0], [24.0, 24.0]])
    gt_boxes = jnp.asarray([[[0.0, 0, 16, 16], [16.0, 16, 32, 32]]])
    gt_labels = jnp.asarray([[0, 0]])
    pd_boxes = jnp.asarray([[[0.0, 0, 16, 16], [16.0, 16, 32, 32]]])
    pd_scores = jnp.full((1, 2, 1), 0.9)
    _, _, _, fg, _ = task_aligned_assign(
        pd_scores, pd_boxes, anchors, gt_labels, gt_boxes,
        jnp.asarray([[True, False]]))
    assert bool(fg[0, 0]) and not bool(fg[0, 1])


@pytest.mark.slow
def test_detect_trainer_overfits_toy_squares():
    """Nano YOLO overfits 4 synthetic one-square images; loss drops and the
    decoded detection lands on the square."""
    rng_np = np.random.default_rng(3)
    s, b, max_boxes = 96, 4, 2
    images = np.full((b, s, s, 3), 0.2, np.float32)
    gt_boxes = np.zeros((b, max_boxes, 4), np.float32)
    gt_labels = np.zeros((b, max_boxes), np.int64)
    gt_mask = np.zeros((b, max_boxes), bool)
    for i in range(b):
        x, y = rng_np.integers(8, 40, 2)
        w, h = rng_np.integers(30, 45, 2)
        images[i, y:y + h, x:x + w] = 0.9
        gt_boxes[i, 0] = [x, y, x + w, y + h]
        gt_mask[i, 0] = True

    model = YoloV8(variant="n", num_classes=1)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, s, s, 3)))["params"]
    trainer = DetectTrainer(model, params, lr=2e-3)
    im = jnp.asarray(images)
    gl = jnp.asarray(gt_labels)
    gb = jnp.asarray(gt_boxes)
    gm = jnp.asarray(gt_mask)
    first = trainer.train_step(im, gl, gb, gm)
    losses = [first["total"]]
    for _ in range(60):
        losses.append(trainer.train_step(im, gl, gb, gm)["total"])
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert first["n_fg"] > 0

    # decoded prediction overlaps the square
    out = model.apply({"params": trainer.params}, im)
    det = detect(out["levels"], conf_threshold=0.05, max_det=4)
    boxes = np.asarray(det["boxes"])
    ok = 0
    for i in range(b):
        best = 0.0
        for j in range(4):
            if not bool(det["valid"][i, j]):
                continue
            pb, gt = boxes[i, j], gt_boxes[i, 0]
            lt = np.maximum(pb[:2], gt[:2])
            rb = np.minimum(pb[2:], gt[2:])
            inter = np.prod(np.clip(rb - lt, 0, None))
            ua = (np.prod(pb[2:] - pb[:2]) + np.prod(gt[2:] - gt[:2])
                  - inter)
            best = max(best, inter / max(ua, 1e-6))
        ok += best > 0.25
    assert ok >= b - 1, f"only {ok}/{b} images localise the square"


@pytest.mark.slow
def test_detect_trainer_pose_branch_learns_keypoints():
    """Pose-variant trainer: keypoint loss drives predicted kpts toward
    the square's corners."""
    rng_np = np.random.default_rng(5)
    s, b, max_boxes, nk = 96, 2, 1, 3
    images = np.full((b, s, s, 3), 0.2, np.float32)
    gt_boxes = np.zeros((b, max_boxes, 4), np.float32)
    gt_labels = np.zeros((b, max_boxes), np.int64)
    gt_mask = np.ones((b, max_boxes), bool)
    gt_kpts = np.zeros((b, max_boxes, nk, 3), np.float32)
    for i in range(b):
        x, y = rng_np.integers(10, 35, 2)
        w, h = rng_np.integers(35, 45, 2)
        images[i, y:y + h, x:x + w] = 0.9
        gt_boxes[i, 0] = [x, y, x + w, y + h]
        # keypoints: two corners + center, all visible
        gt_kpts[i, 0] = [[x, y, 2], [x + w, y + h, 2],
                         [x + w / 2, y + h / 2, 2]]

    model = YoloV8(variant="n", num_classes=1, num_keypoints=nk)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, s, s, 3)))["params"]
    trainer = DetectTrainer(model, params, lr=2e-3)
    args = (jnp.asarray(images), jnp.asarray(gt_labels),
            jnp.asarray(gt_boxes), jnp.asarray(gt_mask),
            jnp.asarray(gt_kpts))
    first = trainer.train_step(*args)
    assert "kpt" in first and np.isfinite(first["kpt"])
    for _ in range(60):
        last = trainer.train_step(*args)
    assert last["kpt"] < 0.7 * first["kpt"], (first["kpt"], last["kpt"])
    assert last["total"] < 0.6 * first["total"]


def test_ema_tracks_but_lags_params():
    model = YoloV8(variant="n", num_classes=1)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)))["params"]
    trainer = DetectTrainer(model, params, lr=1e-3, ema_tau=10.0)
    im = jnp.full((1, 64, 64, 3), 0.5)
    gl = jnp.zeros((1, 1), jnp.int32)
    gb = jnp.asarray([[[8.0, 8, 40, 40]]])
    gm = jnp.ones((1, 1), bool)
    for _ in range(5):
        trainer.train_step(im, gl, gb, gm)

    def dist(a, b):
        return sum(float(jnp.abs(x - y).sum()) for x, y in zip(
            jax.tree.leaves(a), jax.tree.leaves(b)))

    # EMA moved off the init but not as far as the live params
    assert dist(trainer.ema_params, params) > 0
    assert dist(trainer.ema_params, params) < dist(trainer.params, params)


def test_detection_loss_finite_with_empty_gt():
    model = YoloV8(variant="n", num_classes=1)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)))["params"]
    out = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
    loss, aux = detection_loss(out["levels"], jnp.zeros((1, 2), jnp.int32),
                               jnp.zeros((1, 2, 4)),
                               jnp.zeros((1, 2), bool), num_classes=1)
    assert np.isfinite(float(loss))
    assert float(aux["n_fg"]) == 0.0
