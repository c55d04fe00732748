"""COCO-style mAP harness sanity checks."""
import numpy as np

from lameness_tpu.pipeline.evaluation import (_average_precision,
                                              evaluate_detections)


def _pack(preds_per_img, gts_per_img, d=8, m=4):
    n = len(preds_per_img)
    pb = np.zeros((n, d, 4)); ps = np.zeros((n, d))
    pc = np.zeros((n, d), int); pv = np.zeros((n, d), bool)
    gb = np.zeros((n, m, 4)); gl = np.zeros((n, m), int)
    gm = np.zeros((n, m), bool)
    for i, preds in enumerate(preds_per_img):
        for j, (box, score, cls) in enumerate(preds):
            pb[i, j], ps[i, j], pc[i, j], pv[i, j] = box, score, cls, True
    for i, gts in enumerate(gts_per_img):
        for j, (box, cls) in enumerate(gts):
            gb[i, j], gl[i, j], gm[i, j] = box, cls, True
    return pb, ps, pc, pv, gb, gl, gm


def test_perfect_predictions_score_one():
    gt = [[([0, 0, 10, 10], 0)], [([5, 5, 30, 30], 0)]]
    preds = [[([0, 0, 10, 10], 0.9, 0)], [([5, 5, 30, 30], 0.8, 0)]]
    out = evaluate_detections(*_pack(preds, gt), num_classes=1)
    assert out["mAP50"] == 1.0
    assert out["mAP50_95"] == 1.0


def test_missed_gt_halves_recall():
    gt = [[([0, 0, 10, 10], 0), ([50, 50, 60, 60], 0)]]
    preds = [[([0, 0, 10, 10], 0.9, 0)]]          # only one of two found
    out = evaluate_detections(*_pack(preds, gt), num_classes=1)
    assert 0.45 <= out["mAP50"] <= 0.55

    # a loose box counts at 0.5 IoU but not at high thresholds
    preds2 = [[([0, 0, 10, 10], 0.9, 0), ([48, 48, 60, 60], 0.8, 0)]]
    out2 = evaluate_detections(*_pack(preds2, gt), num_classes=1)
    assert out2["mAP50"] == 1.0
    assert out2["mAP50_95"] < 1.0


def test_false_positive_lowers_precision_curve():
    gt = [[([0, 0, 10, 10], 0)]]
    # high-scoring FP before the TP hurts AP
    preds = [[([100, 100, 110, 110], 0.95, 0), ([0, 0, 10, 10], 0.9, 0)]]
    out = evaluate_detections(*_pack(preds, gt), num_classes=1)
    assert out["mAP50"] < 1.0
    assert out["mAP50"] > 0.2


def test_class_confusion_is_a_miss():
    gt = [[([0, 0, 10, 10], 1)]]
    preds = [[([0, 0, 10, 10], 0.9, 0)]]          # wrong class
    out = evaluate_detections(*_pack(preds, gt), num_classes=2)
    assert out["mAP50"] == 0.0


def test_average_precision_edge_cases():
    assert np.isnan(_average_precision(np.zeros(0, bool), np.zeros(0), 0))
    assert _average_precision(np.zeros(0, bool), np.zeros(0), 3) == 0.0
    ap = _average_precision(np.asarray([True]), np.asarray([0.9]), 1)
    assert ap > 0.99
