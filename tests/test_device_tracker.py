"""Device ByteTrack fast path: lifecycle + agreement with the host tracker."""
import numpy as np
import pytest

import jax.numpy as jnp

from lameness_tpu.track.bytetrack import ByteTracker, Detection
from lameness_tpu.track.device_tracker import (CONFIRMED, EMPTY, LOST,
                                               TENTATIVE, init_state,
                                               track_clip, track_clip_batch,
                                               tracker_step)


def _two_walkers(t=12, k=4):
    """Two well-separated objects moving gently; fixed-K padding."""
    boxes = np.zeros((t, k, 4), np.float32)
    scores = np.zeros((t, k), np.float32)
    valid = np.zeros((t, k), bool)
    for i in range(t):
        boxes[i, 0] = [5.0 * i, 0, 5.0 * i + 60, 60]
        boxes[i, 1] = [300 - 5.0 * i, 200, 380 - 5.0 * i, 280]
        scores[i, :2] = [0.9, 0.85]
        valid[i, :2] = True
    return boxes, scores, valid


def test_device_tracker_confirms_and_keeps_ids():
    boxes, scores, valid = _two_walkers()
    final, outs = track_clip(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.asarray(valid), max_tracks=8)
    st = np.asarray(outs["state"])          # (T, S)
    ids = np.asarray(outs["track_id"])
    # two tracks confirmed by frame 2 and stable thereafter
    assert (st[2] == CONFIRMED).sum() == 2
    live = st[-1] == CONFIRMED
    assert live.sum() == 2
    # ids stay constant once assigned
    for s in np.where(live)[0]:
        assert len(set(ids[2:, s])) == 1
    assert int(np.asarray(final["next_id"])) == 3   # ids 1 and 2 issued


def test_device_tracker_tracks_positions():
    boxes, scores, valid = _two_walkers(t=10)
    _, outs = track_clip(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), max_tracks=8)
    ob = np.asarray(outs["boxes"])
    st = np.asarray(outs["state"])
    s0 = np.where(st[-1] == CONFIRMED)[0]
    # slot boxes track the ground truth within a few pixels by the end
    last_boxes = ob[-1, s0]
    gt = boxes[-1, :2]
    d = np.abs(last_boxes[:, None] - gt[None]).sum(-1).min(axis=1)
    assert np.all(d < 20), d


def test_device_tracker_lifecycle_deletion():
    t, k = 40, 2
    boxes = np.zeros((t, k, 4), np.float32)
    scores = np.zeros((t, k), np.float32)
    valid = np.zeros((t, k), bool)
    for i in range(4):                       # detections then disappearance
        boxes[i, 0] = [0, 0, 60, 60]
        scores[i, 0] = 0.9
        valid[i, 0] = True
    _, outs = track_clip(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), max_tracks=4)
    st = np.asarray(outs["state"])
    assert st[3, 0] == CONFIRMED
    assert (st[:, 0] == LOST).any()          # >30 misses -> LOST
    assert st[-1, 0] == LOST                 # not yet deleted at 36 misses


def test_device_matches_host_on_separated_targets():
    boxes, scores, valid = _two_walkers(t=12)
    host = ByteTracker()
    host_ids_per_frame = []
    for i in range(12):
        dets = [Detection(boxes[i, j], float(scores[i, j]))
                for j in range(4) if valid[i, j]]
        tracks = host.update(dets, frame_idx=i)
        host_ids_per_frame.append({t.track_id for t in tracks})
    _, outs = track_clip(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), max_tracks=8)
    st = np.asarray(outs["state"])
    # same number of confirmed tracks per frame from frame 2 on
    for i in range(2, 12):
        assert (st[i] == CONFIRMED).sum() == len(host_ids_per_frame[i]), i


def test_track_detection_frames_matches_host_shape():
    """Driver-facing wrapper emits the host path's structures."""
    from lameness_tpu.track.device_tracker import track_detection_frames
    boxes, scores, valid = _two_walkers(t=12)
    entries = [{"frame": i * 12,
                "detections": [{"bbox": boxes[i, j].tolist(),
                                "confidence": float(scores[i, j])}
                               for j in range(4) if valid[i, j]]}
               for i in range(12)]
    frame_tracks, summaries, stats = track_detection_frames(entries)
    assert len(summaries) == 2
    assert {s["track_id"] for s in summaries} == {1, 2}
    for s in summaries:
        assert s["end_frame"] == 132 and s["total_frames"] == 10
        assert 0.8 <= s["avg_confidence"] <= 0.95
    assert stats["total_tracks"] == 2
    assert stats["active_tracks"] == 2
    assert stats["backend"] == "device"
    # frame_tracks carry the host keys
    assert set(frame_tracks[0]) == {"frame", "track_id", "bbox",
                                    "confidence", "state"}
    assert all(ft["state"] == "CONFIRMED" for ft in frame_tracks)


def test_device_tracker_batched():
    boxes, scores, valid = _two_walkers(t=8)
    b = 3
    bb = jnp.asarray(np.tile(boxes[None], (b, 1, 1, 1)))
    ss = jnp.asarray(np.tile(scores[None], (b, 1, 1)))
    vv = jnp.asarray(np.tile(valid[None], (b, 1, 1)))
    final, outs = track_clip_batch(bb, ss, vv, max_tracks=8)
    assert np.asarray(outs["state"]).shape == (b, 8, 8)
    st = np.asarray(outs["state"])
    assert np.all((st[:, -1] == CONFIRMED).sum(axis=1) == 2)


def _crowded_scene(t=30, k=8, n_obj=5, seed=7):
    """n_obj crossing walkers with jittered boxes, 12% detection dropout,
    and occasional low-confidence detections (exercises the second BYTE
    association stage)."""
    rng = np.random.default_rng(seed)
    boxes = np.zeros((t, k, 4), np.float32)
    scores = np.zeros((t, k), np.float32)
    valid = np.zeros((t, k), bool)
    # walkway lanes: y-separated (no cross-lane box overlap — that would
    # be unresolvable ambiguity, not tracker divergence), x crossing
    xs = rng.uniform(0, 540, size=n_obj)
    vx = rng.uniform(4, 9, size=n_obj) * rng.choice([-1, 1], size=n_obj)
    for i in range(t):
        for j in range(n_obj):
            if rng.random() < 0.12:          # dropout
                continue
            x1 = xs[j] + vx[j] * i + rng.normal(0, 1.5)
            y1 = 70.0 * j + rng.normal(0, 1.5)
            boxes[i, j] = [x1, y1, x1 + 70, y1 + 55]
            scores[i, j] = 0.85 if rng.random() > 0.2 else 0.35
            valid[i, j] = True
    return boxes, scores, valid


def _iou_1to1(a, b):
    """IoU matrix between (N, 4) and (M, 4)."""
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], \
        b[None, :, 3]
    iw = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0, None)
    ih = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0, None)
    inter = iw * ih
    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / np.maximum(ua, 1e-9)


def test_device_host_divergence_bounded_crowded():
    """Quantified divergence vs the host ByteTracker on a crowded
    walkway scene with dropout + low-confidence detections (VERDICT W7),
    measured against ground truth: the device fast path must cover at
    least as many true objects per frame as the reference-exact host
    (minus 5%) and must fragment no more (ids issued <= host's).  The
    host's own quirks (tentative re-spawns under dropout, Kalman-drifted
    zombie confirms) are inherited from the reference and NOT replicated
    by the fast path — this test pins the direction of the divergence."""
    boxes, scores, valid = _crowded_scene()
    t = boxes.shape[0]
    host = ByteTracker()
    host_cov = []
    for i in range(t):
        dets = [Detection(boxes[i, j], float(scores[i, j]))
                for j in range(boxes.shape[1]) if valid[i, j]]
        tracks = host.update(dets, frame_idx=i)
        gt = boxes[i][valid[i]]
        if len(gt) == 0:
            continue
        tb = np.asarray([tr.bbox for tr in tracks], float).reshape(-1, 4)
        cov = (_iou_1to1(gt, tb).max(axis=1) > 0.5).mean() if len(tb) \
            else 0.0
        host_cov.append(cov)
    _, outs = track_clip(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), max_tracks=16)
    st = np.asarray(outs["state"])
    ob = np.asarray(outs["boxes"])
    dev_cov = []
    for i in range(t):
        gt = boxes[i][valid[i]]
        if len(gt) == 0:
            continue
        tb = ob[i][st[i] == CONFIRMED].reshape(-1, 4)
        dev_cov.append((_iou_1to1(gt, tb).max(axis=1) > 0.5).mean()
                       if len(tb) else 0.0)
    # skip the 3-frame confirmation ramp both trackers share
    h, d = float(np.mean(host_cov[3:])), float(np.mean(dev_cov[3:]))
    assert d >= h - 0.05, (d, h)
    assert d >= 0.85, (d, h)                  # absolute floor
    n_dev_ids = int(np.asarray(outs["track_id"]).max())   # ids start at 1
    n_host_ids = host.next_id                             # ids start at 0
    assert n_dev_ids <= n_host_ids, (n_dev_ids, n_host_ids)


def test_device_host_id_stability_through_crossing():
    """Two targets crossing paths: both trackers must keep exactly two
    ids for the whole clip (no fragmentation at the crossing)."""
    t, k = 20, 4
    boxes = np.zeros((t, k, 4), np.float32)
    scores = np.zeros((t, k), np.float32)
    valid = np.zeros((t, k), bool)
    for i in range(t):
        boxes[i, 0] = [10.0 + 15 * i, 100, 80.0 + 15 * i, 170]   # L -> R
        boxes[i, 1] = [300.0 - 15 * i, 104, 370.0 - 15 * i, 174]  # R -> L
        scores[i, :2] = [0.9, 0.88]
        valid[i, :2] = True
    host = ByteTracker()
    for i in range(t):
        dets = [Detection(boxes[i, j], float(scores[i, j]))
                for j in range(k) if valid[i, j]]
        host.update(dets, frame_idx=i)
    _, outs = track_clip(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(valid), max_tracks=8)
    ids = np.asarray(outs["track_id"])
    st = np.asarray(outs["state"])
    issued = set(ids[st == CONFIRMED].tolist())
    assert len(issued) == 2, issued
    assert int(np.asarray(outs["state"])[-1].tolist().count(CONFIRMED)) == 2
