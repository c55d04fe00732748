"""Tracking: LAPJV, Kalman, ByteTrack lifecycle/association, Re-ID."""
import numpy as np
import pytest

from lameness_tpu.track.assignment import lapjv_square, solve, using_native
from lameness_tpu.track.bytetrack import (ByteTracker, Detection, Track,
                                          TrackState, associate, iou_matrix)
from lameness_tpu.track.kalman import KalmanState, SingleKalman, bbox_to_z, z_to_bbox
from lameness_tpu.track.reid import CowReIDMatcher, SIM_MEDIUM
from lameness_tpu.io.vecstore import VectorStore


# ------------------------------------------------------------- assignment ---
def test_lapjv_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment
    for _ in range(30):
        n = int(rng.integers(2, 25))
        c = rng.uniform(0, 2, (n, n))
        _, _, total = lapjv_square(c)
        r, col = linear_sum_assignment(c)
        assert total == pytest.approx(c[r, col].sum(), abs=1e-9)


def test_solve_rectangular_and_cost_limit():
    c = np.array([[0.1, 5.0], [5.0, 0.2], [5.0, 5.0]])
    matched, un_r, un_c = solve(c, cost_limit=1.0)
    assert sorted(map(tuple, matched.tolist())) == [(0, 0), (1, 1)]
    assert list(un_r) == [2] and list(un_c) == []


def test_native_lapjv_available():
    assert using_native(), "C++ LAPJV should compile in this image"


# ----------------------------------------------------------------- kalman ---
def test_bbox_z_roundtrip(rng):
    b = np.array([10.0, 20.0, 110.0, 80.0])
    z = bbox_to_z(b)
    assert z[0] == 60 and z[1] == 50 and z[2] == 100 * 60
    assert np.allclose(z_to_bbox(z), b, atol=1e-2)


def test_kalman_constant_velocity_prediction():
    kf = SingleKalman(np.array([0.0, 0.0, 10.0, 10.0]))
    # feed consistent rightward motion: 5 px/frame
    for i in range(1, 8):
        kf.predict()
        kf.update(np.array([5.0 * i, 0.0, 10.0 + 5.0 * i, 10.0]))
    pred = kf.predict()
    cx = (pred[0] + pred[2]) / 2
    assert cx == pytest.approx(5.0 * 8 + 5.0, abs=1.5)   # extrapolates motion


def test_kalman_batched_matches_single(rng):
    boxes = rng.uniform(0, 100, (4, 2))
    boxes = np.hstack([boxes, boxes + 50])
    batch = KalmanState.create(boxes)
    singles = [SingleKalman(b) for b in boxes]
    for step in range(3):
        pb = batch.predict()
        ps = np.stack([s.predict() for s in singles])
        np.testing.assert_allclose(pb, ps, atol=1e-9)
        obs = boxes + 3.0 * (step + 1)
        batch.update(np.arange(4), obs)
        for s, o in zip(singles, obs):
            s.update(o)


# -------------------------------------------------------------- bytetrack ---
def test_iou_matrix_basic():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = iou_matrix(a, b)
    assert iou[0, 0] == pytest.approx(1.0, abs=1e-5)
    assert iou[0, 1] == pytest.approx(25 / 175, abs=1e-4)
    assert iou[0, 2] == 0.0


def test_associate_gates_low_iou():
    det = np.array([[0, 0, 10, 10.0]])
    trk = np.array([[100, 100, 110, 110.0]])
    m, un_d, un_t = associate(det, trk, iou_threshold=0.3)
    assert len(m) == 0 and list(un_d) == [0] and list(un_t) == [0]


def test_track_lifecycle_confirm_and_lose():
    tracker = ByteTracker()
    det = lambda x: [Detection(np.array([x, 0, x + 50, 50.0]), 0.9)]
    # 3 hits -> confirmed
    out = []
    for i in range(3):
        out = tracker.update(det(5.0 * i), frame_idx=i)
    assert len(out) == 1 and out[0].hits == 3
    assert out[0].state == TrackState.CONFIRMED
    # 31 misses -> lost
    for i in range(3, 35):
        out = tracker.update([], frame_idx=i)
    states = [t.state for t in tracker.tracks]
    assert TrackState.LOST in states


def test_bytetrack_two_objects_stable_ids():
    tracker = ByteTracker()
    ids_seen = set()
    # gentle per-frame motion so step IoU stays above the 0.8 stage-1 gate,
    # matching real 25 fps cow displacement
    for i in range(10):
        dets = [Detection(np.array([5.0 * i, 0, 5.0 * i + 60, 60]), 0.9),
                Detection(np.array([300 - 5.0 * i, 100, 380 - 5.0 * i, 180]), 0.85)]
        tracks = tracker.update(dets, frame_idx=i)
        ids_seen.update(t.track_id for t in tracks)
    assert ids_seen == {0, 1}
    assert tracker.track_count == 2


def test_bytetrack_low_conf_second_stage():
    tracker = ByteTracker()
    box = np.array([0.0, 0, 60, 60])
    dx = np.array([5.0, 0, 5.0, 0])          # horizontal walk
    for i in range(3):
        tracker.update([Detection(box + dx * i, 0.9)], frame_idx=i)
    # low-confidence detection continues the track (stage 2)
    tracks = tracker.update([Detection(box + dx * 3, 0.3)], frame_idx=3)
    assert len(tracks) == 1 and tracks[0].hits == 4
    # below low_thresh -> ignored entirely
    tracker.update([Detection(box + dx * 4, 0.05)], frame_idx=4)
    assert tracker.tracks[0].time_since_update >= 1


def test_bytetrack_statistics_schema():
    tracker = ByteTracker()
    tracker.update([Detection(np.array([0.0, 0, 50, 50]), 0.9)], frame_idx=0)
    stats = tracker.get_statistics()
    for k in ("total_tracks", "active_tracks", "confirmed", "tentative",
              "lost", "frame_id", "high_thresh", "low_thresh",
              "use_appearance"):
        assert k in stats


# ------------------------------------------------------------------- reid ---
def test_reid_create_then_match(tmp_path, rng):
    store = VectorStore(tmp_path / "vec.json")
    matcher = CowReIDMatcher(store, embedding_dim=16)
    emb = rng.standard_normal(16)
    m1 = matcher.match_or_create(emb, "vid1", 0)
    assert m1.is_new_identity and m1.cow_id == "COW-0001"
    # same embedding matches with high similarity
    m2 = matcher.match_or_create(emb + rng.standard_normal(16) * 0.01,
                                 "vid2", 0)
    assert not m2.is_new_identity
    assert m2.cow_id == "COW-0001"
    assert m2.similarity > SIM_MEDIUM
    # orthogonal embedding creates a new identity
    other = rng.standard_normal(16) * 0.1
    other -= other @ emb / (emb @ emb) * emb
    m3 = matcher.match_or_create(other, "vid3", 1)
    assert m3.is_new_identity and m3.cow_id == "COW-0002"


def test_reid_momentum_update(tmp_path, rng):
    store = VectorStore(tmp_path / "vec.json")
    matcher = CowReIDMatcher(store, embedding_dim=8)
    emb = np.ones(8)
    m1 = matcher.match_or_create(emb, "v1", 0)
    before = np.asarray(store.retrieve("cow_identities", m1.identity_id).vector)
    emb2 = np.ones(8)
    emb2[0] = 5.0
    matcher.match_or_create(emb2, "v2", 0)
    after = np.asarray(store.retrieve("cow_identities", m1.identity_id).vector)
    assert not np.allclose(before, after)
    assert np.linalg.norm(after) == pytest.approx(1.0, abs=1e-6)
    p = store.retrieve("cow_identities", m1.identity_id).payload
    assert p["total_sightings"] == 2


def test_vecstore_persistence(tmp_path):
    store = VectorStore(tmp_path / "v.json")
    store.upsert("c", "a", [1.0, 0.0], {"label": 1})
    store.upsert("c", "b", [0.0, 1.0], {"label": 0})
    store2 = VectorStore(tmp_path / "v.json")
    hits = store2.search("c", [1.0, 0.1], top_k=2)
    assert hits[0].id == "a" and hits[0].payload["label"] == 1
    assert len(hits) == 2
