"""Batched curation detector (VERDICT r3 item 4): one jitted dispatch
per CHUNK of frames instead of per frame, with outputs identical to the
per-frame path (golden parity) — reference per-frame loop:
services/clip-curation/app/main.py:133-167."""
import numpy as np
import pytest

import jax

from lameness_tpu.models.yolo import YoloV8, init_params
from lameness_tpu.video.curation import (BatchedYoloDetector, ClipCurator,
                                         yolo_detector)


@pytest.fixture(scope="module")
def tiny_yolo():
    model = YoloV8(variant="n", num_classes=8)
    params = init_params(model, jax.random.PRNGKey(0), img=64)
    return model, params


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(3)
    # pseudo-natural: smooth blobs so random YOLO heads fire variously
    import cv2
    out = []
    for i in range(37):                     # deliberately not chunk-aligned
        base = rng.uniform(0, 255, (6, 8, 3)).astype(np.float32)
        out.append(cv2.resize(base, (96, 72),
                              interpolation=cv2.INTER_CUBIC
                              ).clip(0, 255).astype(np.uint8))
    return np.stack(out)                    # BGR by convention here


def test_batched_matches_per_frame(tiny_yolo, frames):
    model, params = tiny_yolo
    per_frame = yolo_detector(model, params, conf=0.0, cow_class_id=2,
                              size=64)
    batched = BatchedYoloDetector(model, params, conf=0.0, cow_class_id=2,
                                  size=64, chunk=16)
    want = [per_frame(f) for f in frames]
    got = batched.detect_batch(frames)
    assert len(got) == len(want) == 37
    for i, (g, w) in enumerate(zip(got, want)):
        if w is None:
            assert g is None, i
            continue
        assert g is not None, i
        np.testing.assert_allclose(g["bbox"], w["bbox"], atol=1e-4,
                                   err_msg=str(i))
        np.testing.assert_allclose(g["confidence"], w["confidence"],
                                   atol=1e-5)
        np.testing.assert_allclose(g["centroid"], w["centroid"], atol=1e-4)
    # >=10x fewer dispatches: 37 frames -> 3 chunks
    assert batched.dispatches == 3


def test_batched_per_frame_call_compat(tiny_yolo, frames):
    model, params = tiny_yolo
    det = BatchedYoloDetector(model, params, conf=0.0, cow_class_id=2,
                              size=64, chunk=4)
    one = det(frames[0])
    ref = yolo_detector(model, params, conf=0.0, cow_class_id=2,
                        size=64)(frames[0])
    assert (one is None) == (ref is None)
    if one is not None:
        np.testing.assert_allclose(one["bbox"], ref["bbox"], atol=1e-4)


def test_curator_golden_report_batched_vs_per_frame(tiny_yolo, tmp_path):
    """Full curate_video: identical passes/windows/report with the
    batched detector vs the per-frame one (golden equivalence), and the
    curation stage timers record the chunked dispatches."""
    import cv2
    from lameness_tpu.core.config import Config  # noqa: F401
    from lameness_tpu.video.decode import write_video

    model, params = tiny_yolo
    rng = np.random.default_rng(7)
    # synthetic walking pass: bright blob moving left -> right on a dark
    # background, long enough for a 5 s window at 25 fps
    h, w, n = 72, 96, 140
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        x = int(5 + (w - 25) * i / (n - 1))
        frames[i] = rng.integers(0, 20, (h, w, 3), np.uint8)
        frames[i, 20:50, x:x + 18] = 230
    video = tmp_path / "walk.mp4"
    assert write_video(video, list(frames), 25)

    from lameness_tpu.core.config import DataDirs

    def run(detector, sub):
        dirs = DataDirs(root=str(tmp_path / sub))
        cur = ClipCurator(dirs, detector=detector)
        return cur, cur.curate_video(video, "vid1")

    _, rep_pf = run(yolo_detector(model, params, conf=0.0, cow_class_id=2,
                                  size=64), "pf")
    cur_b, rep_b = run(BatchedYoloDetector(model, params, conf=0.0,
                                           cow_class_id=2, size=64,
                                           chunk=16), "bt")
    for k in ("passes", "selected_window", "backup_window", "status",
              "rejection_reason"):
        assert rep_b[k] == rep_pf[k], k
    # chunked: ceil(140/16) = 9 dispatches, not 140
    assert cur_b.detector.dispatches == 9
    summ = cur_b.timers.summary()
    assert summ.get("curation.detect", {}).get("count") == 9
    assert "curation.track" in summ
