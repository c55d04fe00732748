"""Annotation renderer: reindexing, direction, skeleton drawing, render."""
import numpy as np
import pytest

from lameness_tpu.serve.annotation import (AnnotationRenderer,
                                           detect_walking_direction,
                                           draw_skeleton,
                                           reindex_keypoints)
from lameness_tpu.io import schemas
from tests.test_video import _square_detector, _synthetic_walk_video


def test_reindex_by_name_and_synonyms():
    raw = [{"name": "withers", "x": 10, "y": 20, "confidence": 0.9},
           {"name": "left_front_paw", "x": 5, "y": 80, "confidence": 0.8},
           {"name": "Throat", "x": 3, "y": 15, "confidence": 0.7},
           {"id": 3, "x": 30, "y": 22, "confidence": 0.95}]
    kps = reindex_keypoints(raw)
    assert len(kps) == 20
    assert kps[2] == {"x": 10.0, "y": 20.0, "confidence": 0.9}   # withers
    assert kps[17]["x"] == 5.0                # left_front_paw -> hoof slot
    assert kps[1]["x"] == 3.0                 # throat -> neck
    assert kps[3]["x"] == 30.0                # by id


def test_reindex_keeps_higher_confidence():
    raw = [{"id": 0, "x": 1, "y": 1, "confidence": 0.3},
           {"id": 0, "x": 2, "y": 2, "confidence": 0.9}]
    kps = reindex_keypoints(raw)
    assert kps[0]["x"] == 2.0


def test_walking_direction():
    kps = [{"x": 0.0, "y": 0.0, "confidence": 0.0} for _ in range(20)]
    for i in (0, 1, 2):
        kps[i] = {"x": 100.0, "y": 50.0, "confidence": 0.9}   # head right
    for i in (3, 4, 7):
        kps[i] = {"x": 20.0, "y": 50.0, "confidence": 0.9}    # hips left
    assert detect_walking_direction(kps) == "left_to_right"
    for i in (0, 1, 2):
        kps[i]["x"] = 5.0
    assert detect_walking_direction(kps) == "right_to_left"


def test_draw_skeleton_modifies_frame():
    frame = np.zeros((100, 200, 3), np.uint8)
    kps = [{"id": i, "x": 10 + i * 8, "y": 50, "confidence": 0.9}
           for i in range(20)]
    out = draw_skeleton(frame, kps)
    assert out.sum() > 0


def test_render_end_to_end(tmp_data_root, tmp_path):
    cfg = tmp_data_root
    vid_path = _synthetic_walk_video(tmp_path / "r.mp4", n_frames=20,
                                     w=160, h=90, fps=5)
    # fake yolo + tleap results
    schemas.write_result(cfg.dirs.results_for("yolo") / "rv_yolo.json", {
        "detections": [{"frame": 0, "time": 0, "detections": [
            {"frame": 0, "bbox": [10, 20, 70, 80], "confidence": 0.9,
             "class": "cow", "class_id": 19}]}]})
    schemas.write_result(cfg.dirs.results_for("tleap") / "rv_tleap.json", {
        "pose_sequences": [{"frame": 0, "bbox": [10, 20, 70, 80],
                            "keypoints": [
            {"name": "withers", "x": 30, "y": 30, "confidence": 0.9},
            {"name": "throat", "x": 20, "y": 35, "confidence": 0.9}]}]})
    renderer = AnnotationRenderer(cfg.dirs)
    out = renderer.render("rv", video_path=vid_path)
    assert out is not None and out.exists()
    assert renderer.status["rv"]["status"] == "completed"
    from lameness_tpu.video.decode import VideoReader
    with VideoReader(out) as vr:
        assert vr.info["total_frames"] == 20


def test_render_missing_video(tmp_data_root):
    renderer = AnnotationRenderer(tmp_data_root.dirs)
    assert renderer.render("ghost") is None
    assert renderer.status["ghost"]["status"] == "failed"
