"""Video decode + clip curation (golden clip + synthetic walking video)."""
import json
from pathlib import Path

import cv2
import numpy as np
import pytest

from lameness_tpu.io import schemas
from lameness_tpu.video.curation import (ClipCurator, QualityMetrics,
                                         WalkingPass, TARGET_FPS)
from lameness_tpu.video.decode import VideoReader, sample_interval, write_video


def _synthetic_walk_video(path: Path, n_frames=160, w=320, h=180, fps=25,
                          reverse=False, size=60, bob=0.0, bob_period=8):
    """A bright square 'cow' walking horizontally across the frame.

    ``bob`` adds a vertical sinusoid (px amplitude) — the synthetic
    lameness signal: a head-bobbing, uneven gait that survives
    detection → heuristic pose → locomotion features."""
    frames = []
    for i in range(n_frames):
        f = np.full((h, w, 3), 60, np.uint8)
        frac = i / (n_frames - 1)
        if reverse:
            frac = 1 - frac
        x = int(frac * (w - size))
        y = h // 3 + int(round(bob * np.sin(2 * np.pi * i / bob_period)))
        y = max(0, min(h - size, y))
        f[y:y + size, x:x + size] = 220
        # texture so blur score is non-zero
        f[y:y + size:4, x:x + size] = 160
        frames.append(f)
    write_video(path, frames, fps, reencode=False)
    return path


def _square_detector(frame_bgr):
    """Deterministic detector for the synthetic video."""
    gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
    mask = (gray > 120).astype(np.uint8)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    c = max(contours, key=cv2.contourArea)
    x, y, bw, bh = cv2.boundingRect(c)
    return {"bbox": [float(x), float(y), float(x + bw), float(y + bh)],
            "confidence": 0.9, "centroid": (x + bw / 2, y + bh / 2),
            "area": float(bw * bh)}


def test_video_reader_golden(golden_clip_path):
    with VideoReader(golden_clip_path) as vr:
        info = vr.info
        assert info["fps"] == 25.0
        assert (info["width"], info["height"]) == (1280, 720)
        assert info["total_frames"] == 125
        frames, idx = vr.read_sampled(interval=12)   # ~2 FPS sampling
        assert frames.shape[1:] == (720, 1280, 3)
        assert list(idx[:3]) == [0, 12, 24]


def test_sample_interval_reference_rule():
    assert sample_interval(25, 2) == 12      # yolo/sam3 2 FPS
    assert sample_interval(25, 1) == 25      # dino 1 FPS
    assert sample_interval(25, 5) == 5       # tleap 5 FPS
    assert sample_interval(10, 25) == 1


def test_curation_end_to_end(tmp_data_root, tmp_path):
    cfg = tmp_data_root
    vid_path = _synthetic_walk_video(tmp_path / "raw.mp4")
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    report = curator.curate_video(vid_path, "testvid")
    assert schemas.validate("quality", report) == []
    assert report["status"] == "success"
    assert report["walking_passes_detected"] >= 1
    assert report["passes"][0]["direction"] == "left_to_right"
    sel = report["selected_window"]
    assert sel is not None and not sel["needs_flip"]
    m = sel["metrics"]
    for k in ("framing_score", "steadiness_score", "straightness_score",
              "visual_quality_score", "occlusion_score", "overall_score"):
        assert 0.0 <= m[k] <= 1.0, k
    # constant-speed walk (integer-pixel quantisation caps the score ~0.7)
    assert m["steadiness_score"] > 0.6
    assert m["straightness_score"] > 0.9     # no vertical movement
    # canonical clip exists with the right spec
    canonical = cfg.dirs.canonical / "testvid_canonical.mp4"
    assert canonical.exists()
    with VideoReader(canonical) as vr:
        info = vr.info
        assert info["fps"] == TARGET_FPS
        assert (info["width"], info["height"]) == (1280, 720)
        assert info["total_frames"] == 125


def test_curation_right_to_left_flips(tmp_data_root, tmp_path):
    cfg = tmp_data_root
    vid_path = _synthetic_walk_video(tmp_path / "rev.mp4", reverse=True)
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    report = curator.curate_video(vid_path, "revvid")
    assert report["status"] == "success"
    assert report["passes"][0]["direction"] == "right_to_left"
    assert report["selected_window"]["needs_flip"] is True


def test_curation_rejects_no_detection(tmp_data_root, tmp_path):
    """A LONG video with zero detections is rejected (too long for the
    canonical-duration pass-through fallback)."""
    cfg = tmp_data_root
    frames = [np.zeros((90, 160, 3), np.uint8) for _ in range(300)]
    path = tmp_path / "empty.mp4"
    write_video(path, frames, 25, reencode=False)
    curator = ClipCurator(cfg.dirs, detector=lambda f: None)
    report = curator.curate_video(path, "emptyvid")
    assert report["status"] == "rejected"
    assert report["walking_passes_detected"] == 0


def test_curation_passthrough_for_canonical_duration(tmp_data_root, tmp_path):
    """A ~5 s clip the detector can't segment (panning camera, no
    weights) passes through whole instead of stranding the video."""
    cfg = tmp_data_root
    frames = [np.full((90, 160, 3), 90, np.uint8) for _ in range(80)]
    path = tmp_path / "canonlike.mp4"
    write_video(path, frames, 25, reencode=False)      # 3.2 s
    curator = ClipCurator(cfg.dirs, detector=lambda f: None)
    report = curator.curate_video(path, "passthru")
    assert report["status"] == "success"
    assert report["walking_passes_detected"] == 0
    w = report["selected_window"]
    assert w["start_frame"] == 0 and w["needs_flip"] is False
    assert (cfg.dirs.canonical / "passthru_canonical.mp4").exists()


def test_quality_report_matches_golden_schema(tmp_data_root, tmp_path):
    """Our quality report carries the exact key structure of the checked-in
    reference report."""
    golden = json.load(open(
        "/root/reference/data/quality_reports/"
        "5c3864af-b292-43e7-a319-becb0e98c230_quality.json"))
    cfg = tmp_data_root
    vid_path = _synthetic_walk_video(tmp_path / "g.mp4")
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    ours = curator.curate_video(vid_path, "gvid")
    assert set(golden.keys()) == set(ours.keys())
    assert set(golden["source_video"].keys()) == set(ours["source_video"].keys())
    assert set(golden["canonical_clip"].keys()) == set(ours["canonical_clip"].keys())
    assert set(golden["passes"][0].keys()) == set(ours["passes"][0].keys())
    assert set(golden["selected_window"].keys()) == \
        set(ours["selected_window"].keys())
    assert set(golden["selected_window"]["metrics"].keys()) == \
        set(ours["selected_window"]["metrics"].keys())


def test_second_golden_clip_decodes():
    import pathlib
    p = pathlib.Path("/root/reference/data/canonical/"
                     "7e41cf93-185b-459b-8d53-e3c9aba9a97e_canonical.mp4")
    if not p.exists():
        pytest.skip("second golden clip unavailable")
    with VideoReader(p) as vr:
        info = vr.info
        assert (info["width"], info["height"]) == (1280, 720)
        assert info["fps"] == 25.0
        sel = vr.read_selected([0, 60, 124])
    assert set(sel) == {0, 60, 124}
    assert sel[0].shape == (720, 1280, 3)
