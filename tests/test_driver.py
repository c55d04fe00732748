"""End-to-end: video file -> all schema-exact result JSONs -> fused score.

This is the in-process equivalent of the reference's run_pipeline_example.py
acceptance driver — the whole service DAG without NATS/Postgres/Qdrant.
"""
import json

import numpy as np
import pytest

from lameness_tpu.io import schemas
from lameness_tpu.pipeline.engine import make_test_engine
from lameness_tpu.serve.driver import PipelineDriver
from tests.test_video import _square_detector, _synthetic_walk_video


@pytest.fixture(scope="module")
def engine():
    return make_test_engine()


@pytest.fixture()
def driver(tmp_data_root, engine):
    from lameness_tpu.video.curation import ClipCurator
    cfg = tmp_data_root
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    return PipelineDriver(config=cfg, engine=engine, curator=curator)


def test_full_pipeline_end_to_end(driver, tmp_path):
    vid_path = _synthetic_walk_video(tmp_path / "cow.mp4", n_frames=40,
                                     w=160, h=90, fps=5)
    result = driver.process_video_file(vid_path, video_id="e2e1",
                                       curate=False)
    assert result["video_id"] == "e2e1"
    d = driver.dirs

    # every pipeline result file exists and validates against its schema
    for kind in ("yolo", "sam3", "dinov3", "tleap", "tcn", "transformer",
                 "ml", "tracking", "fusion"):
        f = d.results_for(kind) / f"e2e1_{kind}.json"
        assert f.exists(), kind
        data = json.load(open(f))
        assert schemas.validate(kind, data) == [], kind

    # dinov3 wrote the vector store + quirk-2 top-level embedding
    dino = json.load(open(d.results_for("dinov3") / "e2e1_dinov3.json"))
    assert len(dino["embedding"]) == dino["embedding_dim"]
    assert driver.store.count("cow_embeddings") == 1

    # tleap carries 20 keypoints per pose frame + skeleton contract
    tleap = json.load(open(d.results_for("tleap") / "e2e1_tleap.json"))
    assert len(tleap["pose_sequences"][0]["keypoints"]) == 20
    assert len(tleap["skeleton_definition"]["keypoint_names"]) == 20
    assert tleap["model_type"] == "heuristic"
    assert "lameness_score" in tleap["locomotion_features"]

    # fusion produced a final probability and published analysis.complete
    fusion = result["fusion"]
    assert 0 <= fusion["fusion_result"]["final_probability"] <= 1
    assert driver.bus.messages_on("analysis.complete")

    # fusion saw EVERY predictor (regression: publishing dinov3 before the
    # tleap/tcn/transformer files were written made fusion miss them)
    contribs = fusion["fusion_result"]["pipeline_contributions"]
    for p in ("ml", "tcn", "transformer", "gnn", "graph_transformer"):
        assert p in contribs, p
    assert fusion["fusion_result"]["tleap_features"], "tleap features empty"

    # bus saw the full subject chain
    seen = driver.bus.subjects_seen()
    for subject in ("video.uploaded", "video.preprocessed", "pipeline.yolo",
                    "pipeline.sam3", "pipeline.dinov3", "pipeline.tleap",
                    "pipeline.tcn", "pipeline.transformer", "tracking.complete",
                    "pipeline.ml", "analysis.complete"):
        assert subject in seen, subject


def test_second_video_gets_similar_cases(driver, tmp_path):
    v1 = _synthetic_walk_video(tmp_path / "a.mp4", n_frames=40, w=160, h=90,
                               fps=5)
    driver.process_video_file(v1, video_id="simA", curate=False)
    v2 = _synthetic_walk_video(tmp_path / "b.mp4", n_frames=40, w=160, h=90,
                               fps=5)
    driver.process_video_file(v2, video_id="simB", curate=False)
    dino = json.load(open(
        driver.dirs.results_for("dinov3") / "simB_dinov3.json"))
    assert len(dino["similar_cases"]) == 1
    assert dino["similar_cases"][0]["video_id"] == "simA"
    assert dino["similar_cases"][0]["score"] > 0.8   # same synthetic content

    # re-id matched both videos to the same cow
    t2 = json.load(open(
        driver.dirs.results_for("tracking") / "simB_tracking.json"))
    if t2["reid_results"]:
        assert not t2["reid_results"][0]["is_new"] or \
            t2["reid_results"][0]["cow_id"].startswith("COW-")


def test_preprocess_crops_around_detection(driver, tmp_path):
    vid_path = _synthetic_walk_video(tmp_path / "crop.mp4", n_frames=30,
                                     w=160, h=90, fps=5)
    vid = driver.ingest(vid_path, "cropvid")
    pre = driver.preprocess(vid)
    assert pre is not None
    x1, y1, x2, y2 = pre["crop_box"]
    assert x2 > x1 and y2 > y1
    from lameness_tpu.video.decode import VideoReader
    with VideoReader(pre["processed_path"]) as vr:
        info = vr.info
        assert info["width"] == x2 - x1


def test_curator_upgrades_when_yolo_weights_arrive(tmp_data_root, engine):
    """ADVICE r4: an auto-built curator must move off the motion fallback
    when YOLO weights load AFTER driver construction, and an injected
    curator must never be swapped out from under the caller."""
    cfg = tmp_data_root
    engine.loaded_weights = dict(engine.loaded_weights)
    engine.loaded_weights["yolo"] = False
    drv = PipelineDriver(config=cfg, engine=engine)
    assert not hasattr(drv.curator.detector, "detect_batch")
    engine.loaded_weights["yolo"] = True          # weights arrive late
    try:
        up = drv.curator
        assert hasattr(up.detector, "detect_batch")
        assert drv.curator is up                  # upgrade happens once

        # injected curators are the caller's choice — no silent swap
        from lameness_tpu.video.curation import ClipCurator
        mine = ClipCurator(cfg.dirs, detector=_square_detector)
        drv2 = PipelineDriver(config=cfg, engine=engine, curator=mine)
        assert drv2.curator is mine
        drv2.curator = mine                       # setter keeps injection
        assert drv2.curator is mine
    finally:
        engine.loaded_weights["yolo"] = False


def test_preprocess_reuses_curation_detections(tmp_data_root, engine,
                                               tmp_path):
    """After curation of the same upload, preprocess must reuse the
    per-frame detections curation already computed instead of
    re-running the detector (same median-bbox crop, zero extra calls)."""
    from lameness_tpu.video.curation import ClipCurator

    calls = {"n": 0}

    def counting_detector(frame_bgr):
        calls["n"] += 1
        return _square_detector(frame_bgr)

    cfg = tmp_data_root
    curator = ClipCurator(cfg.dirs, detector=counting_detector)
    drv = PipelineDriver(config=cfg, engine=engine, curator=curator)
    vid_path = _synthetic_walk_video(tmp_path / "memo.mp4", n_frames=30,
                                     w=160, h=90, fps=5)
    vid = drv.ingest(vid_path, "memovid")
    raw = next(iter(cfg.dirs.videos.glob(f"{vid}.*")))
    drv.curator.curate_video(raw, vid)
    n_curation = calls["n"]
    assert n_curation >= 30                 # every frame was detected
    pre = drv.preprocess(vid)
    assert calls["n"] == n_curation, "preprocess re-ran the detector"
    x1, y1, x2, y2 = pre["crop_box"]
    assert x2 > x1 and y2 > y1

    # a DIFFERENT video id must not reuse the memo
    vid2_path = _synthetic_walk_video(tmp_path / "memo2.mp4", n_frames=20,
                                      w=160, h=90, fps=5)
    vid2 = drv.ingest(vid2_path, "memovid2")
    pre2 = drv.preprocess(vid2)
    assert calls["n"] > n_curation          # detector ran for the new one
    assert pre2 is not None
