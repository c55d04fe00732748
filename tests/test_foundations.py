"""Foundations: config tree, schema builders, message bus, mesh."""
import json

import numpy as np
import pytest

from lameness_tpu.core.config import Config, DEFAULT_CONFIG
from lameness_tpu.io import schemas
from lameness_tpu.io.bus import MessageBus


def test_config_defaults_match_reference_constants():
    c = DEFAULT_CONFIG
    # curation (clip-curation:74-78, 379-386)
    assert c.curation.clip_frames == 125
    assert abs(c.curation.w_framing + c.curation.w_steadiness
               + c.curation.w_straightness + c.curation.w_visual
               + c.curation.w_occlusion + c.curation.w_progress - 1.0) < 1e-9
    # fusion weights (fusion:102-109)
    assert abs(sum(c.fusion.weights().values()) - 1.0) < 1e-9
    # bytetrack thresholds (bytetrack.py:44-50)
    assert c.tracking.high_conf_threshold == 0.6
    assert c.tracking.low_conf_threshold == 0.1
    # reid thresholds (matcher.py:52-54)
    assert (c.reid.strong_match_threshold, c.reid.match_threshold,
            c.reid.weak_match_threshold) == (0.85, 0.75, 0.65)
    # subjects registry covers all 25 reference subjects (config.yaml:5-30)
    # plus exactly one documented extension: explanation.requested keeps
    # regenerate requests off analysis.complete (see Subjects comment)
    subs = c.subjects.as_dict()
    assert len(subs) == 26
    assert subs.pop("explanation_requested") == "explanation.requested"
    assert len(subs) == 25
    assert c.subjects.pipeline_graph_transformer == "pipeline.graph_transformer"


def test_config_yaml_overlay(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("models:\n  yolo:\n    confidence_threshold: 0.25\n")
    c = Config.load(str(p))
    assert c.yolo.confidence_threshold == 0.25


def test_yolo_schema_roundtrip(tmp_path):
    boxes = np.array([[10.0, 20.0, 110.0, 220.0], [15.0, 25.0, 115.0, 225.0]])
    confs = np.array([0.9, 0.8])
    feats = schemas.yolo_features(boxes, confs, 2, 125)
    dets = [schemas.yolo_frame_entry(0, 25.0, [
        schemas.yolo_detection_entry(0, boxes[0], 0.9, "cow", 19)])]
    result = schemas.yolo_result(dets, feats, 125, 25)
    assert schemas.validate("yolo", result) == []
    msg = schemas.yolo_message("vid1", "/x.json", result)
    assert msg["pipeline"] == "yolo" and msg["num_detections"] == 1
    # json round trip
    assert json.loads(json.dumps(result)) == result
    # feature numerics
    assert feats["avg_box_width"] == 100.0
    assert feats["position_stability"] == pytest.approx(
        1.0 / (1.0 + np.std([60.0, 65.0]) + np.std([120.0, 125.0])))


def test_sam3_schema_has_both_key_spellings():
    ff = [schemas.sam3_frame_features(1000, 0.1, 0.5, 2.0, 50, 60, 120, 0, 25.0)]
    agg = schemas.sam3_aggregated(ff)
    segs = [schemas.sam3_segmentation_entry(0, 25.0, True, ff[0])]
    result = schemas.sam3_result(segs, agg, 125, 25)
    assert schemas.validate("sam3", result) == []
    # Quirk-1 fix: both spellings present and equal
    assert result["features"] == result["aggregated_features"]
    assert result["aggregated_features"]["avg_circularity"] == 0.5


def test_dinov3_schema_has_toplevel_embedding():
    emb = np.arange(8, dtype=np.float32)
    entries = [schemas.dinov3_embedding_entry(0, 25.0, emb)]
    result = schemas.dinov3_result("vid", emb, 1, [], 0.5, entries)
    assert schemas.validate("dinov3", result) == []
    assert result["embedding"] == [float(v) for v in emb]   # Quirk-2 fix
    assert result["embedding_dim"] == 8


def test_all_required_key_registries_build():
    # every registry kind has a builder exercised elsewhere; sanity on names
    assert set(schemas.REQUIRED_KEYS) == {
        "yolo", "sam3", "dinov3", "tleap", "tcn", "transformer", "gnn",
        "graph_transformer", "ml", "tracking", "fusion", "quality"}


def test_bus_publish_subscribe_and_error_isolation(tmp_path):
    bus = MessageBus(journal_path=tmp_path / "journal.jsonl")
    got = []
    bus.subscribe_sync("pipeline.yolo", lambda m: got.append(m))
    bus.subscribe_sync("pipeline.yolo", lambda m: 1 / 0)  # bad handler
    bus.publish_sync("pipeline.yolo", {"video_id": "v1"})
    assert got == [{"video_id": "v1"}]
    assert len(bus.errors) == 1
    assert bus.messages_on("pipeline.yolo") == [{"video_id": "v1"}]
    lines = (tmp_path / "journal.jsonl").read_text().strip().split("\n")
    assert json.loads(lines[0])["subject"] == "pipeline.yolo"


def test_bus_async_interface():
    import asyncio
    bus = MessageBus()
    got = []

    async def handler(m):
        got.append(m["x"])

    async def main():
        await bus.connect()
        await bus.subscribe("analysis.complete", handler)
        await bus.publish("analysis.complete", {"x": 42})

    asyncio.run(main())
    assert got == [42]


def test_mesh_and_sharding():
    import jax
    import jax.numpy as jnp
    from lameness_tpu.parallel import mesh as pm
    m = pm.make_mesh(8)
    assert m.shape == {"data": 8, "model": 1}
    x = jnp.arange(16.0).reshape(16, 1)
    xs = pm.shard_batch(m, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data")
    # padding helper
    padded, b = pm.pad_batch_to_multiple(np.ones((5, 3)), 4)
    assert padded.shape == (8, 3) and b == 5


def test_mesh_2d_model_axis():
    from lameness_tpu.parallel import mesh as pm
    m = pm.make_mesh(8, model_parallel=2)
    assert m.shape == {"data": 4, "model": 2}


def test_structural_smoke(tmp_data_root):
    """The reference's test_setup.py equivalent: required directories exist
    and the config tree is constructible + YAML-overlayable."""
    cfg = tmp_data_root
    for p in (cfg.dirs.videos, cfg.dirs.processed, cfg.dirs.canonical,
              cfg.dirs.results, cfg.dirs.quality_reports, cfg.dirs.training,
              cfg.dirs.rater_reliability, cfg.dirs.models):
        assert p.exists(), p
    assert cfg.subjects.video_uploaded == "video.uploaded"
    # package layout sanity (SURVEY §7 proposed tree)
    import lameness_tpu
    import pathlib
    root = pathlib.Path(lameness_tpu.__file__).parent
    for sub in ("core", "ops", "models", "parallel", "video", "track",
                "graph", "ml", "fuse", "hitl", "xai", "io", "serve",
                "pipeline", "utils"):
        assert (root / sub / "__init__.py").exists(), sub
