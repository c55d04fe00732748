"""Golden tests on the REAL cow footage checked into the reference
(data/canonical/*.mp4 + the reference pipeline's own quality reports).

Round-1 weakness W4: curation quality-report behavior had only been
exercised on synthetic squares.  The canonical clips are real 5 s
1280x720 left-to-right cow walks (the reference curation's OUTPUT), so
re-curating them must find exactly one left->right pass needing no flip,
and the report must carry the reference's exact schema.
"""
import json
from pathlib import Path

import numpy as np
import pytest

REF_CANONICAL = Path("/root/reference/data/canonical")
REF_REPORTS = Path("/root/reference/data/quality_reports")
VIDEO_ID = "5c3864af-b292-43e7-a319-becb0e98c230"

pytestmark = pytest.mark.skipif(
    not (REF_CANONICAL / f"{VIDEO_ID}_canonical.mp4").exists(),
    reason="reference canonical clips not mounted")


def _keys(d, prefix=""):
    out = set()
    for k, v in d.items():
        out.add(prefix + k)
        if isinstance(v, dict):
            out |= _keys(v, prefix + k + ".")
    return out


@pytest.fixture(scope="module")
def curated(tmp_path_factory):
    from lameness_tpu.core.config import Config
    from lameness_tpu.video.curation import ClipCurator
    root = tmp_path_factory.mktemp("golden")
    cfg = Config.load(data_root=root)
    curator = ClipCurator(cfg.dirs)          # motion-detector fallback
    result = curator.curate_video(
        REF_CANONICAL / f"{VIDEO_ID}_canonical.mp4", VIDEO_ID)
    report = json.load(open(cfg.dirs.quality_reports
                            / f"{VIDEO_ID}_quality.json"))
    return cfg, result, report


@pytest.mark.slow
def test_real_footage_curation_succeeds(curated):
    """This clip's camera PANS to follow the cow, which defeats every
    weight-free classical detector (background subtraction, flow
    outliers, contrast blobs — all tried); the reference handles it with
    pretrained YOLO.  Without weights our curation must still SUCCEED via
    the canonical-duration pass-through fallback instead of stranding
    the video."""
    _, result, report = curated
    assert report["status"] == "success"
    w = report["selected_window"]
    assert w is not None
    assert w["needs_flip"] is False
    # a canonical clip exists on disk afterwards
    cfg = curated[0]
    out = cfg.dirs.canonical / f"{VIDEO_ID}_canonical.mp4"
    assert out.exists() and out.stat().st_size > 100_000


@pytest.mark.slow
def test_real_footage_report_schema_matches_reference(curated):
    _, _, report = curated
    ref = json.load(open(REF_REPORTS / f"{VIDEO_ID}_quality.json"))
    ours, theirs = _keys(report), _keys(ref)
    # every key the reference writes must exist in our report
    # (backup_window/rejection_reason are None here like there)
    missing = theirs - ours
    assert missing == set(), missing


@pytest.mark.slow
def test_real_footage_metric_ranges(curated):
    _, _, report = curated
    m = report["selected_window"]["metrics"]
    for k, v in m.items():
        assert 0.0 <= v <= 1.0, (k, v)
    # real footage has texture: visual quality must be clearly non-zero,
    # matching the reference's 0.85 on the same content family
    assert m["visual_quality_score"] > 0.3
    # full-length single pass -> the selected window covers ~5 s
    w = report["selected_window"]
    assert w["end_time"] - w["start_time"] >= 4.0


@pytest.mark.slow
def test_real_footage_full_pipeline(curated, tmp_path):
    """The entire driver DAG runs on real cow video: decode -> engine ->
    schema-exact result JSONs -> fusion (random weights, so scores are
    not meaningful — structure and numerics-sanity are what's gated)."""
    from lameness_tpu.io import schemas
    from lameness_tpu.pipeline.engine import make_test_engine
    from lameness_tpu.serve.driver import PipelineDriver
    cfg, _, _ = curated
    driver = PipelineDriver(config=cfg, engine=make_test_engine())
    result = driver.process_video_file(
        REF_CANONICAL / f"{VIDEO_ID}_canonical.mp4",
        video_id="golden1", curate=False)
    assert result is not None
    for kind in ("yolo", "sam3", "dinov3", "tleap", "tcn", "transformer",
                 "ml", "tracking", "fusion"):
        f = cfg.dirs.results_for(kind) / f"golden1_{kind}.json"
        assert f.exists(), kind
        assert schemas.validate(kind, json.load(open(f))) == [], kind
    fusion = json.load(open(cfg.dirs.results_for("fusion")
                            / "golden1_fusion.json"))
    p = fusion["fusion_result"]["final_probability"]
    assert 0.0 <= p <= 1.0 and np.isfinite(p)


@pytest.mark.slow
def test_real_footage_stream_matches_single(curated):
    """The 4-stage stream pipeline (pooled decode -> transfer -> dispatch
    -> writer thread) produces the same result files on real footage as
    the single-video path — the serving batcher routes everything through
    process_stream, so this is the production path on real pixels."""
    from lameness_tpu.pipeline.engine import make_test_engine
    from lameness_tpu.serve.driver import PipelineDriver
    cfg, _, _ = curated
    driver = PipelineDriver(config=cfg, engine=make_test_engine())
    src = REF_CANONICAL / f"{VIDEO_ID}_canonical.mp4"
    vid = driver.ingest(src, "golden-stream")
    pre = driver.preprocess(vid)
    res = driver.process_stream([(vid, pre["processed_path"])],
                                decode_workers=2)
    assert len(res) == 1
    tcn_stream = json.load(open(cfg.dirs.results_for("tcn")
                                / f"{vid}_tcn.json"))
    driver.run_feature_stages(vid, Path(pre["processed_path"]))
    tcn_single = json.load(open(cfg.dirs.results_for("tcn")
                                / f"{vid}_tcn.json"))
    assert tcn_stream["severity_score"] == pytest.approx(
        tcn_single["severity_score"], abs=2e-4)


@pytest.mark.slow
def test_real_footage_annotation_render(curated, tmp_path):
    """The annotation renderer produces a playable overlay video from
    the real footage's result JSONs (skeleton, boxes, info bar)."""
    from lameness_tpu.pipeline.engine import make_test_engine
    from lameness_tpu.serve.annotation import AnnotationRenderer
    from lameness_tpu.serve.driver import PipelineDriver
    from lameness_tpu.video.decode import VideoReader
    cfg, _, _ = curated
    driver = PipelineDriver(config=cfg, engine=make_test_engine())
    src = REF_CANONICAL / f"{VIDEO_ID}_canonical.mp4"
    assert driver.process_video_file(src, video_id="golden-ann",
                                     curate=False) is not None
    renderer = AnnotationRenderer(cfg.dirs)
    out = renderer.render("golden-ann", video_path=src)
    assert out is not None and Path(out).exists()
    assert renderer.status["golden-ann"]["status"] == "completed"
    with VideoReader(Path(out)) as vr:
        info = vr.info
    assert info["total_frames"] > 50
    assert info["width"] == 1280 and info["height"] == 720
