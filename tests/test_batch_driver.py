"""Batched multi-clip driver path: one engine call, N result sets."""
import json

import numpy as np
import pytest

from lameness_tpu.io import schemas
from lameness_tpu.pipeline.engine import make_test_engine
from lameness_tpu.serve.driver import PipelineDriver
from tests.test_video import _square_detector, _synthetic_walk_video


def test_batch_matches_single(tmp_data_root, tmp_path):
    from lameness_tpu.video.curation import ClipCurator
    cfg = tmp_data_root
    engine = make_test_engine()
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    driver = PipelineDriver(config=cfg, engine=engine, curator=curator)

    jobs = []
    for i in range(3):
        vp = _synthetic_walk_video(tmp_path / f"b{i}.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        vid = driver.ingest(vp, f"batch{i}")
        pre = driver.preprocess(vid)
        jobs.append((vid, pre["processed_path"]))

    results = driver.run_feature_stages_batch(jobs)
    assert len(results) == 3
    for vid, _ in jobs:
        for kind in ("yolo", "sam3", "dinov3", "tleap", "tcn", "transformer"):
            f = cfg.dirs.results_for(kind) / f"{vid}_{kind}.json"
            assert f.exists(), (vid, kind)
            assert schemas.validate(kind, json.load(open(f))) == [], kind

    # single-path on the same video produces the same tcn score
    tcn_batch = json.load(open(
        cfg.dirs.results_for("tcn") / "batch0_tcn.json"))
    driver.run_feature_stages("batch0", jobs[0][1])
    tcn_single = json.load(open(
        cfg.dirs.results_for("tcn") / "batch0_tcn.json"))
    assert tcn_single["severity_score"] == pytest.approx(
        tcn_batch["severity_score"], abs=2e-4)


def test_process_stream_overlapped(tmp_data_root, tmp_path):
    from lameness_tpu.video.curation import ClipCurator
    from lameness_tpu.io import schemas as sch
    cfg = tmp_data_root
    engine = make_test_engine()
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    driver = PipelineDriver(config=cfg, engine=engine, curator=curator)
    jobs = []
    for i in range(4):
        vp = _synthetic_walk_video(tmp_path / f"s{i}.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        vid = driver.ingest(vp, f"stream{i}")
        pre = driver.preprocess(vid)
        jobs.append((vid, pre["processed_path"]))
    results = driver.process_stream(jobs, batch_size=2)
    assert len(results) == 4
    for vid, _ in jobs:
        f = cfg.dirs.results_for("tcn") / f"{vid}_tcn.json"
        assert f.exists()
        assert sch.validate("tcn", json.load(open(f))) == []


def test_selective_decode_matches_full(tmp_data_root, tmp_path):
    """The union-only decode produces the same consumed frames."""
    from lameness_tpu.video.decode import VideoReader
    vp = _synthetic_walk_video(tmp_path / "sel.mp4", n_frames=30,
                               w=160, h=90, fps=5)
    with VideoReader(vp) as vr:
        full, idx = vr.read_sampled(interval=1)
    with VideoReader(vp) as vr:
        sel = vr.read_selected([0, 7, 13, 29])
    for i in (0, 7, 13, 29):
        np.testing.assert_array_equal(sel[i], full[i])
    assert set(sel) == {0, 7, 13, 29}


def test_process_stream_parallel_decode_order(tmp_data_root, tmp_path):
    """decode_workers>1 must preserve job order and produce the same
    per-video results as the serial producer (bounded readahead keeps
    memory flat; cv2 releases the GIL during decode so the pool scales
    on multicore hosts)."""
    from lameness_tpu.video.curation import ClipCurator
    cfg = tmp_data_root
    engine = make_test_engine()
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    driver = PipelineDriver(config=cfg, engine=engine, curator=curator)
    jobs = []
    for i in range(5):
        # distinct bob amplitude per clip => distinct gait signal, so a
        # mispaired batch row would swap per-video scores detectably
        vp = _synthetic_walk_video(tmp_path / f"p{i}.mp4", n_frames=40,
                                   w=160, h=90, fps=5, bob=2.0 * i)
        vid = driver.ingest(vp, f"par{i}")
        pre = driver.preprocess(vid)
        jobs.append((vid, pre["processed_path"]))

    def tcn_scores():
        return {vid: json.load(open(
            cfg.dirs.results_for("tcn") / f"{vid}_tcn.json"
        ))["severity_score"] for vid, _ in jobs}

    res_par = driver.process_stream(jobs, batch_size=2, decode_workers=3)
    assert len(res_par) == len(jobs)
    par = tcn_scores()
    assert len(set(par.values())) > 1, "clips should differ"
    driver.process_stream(jobs, batch_size=2, decode_workers=1)
    ser = tcn_scores()
    for vid in par:
        assert par[vid] == pytest.approx(ser[vid], abs=1e-6), vid


def test_process_stream_write_failure_propagates(tmp_data_root, tmp_path):
    """A result-write failure on the writer thread must surface to the
    caller (not vanish on a daemon thread) and must not wedge the
    producer/consumer/writer pipeline."""
    from lameness_tpu.video.curation import ClipCurator
    cfg = tmp_data_root
    engine = make_test_engine()
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    driver = PipelineDriver(config=cfg, engine=engine, curator=curator)
    vp = _synthetic_walk_video(tmp_path / "wf.mp4", n_frames=40,
                               w=160, h=90, fps=5)
    vid = driver.ingest(vp, "wfvid")
    pre = driver.preprocess(vid)

    def boom(*a, **k):
        raise RuntimeError("disk full")
    driver._write_stage_results_inner = boom

    import threading
    err = []

    def run():
        try:
            driver.process_stream([(vid, pre["processed_path"])])
        except RuntimeError as e:
            err.append(e)
    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "process_stream wedged on a write failure"
    assert err and "disk full" in str(err[0])


def test_process_stream_survives_decode_failure(tmp_data_root, tmp_path):
    """A corrupt/missing clip in the stream must not wedge the consumer:
    the producer's sentinel reaches q.get() and the good jobs complete
    (the serving batcher routes ALL traffic through process_stream)."""
    from lameness_tpu.video.curation import ClipCurator
    cfg = tmp_data_root
    engine = make_test_engine()
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    driver = PipelineDriver(config=cfg, engine=engine, curator=curator)

    vp = _synthetic_walk_video(tmp_path / "ok.mp4", n_frames=40,
                               w=160, h=90, fps=5)
    vid = driver.ingest(vp, "okvid")
    pre = driver.preprocess(vid)
    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"not a video")
    jobs = [("badvid", bad), (vid, pre["processed_path"]),
            ("missing", tmp_path / "nope.mp4")]

    import threading
    results = []
    failures = []
    t = threading.Thread(
        target=lambda: results.extend(driver.process_stream(
            jobs, on_decode_failure=lambda v, e: failures.append(v))))
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "process_stream wedged on a decode failure"
    assert len(results) == 1
    assert (cfg.dirs.results_for("tcn") / f"{vid}_tcn.json").exists()
    # every dropped clip is SURFACED (the serving batcher marks its
    # processing_jobs row failed through this callback) — regardless of
    # whether decode raised (corrupt bytes) or yielded zero frames
    assert sorted(failures) == ["badvid", "missing"]
