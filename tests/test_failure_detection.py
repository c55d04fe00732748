"""Failure detection: a crashing pipeline stage is recorded, not silent.

The reference's at-most-once NATS consumers drop the video with no trace
when a stage crashes (SURVEY §5.3); here the job record flips to
'failed' with the error, the heartbeat registry carries error_count, and
the bus keeps running.
"""
from pathlib import Path

import pytest

from lameness_tpu.pipeline.engine import make_test_engine
from lameness_tpu.serve.app import LamenessApp
from tests.test_video import _square_detector, _synthetic_walk_video


@pytest.mark.slow
def test_stage_crash_marks_job_failed(tmp_data_root, tmp_path):
    cfg = tmp_data_root
    app = LamenessApp(config=cfg, engine=make_test_engine(), reactive=True)
    app.driver.curator.detector = _square_detector

    def boom(video_id, path):
        raise RuntimeError("injected stage crash")

    app.driver.run_feature_stages = boom
    vid_path = _synthetic_walk_video(tmp_path / "crash.mp4", n_frames=40,
                                     w=160, h=90, fps=5)
    app.submit_video(vid_path, "crashvid")

    # the job record carries the failure
    job = app.db.one("SELECT status, error_message FROM processing_jobs "
                     "WHERE video_id=?", ("crashvid",))
    assert job is not None
    assert job["status"] == "failed"
    assert "injected stage crash" in job["error_message"]

    # heartbeat registry recorded the error for the health surfaces
    hb = app.db.one("SELECT error_count, last_error FROM service_heartbeats "
                    "WHERE service_name=?", ("fused-engine",))
    assert hb is not None and hb["error_count"] >= 1
    assert "injected" in (hb["last_error"] or "")

    # the bus swallowed the re-raise (at-most-once) but logged it
    assert any("injected" in e["error"] for e in app.bus.errors)

    # the app still processes the next video end to end
    app.driver.run_feature_stages = type(app.driver).run_feature_stages.__get__(
        app.driver)
    ok_path = _synthetic_walk_video(tmp_path / "ok.mp4", n_frames=40,
                                    w=160, h=90, fps=5)
    app.submit_video(ok_path, "okvid")
    assert app.wait_for_analysis("okvid", timeout_s=10) is not None
    app.close()


@pytest.mark.slow
def test_resume_inflight_jobs_after_restart(tmp_data_root, tmp_path):
    """A job stranded 'processing' by a crash resumes on the next app."""
    cfg = tmp_data_root
    engine = make_test_engine()
    app1 = LamenessApp(config=cfg, engine=engine, reactive=True)
    app1.driver.curator.detector = _square_detector

    # crash after preprocessing: cropped file exists, job stays 'processing'
    def boom(video_id, path):
        raise RuntimeError("power cut")

    app1.driver.run_feature_stages = boom
    vid_path = _synthetic_walk_video(tmp_path / "res.mp4", n_frames=40,
                                     w=160, h=90, fps=5)
    app1.submit_video(vid_path, "resvid")
    # simulate the crash having happened mid-flight: job back to processing
    job = app1.db.one("SELECT job_id FROM processing_jobs WHERE video_id=?",
                      ("resvid",))
    app1.db.update("processing_jobs", job["job_id"],
                   {"status": "processing"}, pk="job_id")
    app1.close()

    app2 = LamenessApp(config=cfg, engine=engine, reactive=True)
    app2.driver.curator.detector = _square_detector
    n = app2.resume_inflight_jobs()
    assert n == 1
    assert app2.wait_for_analysis("resvid", timeout_s=10) is not None

    # second resume pass finds nothing in flight (job completed by fusion
    # results existing)
    assert app2.resume_inflight_jobs() == 0
    app2.close()
