"""Serving soak: many concurrent uploads + failures + concurrent readers.

The per-feature tests drive 1-2 videos at a time; this soak pushes a
burst of 10 uploads (2 of them corrupt) through the FULL async serving
stack — upload → bus worker pool → preprocess → clip batcher → engine →
result writers → tracking/graph/ml/fusion — while an HTTP poller hammers
the admin API and raters submit comparisons on the same bus.  It asserts
the bookkeeping that only shows up under load: every good video
completes with a full result set, every corrupt one lands at a 'failed'
job row (never wedged at 'processing'), the only bus errors are the two
surfaced decode failures, and the API never served an error during the
burst.

The reference has nothing like this (its only integration test needs a
live docker stack, SURVEY.md §4.2); at-most-once consumers there drop
corrupt uploads silently (§5.3).
"""
import json
import threading
import time

import httpx
import numpy as np
import pytest

from lameness_tpu.pipeline.engine import make_test_engine
from lameness_tpu.serve.app import LamenessApp
from tests.test_video import _square_detector, _synthetic_walk_video

N_GOOD = 8
N_CORRUPT = 2


@pytest.mark.slow
def test_restart_resume_soak_mixed_strand_points(tmp_data_root, tmp_path):
    """Crash-recovery at scale: 6 videos stranded at DIFFERENT stages —
    2 completed, 2 'processing' with the cropped file on disk (crashed
    mid-engine), 2 'processing' with only the raw upload (crashed
    mid-preprocess) — then a FRESH app with the clip batcher resumes
    them all to completion (SURVEY §5.3: the reference's at-most-once
    consumers drop all of these silently)."""
    cfg = tmp_data_root
    engine = make_test_engine()
    app1 = LamenessApp(config=cfg, engine=engine, reactive=True)
    app1.driver.curator.detector = _square_detector
    paths = [_synthetic_walk_video(tmp_path / f"rs{i}.mp4", n_frames=40,
                                   w=160, h=90, fps=5, bob=4.0 if i % 2
                                   else 0.0) for i in range(6)]
    # 0-1: run to completion on app1
    for i in (0, 1):
        app1.submit_video(paths[i], f"rsv{i}")
        assert app1.wait_for_analysis(f"rsv{i}", timeout_s=300) is not None
    # 2-3: crash mid-engine (cropped exists, job re-set to 'processing')
    orig_stages = app1.driver.run_feature_stages
    app1.driver.run_feature_stages = \
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("power cut"))
    for i in (2, 3):
        app1.submit_video(paths[i], f"rsv{i}")
    # 4-5: crash mid-preprocess (only the raw upload exists)
    app1.driver.run_feature_stages = orig_stages
    orig_pre = app1.driver.preprocess
    app1.driver.preprocess = \
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("power cut"))
    for i in (4, 5):
        app1.submit_video(paths[i], f"rsv{i}")
    app1.driver.preprocess = orig_pre
    for i in (2, 3, 4, 5):      # hard crash: failure marks never landed
        job = app1.db.one("SELECT job_id FROM processing_jobs "
                          "WHERE video_id=?", (f"rsv{i}",))
        app1.db.update("processing_jobs", job["job_id"],
                       {"status": "processing"}, pk="job_id")
    app1.close()

    app2 = LamenessApp(config=cfg, engine=engine, reactive=True,
                       async_dispatch=True, bus_workers=2, clip_batch=2,
                       batch_window_s=0.5)
    app2.driver.curator.detector = _square_detector
    try:
        assert app2.resume_inflight_jobs() == 4
        for i in range(6):
            assert app2.wait_for_analysis(
                f"rsv{i}", timeout_s=600) is not None, i
        app2.bus.flush(timeout_s=120)
        for i in range(6):
            job = app2.db.one("SELECT status FROM processing_jobs "
                              "WHERE video_id=?", (f"rsv{i}",))
            assert job["status"] == "completed", (i, dict(job))
        # a second resume pass finds nothing stranded
        assert app2.resume_inflight_jobs() == 0
    finally:
        app2.close()


@pytest.mark.slow
def test_serving_soak_burst_with_failures(tmp_data_root, tmp_path):
    cfg = tmp_data_root
    app = LamenessApp(config=cfg, engine=make_test_engine(), reactive=True,
                      async_dispatch=True, bus_workers=3, clip_batch=4,
                      batch_window_s=1.0, serve_api=True, api_port=0)
    app.driver.curator.detector = _square_detector
    base = f"http://127.0.0.1:{app.server.port}"
    rng = np.random.default_rng(0)

    good, corrupt = [], []
    for i in range(N_GOOD):
        good.append(_synthetic_walk_video(
            tmp_path / f"soak{i}.mp4", n_frames=40, w=160, h=90, fps=5,
            size=40, bob=6.0 if i % 2 else 0.0))
    for i in range(N_CORRUPT):
        p = tmp_path / f"bad{i}.mp4"
        p.write_bytes(rng.bytes(4096))          # not a media file
        corrupt.append(p)

    poll_stats = {"codes": [], "stop": False}

    def poller():
        while not poll_stats["stop"]:
            for url in ("/health", "/api/videos", "/api/pipeline/status"):
                try:
                    poll_stats["codes"].append(
                        httpx.get(base + url, timeout=30).status_code)
                except Exception as e:          # pragma: no cover
                    poll_stats["codes"].append(repr(e))
            time.sleep(0.5)

    def raters():
        # concurrent HITL traffic on the same bus the pipeline runs on
        for k in range(6):
            app.bus.publish_sync(cfg.subjects.hitl_comparison_submitted, {
                "rater_id": f"rater{k % 2}",
                "video_id_1": "soakv0", "video_id_2": "soakv1",
                "winner": 1 + (k % 2),
            })
            time.sleep(0.3)

    pt = threading.Thread(target=poller, daemon=True)
    rt = threading.Thread(target=raters, daemon=True)
    try:
        pt.start()
        # interleave: corrupt uploads land mid-burst
        order = (good[:3] + corrupt[:1] + good[3:6] + corrupt[1:]
                 + good[6:])
        t0 = time.time()
        vids = []
        for i, p in enumerate(order):
            vids.append(app.submit_video(p, f"soakv{i}"))
        submit_s = time.time() - t0
        assert submit_s < 10.0, "submits must not block on the pipeline"
        rt.start()

        good_ids = [v for v, p in zip(vids, order) if p in good]
        bad_ids = [v for v, p in zip(vids, order) if p in corrupt]
        results = {}
        deadline = time.time() + 900
        for v in good_ids:
            results[v] = app.wait_for_analysis(
                v, timeout_s=max(5.0, deadline - time.time()))
        app.bus.flush(timeout_s=120)
    finally:
        poll_stats["stop"] = True
        pt.join(timeout=10)
        rt.join(timeout=10)
        app.close()

    # -- every good video completed with a sane fusion verdict --------------
    missing = [v for v, r in results.items() if r is None]
    assert not missing, f"never completed: {missing}"
    for v, r in results.items():
        assert 0.0 <= r["fusion_result"]["final_probability"] <= 1.0, (v, r)
        for kind in ("yolo", "sam3", "dinov3", "tleap", "tcn",
                     "transformer", "tracking", "fusion"):
            assert (cfg.dirs.results_for(kind) / f"{v}_{kind}.json"
                    ).exists(), (v, kind)

    # -- corrupt uploads surfaced as failed jobs, never wedged ----------------
    for v in bad_ids:
        job = app.db.one(
            "SELECT status, error_message FROM processing_jobs "
            "WHERE video_id=?", (v,))
        assert job is not None, v
        assert job["status"] == "failed", (v, dict(job))
        assert job["error_message"], v
    for v in good_ids:
        job = app.db.one("SELECT status FROM processing_jobs "
                         "WHERE video_id=?", (v,))
        assert job is not None and job["status"] == "completed", (v, job)

    # -- the ONLY bus errors (if any) are the surfaced decode failures -------
    # (a corrupt file cv2 refuses to OPEN raises in _on_uploaded and is
    # re-raised after marking the job failed; one that opens but decodes
    # zero frames fails later at the batcher's on_decode_failure with no
    # handler error — both end at status='failed' above)
    other = [e for e in app.bus.errors
             if cfg.subjects.video_uploaded not in e.get("subject", "")]
    assert other == [], other
    assert len(app.bus.errors) <= N_CORRUPT, app.bus.errors

    # -- the API stayed healthy under the burst ------------------------------
    bad_codes = [c for c in poll_stats["codes"] if c != 200]
    assert not bad_codes, bad_codes[:5]
    assert len(poll_stats["codes"]) > 10      # poller really overlapped

    # -- concurrent rater traffic landed ------------------------------------
    assert "rater0" in app.reliability.rater_stats
    assert "rater1" in app.reliability.rater_stats
