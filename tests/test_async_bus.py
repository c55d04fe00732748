"""Async bus dispatch: worker pool semantics + end-to-end app chain."""
import threading
import time

import pytest

from lameness_tpu.io.bus import MessageBus
from lameness_tpu.pipeline.engine import make_test_engine
from lameness_tpu.serve.app import LamenessApp
from tests.test_video import _square_detector, _synthetic_walk_video


def test_async_bus_runs_handlers_off_publisher_thread():
    bus = MessageBus(async_dispatch=True, workers=2)
    seen = []

    def handler(msg):
        seen.append((msg["n"], threading.current_thread().name))

    bus.subscribe_sync("t.sub", handler)
    for n in range(5):
        bus.publish_sync("t.sub", {"n": n})
    assert bus.flush(timeout_s=10)
    assert sorted(m[0] for m in seen) == [0, 1, 2, 3, 4]
    assert all(name.startswith("bus-worker") for _, name in seen)
    bus.shutdown()


def test_async_bus_flush_waits_for_chained_publishes():
    bus = MessageBus(async_dispatch=True, workers=2)
    done = []

    def first(msg):
        time.sleep(0.05)
        bus.publish_sync("t.second", {})

    def second(msg):
        time.sleep(0.05)
        done.append(1)

    bus.subscribe_sync("t.first", first)
    bus.subscribe_sync("t.second", second)
    bus.publish_sync("t.first", {})
    assert bus.flush(timeout_s=10)
    assert done == [1]
    bus.shutdown()


def test_async_bus_swallows_handler_errors():
    bus = MessageBus(async_dispatch=True, workers=1)
    bus.subscribe_sync("t.err", lambda m: 1 / 0)
    bus.publish_sync("t.err", {"x": 1})
    assert bus.flush(timeout_s=10)
    assert len(bus.errors) == 1
    assert "ZeroDivisionError" in bus.errors[0]["error"]
    bus.shutdown()


def test_sync_bus_flush_is_noop():
    bus = MessageBus()
    assert bus.flush() is True
    bus.shutdown()


@pytest.mark.slow
def test_async_app_processes_concurrent_uploads(tmp_data_root, tmp_path):
    """Two videos submitted back-to-back both complete under the worker
    pool; the publisher thread never blocks on the pipeline."""
    cfg = tmp_data_root
    app = LamenessApp(config=cfg, engine=make_test_engine(), reactive=True,
                      async_dispatch=True, bus_workers=3)
    app.driver.curator.detector = _square_detector
    try:
        v1 = _synthetic_walk_video(tmp_path / "a1.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        v2 = _synthetic_walk_video(tmp_path / "a2.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        t0 = time.time()
        app.submit_video(v1, "asy1")
        app.submit_video(v2, "asy2")
        submit_s = time.time() - t0
        assert submit_s < 5.0, "submit should not block on the pipeline"
        r1 = app.wait_for_analysis("asy1", timeout_s=240)
        r2 = app.wait_for_analysis("asy2", timeout_s=240)
        assert r1 is not None and r2 is not None
        assert 0 <= r1["fusion_result"]["final_probability"] <= 1
        assert 0 <= r2["fusion_result"]["final_probability"] <= 1
        d = cfg.dirs
        for vid in ("asy1", "asy2"):
            for kind in ("yolo", "tracking", "fusion"):
                assert (d.results_for(kind) / f"{vid}_{kind}.json").exists()
        # no handler raced or crashed under concurrent dispatch
        app.bus.flush(timeout_s=60)
        assert app.bus.errors == [], app.bus.errors
    finally:
        app.close()


@pytest.mark.slow
def test_clip_batcher_groups_queued_videos(tmp_data_root, tmp_path):
    """Two uploads inside the window run as ONE engine batch call."""
    cfg = tmp_data_root
    app = LamenessApp(config=cfg, engine=make_test_engine(), reactive=True,
                      async_dispatch=True, bus_workers=3, clip_batch=2,
                      batch_window_s=3.0)
    app.driver.curator.detector = _square_detector
    calls = {"batch": 0, "jobs": [], "single": 0}
    orig_stream = app.driver.process_stream
    orig_single = app.driver.run_feature_stages

    def count_stream(jobs, **kw):
        calls["batch"] += 1
        calls["jobs"].append(len(jobs))
        return orig_stream(jobs, **kw)

    def count_single(vid, path):
        calls["single"] += 1
        return orig_single(vid, path)

    app.driver.process_stream = count_stream
    app.driver.run_feature_stages = count_single
    try:
        v1 = _synthetic_walk_video(tmp_path / "b1.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        v2 = _synthetic_walk_video(tmp_path / "b2.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        app.submit_video(v1, "bat1")
        app.submit_video(v2, "bat2")
        r1 = app.wait_for_analysis("bat1", timeout_s=300)
        r2 = app.wait_for_analysis("bat2", timeout_s=300)
        assert r1 is not None and r2 is not None
        assert calls["batch"] == 1 and calls["single"] == 0
        assert calls["jobs"] == [2]      # one stream call with both clips
        assert app.bus.errors == []
    finally:
        app.close()


@pytest.mark.slow
def test_batcher_pads_partial_batches_to_one_signature(tmp_data_root,
                                                       tmp_path):
    """3 clips with max_batch=2 -> engine sees batch sizes {2} only."""
    import numpy as np
    cfg = tmp_data_root
    engine = make_test_engine()
    seen_sizes = set()
    orig = engine.process_clip_batch

    def spy(frames, **kw):
        # frames may be a device array, a packed numpy array, or the
        # split-ingest dict — the batch axis is leaf dim 0 either way
        leaf = next(iter(frames.values())) if isinstance(frames, dict) \
            else frames
        seen_sizes.add(int(leaf.shape[0]))
        return orig(frames, **kw)

    engine.process_clip_batch = spy
    app = LamenessApp(config=cfg, engine=engine, reactive=True,
                      async_dispatch=True, bus_workers=2, clip_batch=2,
                      batch_window_s=3.0)
    app.driver.curator.detector = _square_detector
    try:
        for i in range(3):
            v = _synthetic_walk_video(tmp_path / f"p{i}.mp4", n_frames=40,
                                      w=160, h=90, fps=5)
            app.submit_video(v, f"pad{i}")
        for i in range(3):
            assert app.wait_for_analysis(f"pad{i}", timeout_s=300), i
        # every engine call — including a lone straggler — is padded to
        # the single warmed max_batch signature; any other size would be
        # a fresh XLA compile on the remote backend
        assert seen_sizes == {2}, seen_sizes
        assert app.bus.errors == []
    finally:
        app.close()
