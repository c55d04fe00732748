"""LamenessApp: event-driven end-to-end through the bus wiring."""
import json

import numpy as np
import pytest

from lameness_tpu.serve.app import LamenessApp
from lameness_tpu.pipeline.engine import make_test_engine
from tests.test_video import _square_detector, _synthetic_walk_video


@pytest.fixture(scope="module")
def engine():
    return make_test_engine()


@pytest.mark.slow
def test_reactive_chain_end_to_end(tmp_data_root, tmp_path, engine):
    cfg = tmp_data_root
    app = LamenessApp(config=cfg, engine=engine, reactive=True)
    app.driver.curator.detector = _square_detector
    vid_path = _synthetic_walk_video(tmp_path / "app.mp4", n_frames=40,
                                     w=160, h=90, fps=5)
    vid = app.submit_video(vid_path, "appvid")
    # synchronous bus => the whole chain ran inside submit_video
    result = app.wait_for_analysis(vid, timeout_s=5)
    assert result is not None
    assert result["video_id"] == "appvid"
    assert 0 <= result["fusion_result"]["final_probability"] <= 1

    d = cfg.dirs
    for kind in ("yolo", "sam3", "dinov3", "tleap", "tcn", "transformer",
                 "gnn", "graph_transformer", "ml", "tracking", "fusion"):
        assert (d.results_for(kind) / f"appvid_{kind}.json").exists(), kind
    # curation side branch produced a quality report
    assert (d.quality_reports / "appvid_quality.json").exists()
    # SHAP + explanation fired on analysis.complete
    assert (d.results / "shap" / "appvid_shap.json").exists()
    assert (d.results / "explanations" / "appvid_explanation.json").exists()
    # heartbeats recorded
    hb = {r["service_name"] for r in app.db.query(
        "SELECT service_name FROM service_heartbeats")}
    assert "fused-engine" in hb and "fusion-service" in hb
    # lameness record landed in the DB for the identified cow
    cow = result["cow_id"]
    if cow:
        hist = app.db.lameness_history(cow)
        assert len(hist) == 1


@pytest.mark.slow
def test_app_with_api_round_trip(tmp_data_root, tmp_path, engine):
    httpx = pytest.importorskip("httpx")
    cfg = tmp_data_root
    app = LamenessApp(config=cfg, engine=engine, reactive=True,
                      serve_api=True)
    app.driver.curator.detector = _square_detector
    try:
        base = f"http://127.0.0.1:{app.server.port}"
        vid_path = _synthetic_walk_video(tmp_path / "api.mp4", n_frames=40,
                                         w=160, h=90, fps=5)
        data = vid_path.read_bytes()
        r = httpx.post(f"{base}/api/videos/upload?filename=cow.mp4",
                       content=data, timeout=600)
        assert r.status_code == 200
        vid = r.json()["video_id"]
        # analysis available through the API
        r = httpx.get(f"{base}/api/analysis/{vid}/fusion", timeout=120)
        assert r.status_code == 200
        assert "fusion_result" in r.json()
        r = httpx.get(f"{base}/api/analysis/{vid}/tcn", timeout=120)
        assert 0 <= r.json()["severity_score"] <= 1
        # health shows the engine heartbeat
        overview = httpx.get(f"{base}/api/health/overview").json()
        assert "fused-engine" in overview["services"]
    finally:
        app.close()


@pytest.mark.slow
def test_worker_command_boots(tmp_path, monkeypatch, capsys):
    """`python -m lameness_tpu worker` (deploy/terraform tpu_worker shape):
    builds the engine, reports bus mode, reaches the ready loop."""
    import time as _time
    from lameness_tpu import __main__ as cli
    real_sleep = _time.sleep

    def bounded_sleep(s):
        if s >= 3600:                       # the ready loop — exit the CLI
            raise KeyboardInterrupt
        real_sleep(s)

    monkeypatch.setattr(_time, "sleep", bounded_sleep)
    cli.main(["--cpu", "--data", str(tmp_path / "d"), "worker", "--small"])
    out = capsys.readouterr().out
    assert "worker ready" in out
    assert "local bus only" in out          # no --nats-url given
