"""The COMPLETE stack in one test: a synthetic video runs through the
real device engine (process_video_file: curation → device stages →
tracking+Re-ID → graph heads → ml → fusion), the admin server serves
the resulting files, and the real SPA executes against it in the ES
interpreter — the analysis page renders numbers that came off the
engine, not from seeded fixtures.

This is the executed version of the reference's end-to-end promise:
upload → analysis.complete → a clinician reads the dashboard.
"""
import json

import pytest

try:
    import httpx
except ImportError:                                   # pragma: no cover
    httpx = None

from lameness_tpu.core.config import Subjects
from lameness_tpu.io.bus import MessageBus
from lameness_tpu.io.db import Database
from lameness_tpu.io.vecstore import VectorStore
from lameness_tpu.serve.api import AdminContext, make_server

pytestmark = pytest.mark.skipif(httpx is None, reason="httpx unavailable")


@pytest.mark.slow
def test_engine_results_render_in_executed_spa(tmp_path):
    from lameness_tpu.core.config import Config
    from lameness_tpu.pipeline.engine import make_test_engine
    from lameness_tpu.serve.driver import PipelineDriver
    from lameness_tpu.video.curation import ClipCurator
    from lameness_tpu.utils.esinterp import _call
    from tests.support_browser import Browser
    from tests.test_video import _square_detector, _synthetic_walk_video

    # 1. the real pipeline writes real result files
    cfg = Config.load(data_root=str(tmp_path / "data"))
    cfg.dirs.ensure()
    engine = make_test_engine()
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    driver = PipelineDriver(config=cfg, engine=engine, curator=curator)
    video = _synthetic_walk_video(tmp_path / "cow.mp4", n_frames=40,
                                  w=160, h=90, fps=5)
    out = driver.process_video_file(video, video_id="fs-e2e",
                                    curate=False)
    fusion = out["fusion"]["fusion_result"]
    want_pct = f"{100 * fusion['final_probability']:.1f}%"

    # 2. the admin server serves those same dirs
    db = Database(tmp_path / "fs.db")
    db.insert("videos", {"id": "fs-e2e", "filename": "cow.mp4",
                         "original_filename": "cow.mp4", "file_size": 1,
                         "status": "completed", "uploaded_at": "2026"})
    bus = MessageBus()
    from lameness_tpu.hitl.reliability import RaterReliabilityService
    rel = RaterReliabilityService(cfg.dirs.rater_reliability, bus=bus,
                                  subjects=Subjects())
    ctx = AdminContext(cfg, db, bus, reliability=rel, store=VectorStore())
    ctx.seed_users(password="testpw")
    srv = make_server(ctx)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"

        # 3. the real SPA executes the analysis drill-down on it
        b = Browser(base)
        b.login("admin", "testpw")
        b.location["hash"] = "#videos"
        mod = b.boot()
        _call(mod["nav"], ["analysis", "fs-e2e"])
        main = b.by_id("main")
        bad = [e for e in main.query_all(".bad")
               if "panel" in str(e.attrs.get("class", ""))]
        assert not bad, bad[0].text[:200] if bad else None
        txt = main.text
        # the gauge shows the ENGINE's fusion probability
        assert want_pct in txt, (want_pct, txt[:400])
        assert "Predictor contributions" in txt
        # every contributing pipeline the fusion recorded is on screen
        for name in fusion.get("pipeline_contributions", {}):
            assert name in txt, name
        # the frame scrubber executes against the run's REAL per-frame
        # data: stepping fires the img load (timer pump) + the
        # /api/analysis/{id}/frames/{n} fetch, and detection overlays
        # render when that frame had one
        rng = b.by_id("scrub-range")
        if rng is not None:
            b.by_id("scrub-f1").click()
            b.flush_timers()                 # deliver any trailing onload
            label = b.by_id("scrub-label")
            assert label is not None and "frame 1/" in label.text
            info = b.by_id("scrub-info")
            ov = b.by_id("scrub-ov")
            assert (ov is not None and ov.children) or (
                info is not None and info.text.strip()), \
                "scrubber must show overlays or a per-frame message"

        # the cow registry page also reflects the Re-ID entry this run
        # created (if tracking matched one)
        tr = json.load(open(cfg.dirs.results_for("tracking")
                            / "fs-e2e_tracking.json"))
        if tr.get("reid_results"):
            _call(mod["nav"], ["cows"])
            assert tr["reid_results"][0]["cow_id"] in b.page_text()
    finally:
        srv.stop()
