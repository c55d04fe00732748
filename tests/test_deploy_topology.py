"""The compose topology, in-process: the full app serving against BOTH
first-party wire servers (deploy/docker-compose.yml's three services) —
bus subjects bridged to a real NATS socket that an external subscriber
observes, embeddings stored through the Qdrant-REST wire, and a video
processed end-to-end through it all."""
import dataclasses
import json
import threading
import time

import numpy as np
import pytest

from lameness_tpu.core.config import Config
from lameness_tpu.io.bus import NatsBridge
from lameness_tpu.io.nats_wire import NatsClient, NatsServer
from lameness_tpu.io.qdrant_wire import QdrantRestServer, QdrantRestStore
from lameness_tpu.pipeline.engine import make_test_engine
from lameness_tpu.serve.app import LamenessApp
from tests.test_video import _square_detector, _synthetic_walk_video


@pytest.mark.slow
def test_full_topology_end_to_end(tmp_path):
    nats = NatsServer(port=0)
    nats_port = nats.start()
    qdrant = QdrantRestServer()
    qdrant.start()
    app = None
    try:
        cfg = Config.load(data_root=str(tmp_path / "data"))
        cfg = dataclasses.replace(cfg, reid=dataclasses.replace(
            cfg.reid, vector_url=f"http://127.0.0.1:{qdrant.port}"))

        # an EXTERNAL subscriber on the real socket (a separate process
        # in the compose deployment)
        seen = []
        ext = NatsClient(f"nats://127.0.0.1:{nats_port}",
                         name="external").connect()
        ext.subscribe("pipeline.>", lambda msg: seen.append("pipeline.*"))
        ext.subscribe("analysis.complete",
                      lambda msg: seen.append("analysis.complete"))
        ext.flush()

        app = LamenessApp(config=cfg, engine=make_test_engine(),
                          reactive=True)
        app.driver.curator.detector = _square_detector
        # the app's store came from make_store(url) — the wire client
        assert isinstance(app.store, QdrantRestStore)
        subjects = [v for v in vars(cfg.subjects).values()
                    if isinstance(v, str)]
        bridge = NatsBridge(app.bus, f"nats://127.0.0.1:{nats_port}",
                            subjects=subjects)
        assert bridge.start()

        vp = _synthetic_walk_video(tmp_path / "walk.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        vid = app.submit_video(vp)
        result = app.wait_for_analysis(vid, timeout_s=600)
        assert result is not None
        p = result["fusion_result"]["final_probability"]
        assert 0.0 <= p <= 1.0 and np.isfinite(p)

        # embeddings landed on the wire vector server
        assert qdrant.store.count(cfg.reid.collection_embeddings) >= 1

        # the external subscriber saw the pipeline flow over the socket
        deadline = time.time() + 20
        while time.time() < deadline and "analysis.complete" not in seen:
            time.sleep(0.25)
        assert "analysis.complete" in seen, seen
        assert "pipeline.*" in seen, seen
        ext.close()
    finally:
        if app is not None:
            app.close()
        nats.stop()
        qdrant.stop()
