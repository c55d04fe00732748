"""bench.py's round-5 measurement sections run on CPU: the full-chain
capture (upload→analysis.complete through the driver) and the curation
comparison — the code paths the driver's end-of-round artifact relies
on (VERDICT r4 items 1/6)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.mark.slow
def test_measure_full_chain_on_tiny_engine(tmp_path, monkeypatch):
    import bench
    from lameness_tpu.pipeline.engine import make_test_engine
    from tests.test_video import _synthetic_walk_video

    vid = _synthetic_walk_video(tmp_path / "fc.mp4", n_frames=40,
                                w=160, h=90, fps=5)
    engine = make_test_engine()
    fc = bench._measure_full_chain(engine, n_clips=1, video=vid)
    assert fc is not None
    assert fc["clips"] == 1
    assert fc["clips_per_min"] > 0
    # the decomposition carries every chain stage the artifact promises
    for stage in ("curation", "preprocess", "engine", "graph_heads",
                  "ml", "fusion", "tracking"):
        assert stage in fc["stage_p50_s"], fc["stage_p50_s"]
    assert "gnn" in fc["stages"] or "graph" in fc["stages"]


def test_measure_curation_small():
    import bench
    cur = bench._measure_curation(None, small=True)
    assert cur["dispatches"]["batched"] < cur["dispatches"]["per_frame"]
    a, b = cur["presence_agreement"].split("/")
    assert a == b                      # batched == per-frame selections
