#!/usr/bin/env python
"""End-to-end demo driver: upload a video, watch every result land.

The in-process equivalent of the reference's
``scripts/run_pipeline_example.py`` (HTTP upload + per-pipeline file
polling): builds the full engine (or the small test engine with
``--small``), submits the clip through the reactive app, and prints each
pipeline's headline numbers.

Usage:
  python scripts/run_pipeline_example.py VIDEO.mp4 [--small] [--data DIR]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video", help="path to a video file")
    ap.add_argument("--small", action="store_true",
                    help="small test-geometry engine (CPU-friendly)")
    ap.add_argument("--data", default="data", help="data root directory")
    ap.add_argument("--video-id", default=None)
    args = ap.parse_args()

    from lameness_tpu.core.config import Config
    from lameness_tpu.serve.app import LamenessApp

    if args.small:
        import jax
        jax.config.update("jax_platforms", "cpu")
        from lameness_tpu.pipeline.engine import make_test_engine
        engine = make_test_engine()
    else:
        from lameness_tpu.pipeline.engine import LamenessEngine
        from lameness_tpu.pipeline.checkpoint import restore_engine
        engine = LamenessEngine()
        cfgtmp = Config.load(data_root=args.data)
        loaded = restore_engine(engine, cfgtmp.dirs.models)
        print(f"checkpoints restored: {loaded}")

    config = Config.load(data_root=args.data)
    app = LamenessApp(config=config, engine=engine, reactive=True)

    t0 = time.time()
    vid = app.submit_video(Path(args.video), args.video_id)
    result = app.wait_for_analysis(vid, timeout_s=600)
    elapsed = time.time() - t0

    print(f"\nvideo_id: {vid}   ({elapsed:.1f}s end-to-end)")
    if result is None:
        print("analysis did not complete — check bus errors:")
        for e in app.bus.errors:
            print(" ", e)
        sys.exit(1)

    d = config.dirs
    print(f"cow_id: {result.get('cow_id')}")
    fr = result["fusion_result"]
    print(f"final probability: {fr['final_probability']:.3f} "
          f"({fr['decision_mode']}, confidence {fr['confidence']:.2f})")
    print(f"recommendation: {fr['recommendation']}")
    print("\nper-pipeline results:")
    for kind in ("yolo", "sam3", "dinov3", "tleap", "tcn", "transformer",
                 "gnn", "graph_transformer", "ml", "tracking"):
        f = d.results_for(kind) / f"{vid}_{kind}.json"
        status = "ok" if f.exists() else "MISSING"
        extra = ""
        if f.exists():
            data = json.load(open(f))
            for key in ("severity_score", "graph_prediction",
                        "neighbor_evidence", "total_tracks"):
                if key in data:
                    extra = f"{key}={data[key]:.3f}" \
                        if isinstance(data[key], float) else \
                        f"{key}={data[key]}"
                    break
        print(f"  {kind:18s} {status:8s} {extra}")
    exp = d.results / "explanations" / f"{vid}_explanation.json"
    if exp.exists():
        print("\nexplanation:\n")
        print(json.load(open(exp))["explanation"])


if __name__ == "__main__":
    main()
