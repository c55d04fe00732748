#!/usr/bin/env python
"""Bulk dataset loader: labeled train split + unlabeled test videos.

Equivalent of the reference's ``scripts/bulk_upload.py`` (25 lame /
25 sound labeled + 329 unlabeled UBC test videos): walks a directory
layout ``<root>/{lame,sound,test}/*.mp4``, submits every video through the
app, records labels, and optionally kicks off ensemble + head training
when enough labeled data has landed.

Usage:
  python scripts/bulk_upload.py DATASET_DIR [--small] [--data DIR]
         [--train-after]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="dir with lame/ sound/ test/ subdirs")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--data", default="data")
    ap.add_argument("--train-after", action="store_true",
                    help="train GBDT ensemble + DL heads after upload")
    ap.add_argument("--limit", type=int, default=None,
                    help="max videos per split")
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
        engine = LamenessEngine()

    config = Config.load(data_root=args.data)
    app = LamenessApp(config=config, engine=engine, reactive=True)
    root = Path(args.dataset)

    counts = {}
    t0 = time.time()
    for split, label in (("lame", 1), ("sound", 0), ("test", None)):
        d = root / split
        if not d.exists():
            continue
        videos = sorted(p for p in d.iterdir()
                        if p.suffix.lower() in (".mp4", ".avi", ".mov"))
        if args.limit:
            videos = videos[:args.limit]
        counts[split] = len(videos)
        for i, v in enumerate(videos):
            vid = app.submit_video(v)
            if label is not None:
                app.training.add_label(vid, label)
            print(f"[{split} {i + 1}/{len(videos)}] {v.name} -> {vid}",
                  flush=True)
    elapsed = time.time() - t0
    total = sum(counts.values())
    print(f"\nuploaded {total} videos in {elapsed:.1f}s "
          f"({total / max(elapsed, 1e-9) * 60:.1f} videos/min): {counts}")

    if args.train_after:
        print("\ntraining tabular ensemble...")
        status = app.training.run_training()
        print(f"  {status['status']}: "
              f"{status.get('report', status.get('error'))}")
        print("training sequence heads...")
        from lameness_tpu.pipeline.head_training import train_heads
        report = train_heads(config.dirs, config.dirs.models)
        print(f"  {report['status']}: "
              f"acc={report.get('train_accuracy')}")
        print("training graph heads...")
        from lameness_tpu.pipeline.graph_training import train_graph_heads
        report = train_graph_heads(config.dirs, config.dirs.models)
        print(f"  {report['status']}: "
              f"acc={report.get('train_accuracy')}")


if __name__ == "__main__":
    main()
