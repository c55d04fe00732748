#!/usr/bin/env python
"""Fine-tune the 20-keypoint cow pose model.

Equivalent of the reference's ``scripts/train_cow_pose_model.py``
(ultralytics YOLOv8-pose wrapper), targeting our flax model and COCO-
keypoints-format data (``<root>/annotations.json`` + ``<root>/images/``).

Usage:
  python scripts/train_pose_model.py DATASET_DIR [--epochs 50]
         [--img-size 640] [--models-dir data/models] [--limit N]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--models-dir", default="data/models")
    args = ap.parse_args()

    from lameness_tpu.pipeline.pose_training import (load_coco_pose_dataset,
                                                     train_pose_model)
    images, boxes, kpts = load_coco_pose_dataset(
        Path(args.dataset), img_size=args.img_size, limit=args.limit)
    print(f"dataset: {len(images)} images, {kpts.shape[1]} keypoints")
    report = train_pose_model(images, boxes, kpts,
                              models_dir=Path(args.models_dir),
                              epochs=args.epochs,
                              batch_size=args.batch_size,
                              img_size=args.img_size, lr=args.lr,
                              num_kpts=kpts.shape[1])
    print(f"{report['status']}: final loss {report['final_loss']:.4f}")
    print(f"checkpoint: {args.models_dir}/pose/")


if __name__ == "__main__":
    main()
