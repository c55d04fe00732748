#!/usr/bin/env python
"""Compare pose estimators on a labeled validation set.

Rebuilds the reference's ``scripts/compare_pose_models.py`` (YOLOv8-Pose
vs RTMPose/AP-10K, header :1-8) for this framework's candidates: one or
more trained checkpoints (``pipeline/pose_training.py`` output dirs) and
the anatomical heuristic baseline (``models/pose.heuristic_keypoints``,
the reference's no-weights fallback).  Reports OKS, PCK@0.1 and PCK@0.2
(normalized by box diagonal) per model and per-keypoint mean error for
the winner — the numbers behind the COW_POSE_DATA_GUIDE "good/excellent"
targets.

  python scripts/compare_pose_models.py DATASET_DIR \
      --model data/models --model other/models --img-size 320 [--limit N]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _pose_metrics(pred_xy, gt, boxes):
    """pred_xy/gt: (N, K, 2)/(N, K, 3) pixel coords; boxes (N, 4) xyxy."""
    vis = gt[:, :, 2] > 0
    d = np.linalg.norm(pred_xy - gt[:, :, :2], axis=-1)        # (N, K)
    diag = np.linalg.norm(boxes[:, 2:] - boxes[:, :2], axis=-1)  # (N,)
    dn = d / np.maximum(diag[:, None], 1e-6)
    # OKS with uniform per-keypoint sigma 0.05 (area = box area)
    area = np.prod(np.maximum(boxes[:, 2:] - boxes[:, :2], 1), axis=-1)
    oks_e = np.exp(-d ** 2 / (2 * area[:, None] * (2 * 0.05) ** 2))
    n = np.maximum(vis.sum(), 1)
    return {
        "oks": float((oks_e * vis).sum() / n),
        "pck@0.1": float(((dn < 0.1) & vis).sum() / n),
        "pck@0.2": float(((dn < 0.2) & vis).sum() / n),
        "mean_err_px": float((d * vis).sum() / n),
        "per_kpt_err": (d * vis).sum(0) / np.maximum(vis.sum(0), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--model", action="append", default=[],
                    help="models dir containing pose/ checkpoint "
                         "(repeatable); heuristic baseline always runs")
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--limit", type=int, default=64)
    args = ap.parse_args()

    import jax
    from lameness_tpu.models import pose as pose_mod
    from lameness_tpu.models.yolo import YoloV8, detect, init_params
    from lameness_tpu.pipeline.checkpoint import load_params
    from lameness_tpu.pipeline.pose_training import load_coco_pose_dataset

    images, boxes, kpts = load_coco_pose_dataset(
        Path(args.dataset), img_size=args.img_size, limit=args.limit)
    print(f"val set: {len(images)} images @ {args.img_size}²")

    results = {}

    # heuristic baseline (reference tleap:199-265 fallback)
    heur = np.stack([
        np.asarray([[kp["x"], kp["y"]] for kp in
                    pose_mod.heuristic_keypoints(list(b))])
        for b in boxes])
    results["heuristic"] = _pose_metrics(heur, kpts, boxes)

    for mdir in args.model:
        model = YoloV8(variant="n", num_classes=1,
                       num_keypoints=kpts.shape[1])
        template = init_params(model, img=args.img_size)
        params = load_params(Path(mdir), "pose", template)
        if params is None:
            print(f"!! no pose checkpoint under {mdir}, skipping")
            continue
        fwd = jax.jit(lambda p, x: detect(
            model.apply(p, x)["levels"], conf_threshold=0.05, max_det=1))
        preds = []
        x = images.astype(np.float32) / 255.0
        for i in range(0, len(x), 16):
            out = fwd(params, x[i:i + 16])
            preds.append(np.asarray(out["keypoints"][:, 0, :, :2]))
        results[str(mdir)] = _pose_metrics(
            np.concatenate(preds), kpts, boxes)

    name_w = max(len(n) for n in results)
    print(f"\n{'model':<{name_w}}  {'OKS':>6}  {'PCK@.1':>7}  "
          f"{'PCK@.2':>7}  {'err px':>7}")
    best = max(results, key=lambda n: results[n]["oks"])
    for n, m in sorted(results.items(), key=lambda kv: -kv[1]["oks"]):
        mark = " *" if n == best else ""
        print(f"{n:<{name_w}}  {m['oks']:6.3f}  {m['pck@0.1']:7.3f}  "
              f"{m['pck@0.2']:7.3f}  {m['mean_err_px']:7.1f}{mark}")
    print(f"\nper-keypoint mean error (px) for {best}:")
    for i, name in enumerate(pose_mod.OLD_NAMES[:len(
            results[best]["per_kpt_err"])]):
        print(f"  {name:<22} {results[best]['per_kpt_err'][i]:7.1f}")


if __name__ == "__main__":
    main()
