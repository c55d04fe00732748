#!/usr/bin/env python
"""Fine-tune the cow detector with the TAL trainer and report mAP.

TPU-native counterpart of the reference's ultralytics shell-out
(yolo_cow_id/train.py; ml-service retrain endpoints): loads a
COCO-detection dataset (root/annotations.json + root/images), trains
``YoloV8`` with task-aligned assignment + CIoU/DFL/BCE, tracks EMA
weights, evaluates COCO mAP each epoch on a held-out split, and saves
the best EMA params with orbax.

Usage:
  python scripts/train_detector.py --data DIR [--variant n] [--img 320]
      [--epochs 20] [--batch 8] [--out data/models/detector]
  python scripts/train_detector.py --synthetic   # smoke-run, no dataset
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def load_coco_detection(root: Path, img_size: int, max_boxes: int = 8):
    """COCO-detection loader -> padded trainer arrays."""
    import cv2
    ann = json.load(open(Path(root) / "annotations.json"))
    imgs = {im["id"]: im for im in ann["images"]}
    by_img = {}
    for a in ann["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    cat_ids = sorted({a["category_id"] for a in ann["annotations"]})
    cat_map = {c: i for i, c in enumerate(cat_ids)}
    images, boxes, labels, masks = [], [], [], []
    for img_id, anns in by_img.items():
        meta = imgs[img_id]
        f = Path(root) / "images" / meta["file_name"]
        if not f.exists():
            continue
        im = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
        sy, sx = img_size / im.shape[0], img_size / im.shape[1]
        images.append(cv2.resize(im, (img_size, img_size)))
        b = np.zeros((max_boxes, 4), np.float32)
        l = np.zeros((max_boxes,), np.int64)
        m = np.zeros((max_boxes,), bool)
        for j, a in enumerate(anns[:max_boxes]):
            x, y, w, h = a["bbox"]
            b[j] = [x * sx, y * sy, (x + w) * sx, (y + h) * sy]
            l[j] = cat_map[a["category_id"]]
            m[j] = True
        boxes.append(b); labels.append(l); masks.append(m)
    return (np.stack(images).astype(np.float32) / 255.0,
            np.stack(labels), np.stack(boxes), np.stack(masks),
            len(cat_ids))


def synthetic_dataset(n=16, img_size=160, seed=0):
    """Bright-square 'cows' for smoke runs without a dataset."""
    rng = np.random.default_rng(seed)
    images = np.full((n, img_size, img_size, 3), 0.2, np.float32)
    boxes = np.zeros((n, 2, 4), np.float32)
    labels = np.zeros((n, 2), np.int64)
    masks = np.zeros((n, 2), bool)
    for i in range(n):
        x, y = rng.integers(10, img_size - 70, 2)
        w, h = rng.integers(40, 64, 2)
        images[i, y:y + h, x:x + w] = 0.9
        boxes[i, 0] = [x, y, x + w, y + h]
        masks[i, 0] = True
    return images, labels, boxes, masks, 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=Path)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--variant", default="n")
    ap.add_argument("--img", type=int, default=320)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--val-frac", type=float, default=0.2)
    ap.add_argument("--out", type=Path, default=Path("data/models/detector"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env is "
                         "pinned in some deployments)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lameness_tpu.models.yolo import YoloV8, detect
    from lameness_tpu.pipeline.detect_training import DetectTrainer
    from lameness_tpu.pipeline.evaluation import evaluate_detections
    from lameness_tpu.pipeline.checkpoint import save_params

    if args.synthetic:
        images, labels, boxes, masks, nc = synthetic_dataset(
            img_size=min(args.img, 160))
    else:
        assert args.data, "--data DIR or --synthetic required"
        images, labels, boxes, masks, nc = load_coco_detection(
            args.data, args.img)
    n = len(images)
    n_val = max(1, int(n * args.val_frac))
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    tr, va = perm[n_val:], perm[:n_val]
    print(f"dataset: {len(tr)} train / {len(va)} val, {nc} classes")

    model = YoloV8(variant=args.variant, num_classes=nc)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + images.shape[1:3] + (3,)))["params"]
    trainer = DetectTrainer(model, params, lr=args.lr)

    apply_fn = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def val_map(p):
        out = apply_fn(p, jnp.asarray(images[va]))
        d = detect(out["levels"], conf_threshold=0.05, max_det=16)
        return evaluate_detections(
            np.asarray(d["boxes"]), np.asarray(d["scores"]),
            np.asarray(d["classes"]), np.asarray(d["valid"]),
            boxes[va], labels[va], masks[va], nc)

    best = -1.0
    steps_per_epoch = max(1, len(tr) // args.batch)
    for epoch in range(args.epochs):
        rng.shuffle(tr)
        tot = 0.0
        for s in range(steps_per_epoch):
            idx = tr[s * args.batch:(s + 1) * args.batch]
            if len(idx) < args.batch:      # static shapes: wrap around
                idx = np.concatenate([idx, tr[:args.batch - len(idx)]])
            aux = trainer.train_step(
                jnp.asarray(images[idx]), jnp.asarray(labels[idx]),
                jnp.asarray(boxes[idx]), jnp.asarray(masks[idx]))
            tot += aux["total"]
        m = val_map(trainer.ema_params)
        print(f"epoch {epoch}: loss {tot / steps_per_epoch:.3f} "
              f"mAP50 {m['mAP50']:.3f} mAP50-95 {m['mAP50_95']:.3f}")
        if m["mAP50_95"] > best:
            best = m["mAP50_95"]
            args.out.mkdir(parents=True, exist_ok=True)
            save_params(args.out, "detector_best", trainer.ema_params)
    print(json.dumps({"best_mAP50_95": best}))


if __name__ == "__main__":
    main()
