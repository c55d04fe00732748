#!/usr/bin/env python
"""Collect pose-annotation frames from farm videos (headless workflow).

Rebuilds the reference's ``scripts/collect_cow_pose_data.py`` (an OpenCV
GUI annotation helper) as a headless two-step workflow — this image has
no display, and in practice annotation happens in external tools:

1. ``extract``: sample frames from videos under the data root, run the
   detector for a cow crop, and write ``frames/*.jpg`` plus a
   ``manifest.json`` with per-frame bbox + a 20-keypoint template
   (heuristic-pose prefill, so annotators adjust rather than place).
2. ``import``: read back the (hand-corrected) manifest and emit a
   training-ready ``annotations.json`` + ``images/`` dir in the format
   ``pipeline/pose_training.load_coco_pose_dataset`` consumes.

  python scripts/collect_cow_pose_data.py extract --data DIR --out SESS \
      [--per-video 6] [--small]
  python scripts/collect_cow_pose_data.py import SESS --out DATASET
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def extract(args):
    import cv2

    from lameness_tpu.core.config import Config
    from lameness_tpu.models.pose import heuristic_keypoints
    from lameness_tpu.video.curation import motion_detector

    cfg = Config.load(data_root=args.data) if args.data else None
    videos_dir = Path(cfg.dirs.videos if cfg else args.data or "data/videos")
    out = Path(args.out)
    (out / "frames").mkdir(parents=True, exist_ok=True)

    detector = motion_detector()
    manifest = []
    videos = sorted(videos_dir.glob("*.mp4"))[:args.max_videos]
    if not videos:
        print(f"no videos under {videos_dir}")
        return
    for vp in videos:
        cap = cv2.VideoCapture(str(vp))
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        picks = np.linspace(0, max(total - 1, 0), args.per_video, dtype=int)
        for fi in picks:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(fi))
            ok, frame = cap.read()
            if not ok:
                continue
            det = detector(frame)
            if det is None:
                continue
            bbox = [float(v) for v in det["bbox"]]
            name = f"{vp.stem}_{fi:05d}.jpg"
            cv2.imwrite(str(out / "frames" / name), frame)
            manifest.append({
                "image": name, "video": vp.name, "frame": int(fi),
                "width": frame.shape[1], "height": frame.shape[0],
                "bbox_xyxy": bbox,
                # heuristic prefill — annotators correct, not place
                "keypoints": heuristic_keypoints(bbox),
                "reviewed": False,
            })
        cap.release()
    json.dump({"session": out.name, "frames": manifest},
              open(out / "manifest.json", "w"), indent=1)
    print(f"extracted {len(manifest)} frames from {len(videos)} videos "
          f"-> {out}/manifest.json")
    print("annotate by editing keypoint x/y/confidence and setting "
          "reviewed=true, then run the import step")


def import_session(args):
    sess = Path(args.session)
    doc = json.load(open(sess / "manifest.json"))
    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    entries, anns = [], []
    for rec in doc["frames"]:
        if args.reviewed_only and not rec.get("reviewed"):
            continue
        src = sess / "frames" / rec["image"]
        if not src.exists():
            continue
        img_id = len(entries) + 1
        shutil.copy2(src, out / "images" / rec["image"])
        entries.append({"id": img_id, "file_name": rec["image"],
                        "width": rec["width"], "height": rec["height"]})
        x1, y1, x2, y2 = rec["bbox_xyxy"]
        kpts = []
        for kp in rec["keypoints"]:
            kpts += [kp["x"], kp["y"],
                     2.0 if kp.get("confidence", 0) > 0 else 0.0]
        anns.append({"id": img_id, "image_id": img_id, "category_id": 1,
                     "bbox": [x1, y1, x2 - x1, y2 - y1],
                     "keypoints": kpts, "num_keypoints": 20})
    from lameness_tpu.models.pose import OLD_NAMES
    json.dump({"images": entries, "annotations": anns,
               "categories": [{"id": 1, "name": "cow",
                               "keypoints": OLD_NAMES}]},
              open(out / "annotations.json", "w"))
    print(f"imported {len(entries)} annotated frames -> {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("extract")
    e.add_argument("--data", help="data root (default data/)")
    e.add_argument("--out", required=True)
    e.add_argument("--per-video", dest="per_video", type=int, default=6)
    e.add_argument("--max-videos", dest="max_videos", type=int, default=50)
    i = sub.add_parser("import")
    i.add_argument("session")
    i.add_argument("--out", required=True)
    i.add_argument("--reviewed-only", action="store_true")
    args = ap.parse_args()
    if args.cmd == "extract":
        extract(args)
    else:
        import_session(args)


if __name__ == "__main__":
    main()
