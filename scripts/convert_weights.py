#!/usr/bin/env python
"""Convert reference-format weights into this framework's checkpoints.

The reference loads ultralytics ``.pt`` detectors, ``segment-anything``
/ HF SAM ``.pth``, and HF DINOv2 weights (SURVEY §2.8); this CLI runs
the per-model converters (models/yolo.py::convert_ultralytics_state_dict,
models/sam.py::convert_hf_state_dict, models/dino.py::convert_hf_state_dict)
and writes orbax checkpoints that ``pipeline/checkpoint.py::restore_engine``
auto-loads at app startup — so a reference deployment's weight directory
carries over with one command per model.

Usage:
  python scripts/convert_weights.py yolo  path/to/yolov8n.pt  [--out DIR]
  python scripts/convert_weights.py sam   path/to/sam_vit_b.pth
  python scripts/convert_weights.py dino  facebook/dinov2-base  # HF dir/id
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def load_torch_file(path: Path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    # ultralytics checkpoints wrap the model; plain state dicts pass through
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "model" in obj and hasattr(
            obj["model"], "state_dict"):
        obj = obj["model"].float().state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in obj.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=("yolo", "sam", "dino"))
    ap.add_argument("src", help=".pt/.pth file, HF model dir, or HF id")
    ap.add_argument("--out", type=Path, default=Path("data/models"))
    ap.add_argument("--variant", default="n", help="yolo variant")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from lameness_tpu.pipeline.checkpoint import save_params

    if args.kind == "yolo":
        from lameness_tpu.models.yolo import convert_ultralytics_state_dict
        sd = load_torch_file(Path(args.src))
        params = convert_ultralytics_state_dict(sd, variant=args.variant)
    elif args.kind == "sam":
        from lameness_tpu.models.sam import convert_hf_state_dict
        src = Path(args.src)
        if src.is_file():
            sd = load_torch_file(src)
        else:                                  # HF dir or hub id
            from transformers import SamModel
            sd = {k: v.numpy() for k, v in
                  SamModel.from_pretrained(args.src).state_dict().items()}
        params = convert_hf_state_dict(sd)
    else:
        from lameness_tpu.models.dino import convert_hf_state_dict
        src = Path(args.src)
        if src.is_file():
            sd = load_torch_file(src)
        else:
            from transformers import Dinov2Model
            sd = {k: v.numpy() for k, v in
                  Dinov2Model.from_pretrained(args.src).state_dict().items()}
        params = convert_hf_state_dict(sd)

    path = save_params(args.out, args.kind, params)
    print(f"saved {args.kind} checkpoint -> {path}")


if __name__ == "__main__":
    main()
