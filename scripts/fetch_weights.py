#!/usr/bin/env python
"""Fetch + convert the reference deployment's pretrained weights.

The reference falls back to pretrained public checkpoints when no custom
model exists: COCO yolov8n (``yolo-pipeline/app/main.py:27-35``), SAM
ViT-B (``sam3-pipeline/app/main.py:51-72``), HF dinov2-base
(``dinov3-pipeline/app/main.py:30-36``).  This script downloads those
three, runs the torch->flax converters, and writes orbax checkpoints
where ``pipeline/checkpoint.restore_engine`` auto-loads them at app
startup — one command turns a fresh clone into a real detector instead
of a random-init one.

NOTE: requires network egress (and for SAM/DINO the ``huggingface_hub``
cache).  In air-gapped environments (like this build's CI) it degrades
to clear per-model instructions; tests/test_weight_parity.py then skips
its real-checkpoint gates until weights exist.

  python scripts/fetch_weights.py [yolo sam dino] [--out data/models]
"""
from __future__ import annotations

import argparse
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

YOLO_URL = ("https://github.com/ultralytics/assets/releases/download/"
            "v8.1.0/yolov8n.pt")
HF = {"sam": "facebook/sam-vit-base", "dino": "facebook/dinov2-base"}


def _has_egress(host: str) -> bool:
    """Fast DNS preflight — without it, HF retries 5x with backoff
    (~1 min of stalling) in air-gapped environments."""
    import socket
    try:
        socket.getaddrinfo(host, 443)
        return True
    except OSError:
        return False


def fetch_yolo(out: Path) -> bool:
    dst = out / "_downloads" / "yolov8n.pt"
    dst.parent.mkdir(parents=True, exist_ok=True)
    if not dst.exists():
        print(f"downloading {YOLO_URL}")
        try:
            urllib.request.urlretrieve(YOLO_URL, dst)
        except Exception as e:
            print(f"!! download failed ({e}).\n"
                  f"   Manually place yolov8n.pt at {dst} and re-run, or\n"
                  f"   run: python scripts/convert_weights.py yolo "
                  f"yolov8n.pt --out {out}")
            return False
    from scripts.convert_weights import load_torch_file
    from lameness_tpu.models.yolo import convert_ultralytics_state_dict
    from lameness_tpu.pipeline.checkpoint import save_params
    sd = load_torch_file(dst)
    params = convert_ultralytics_state_dict(sd, variant="n")
    save_params(out, "yolo", params)
    print(f"converted yolov8n -> {out}/yolo")
    return True


def fetch_hf(kind: str, out: Path) -> bool:
    repo = HF[kind]
    if not _has_egress("huggingface.co"):
        print(f"!! {kind}: no egress to huggingface.co.\n"
              f"   With a local snapshot: python scripts/convert_weights.py "
              f"{kind} /path/to/{repo.split('/')[-1]} --out {out}")
        return False
    try:
        if kind == "sam":
            from transformers import SamModel
            sd = {k: v.numpy() for k, v in
                  SamModel.from_pretrained(repo).state_dict().items()}
            from lameness_tpu.models.sam import convert_hf_state_dict
        else:
            from transformers import Dinov2Model
            sd = {k: v.numpy() for k, v in
                  Dinov2Model.from_pretrained(repo).state_dict().items()}
            from lameness_tpu.models.dino import convert_hf_state_dict
    except Exception as e:
        print(f"!! {kind}: cannot fetch {repo} ({e}).\n"
              f"   With a local snapshot: python scripts/convert_weights.py "
              f"{kind} /path/to/{repo.split('/')[-1]} --out {out}")
        return False
    from lameness_tpu.pipeline.checkpoint import save_params
    params = convert_hf_state_dict(sd)
    save_params(out, kind, params)
    print(f"converted {repo} -> {out}/{kind}")
    return True


def main():
    ap = argparse.ArgumentParser()
    # no default list here: argparse validates a list default against
    # `choices` as if it were one value and always errors
    ap.add_argument("models", nargs="*", choices=["yolo", "sam", "dino"])
    ap.add_argument("--out", type=Path, default=Path("data/models"))
    args = ap.parse_args()
    models = args.models or ["yolo", "sam", "dino"]
    ok = {}
    for m in models:
        ok[m] = fetch_yolo(args.out) if m == "yolo" else fetch_hf(m, args.out)
    print("\nsummary:", {k: ("ok" if v else "MISSING") for k, v in ok.items()})
    if all(ok.values()):
        print("the engine auto-loads these at startup "
              "(pipeline/checkpoint.restore_engine); verify with:\n"
              "  python -m pytest tests/test_weight_parity.py -q")
    sys.exit(0 if all(ok.values()) else 1)


if __name__ == "__main__":
    main()
