"""Fused on-device crop / resize / normalize.

Replaces the reference's per-frame host OpenCV work (decode→BGR→RGB→PIL→
processor resize in ``dinov3-pipeline/app/main.py:95-115``; moviepy crop in
``video-preprocessing/app/main.py:113-127``) with a single fused device op:
uint8 frames land in HBM once, and every model view (YOLO letterbox, SAM
1024² pad, DINO 224² crop) is produced on-device via
``jax.image.scale_and_translate`` — which supports *traced* scale/translation,
so dynamic crop boxes don't force recompilation.

All functions are shape-static in the output and jit/vmap friendly.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# ImageNet statistics used by both the HF DINOv2 processor and SAM.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _to_float(frame: jnp.ndarray) -> jnp.ndarray:
    if frame.dtype == jnp.uint8:
        return frame.astype(jnp.float32) / 255.0
    return frame.astype(jnp.float32)


def crop_resize(
    frame: jnp.ndarray,          # (H, W, C)
    box_xyxy: jnp.ndarray,       # (4,) float, dynamic
    out_hw: Tuple[int, int],
    method: str = "linear",
) -> jnp.ndarray:
    """Crop `box_xyxy` out of `frame` and resize to `out_hw` in one op."""
    frame = _to_float(frame)
    out_h, out_w = out_hw
    x1, y1, x2, y2 = box_xyxy[0], box_xyxy[1], box_xyxy[2], box_xyxy[3]
    bw = jnp.maximum(x2 - x1, 1e-3)
    bh = jnp.maximum(y2 - y1, 1e-3)
    scale = jnp.stack([out_h / bh, out_w / bw])
    translation = jnp.stack([-y1 * out_h / bh, -x1 * out_w / bw])
    return jax.image.scale_and_translate(
        frame, (out_h, out_w, frame.shape[-1]), (0, 1),
        scale.astype(frame.dtype), translation.astype(frame.dtype),
        method=method)


def normalize(
    frame: jnp.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jnp.ndarray:
    mean_a = jnp.asarray(mean, dtype=frame.dtype)
    std_a = jnp.asarray(std, dtype=frame.dtype)
    return (frame - mean_a) / std_a


def crop_resize_normalize(
    frame: jnp.ndarray,
    box_xyxy: jnp.ndarray,
    out_hw: Tuple[int, int],
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """The fused stage: crop → bilinear resize → normalize → cast."""
    out = crop_resize(frame, box_xyxy, out_hw)
    return normalize(out, mean, std).astype(dtype)


@partial(jax.jit, static_argnames=("out_size",))
def letterbox(
    frame: jnp.ndarray,          # (H, W, C)
    out_size: int = 640,
    pad_value: float = 114.0 / 255.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Aspect-preserving resize + pad to a square `out_size` canvas
    (the YOLO input convention).  H/W are static per call site.

    Returns (image (S,S,C) float, ratio scalar, pad (2,) = (pad_x, pad_y))
    so detections can be mapped back to source pixels.
    """
    frame = _to_float(frame)
    h, w = frame.shape[0], frame.shape[1]
    r = min(out_size / h, out_size / w)
    new_h, new_w = int(round(h * r)), int(round(w * r))
    resized = jax.image.resize(frame, (new_h, new_w, frame.shape[-1]), "linear")
    pad_y = (out_size - new_h) // 2
    pad_x = (out_size - new_w) // 2
    canvas = jnp.full((out_size, out_size, frame.shape[-1]), pad_value,
                      dtype=frame.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (pad_y, pad_x, 0))
    return canvas, jnp.asarray(r, jnp.float32), jnp.asarray(
        [pad_x, pad_y], jnp.float32)


def unletterbox_boxes(boxes_xyxy: jnp.ndarray, ratio: jnp.ndarray,
                      pad_xy: jnp.ndarray) -> jnp.ndarray:
    """Map boxes from letterboxed canvas coords back to source pixels."""
    shift = jnp.concatenate([pad_xy, pad_xy])
    return (boxes_xyxy - shift) / ratio


def pad_to_rect(frame: jnp.ndarray, out_hw: Tuple[int, int], long_side: int,
                pad_value: float = 0.0) -> Tuple[jnp.ndarray, float]:
    """Scale the longest side to ``long_side`` and pad bottom/right into an
    (out_h, out_w) canvas (segment-anything convention, generalized to
    rectangular canvases for the sam_rect serving mode).  Returns
    (canvas, ratio)."""
    frame = _to_float(frame)
    h, w = frame.shape[0], frame.shape[1]
    r = long_side / max(h, w)
    new_h, new_w = int(round(h * r)), int(round(w * r))
    resized = jax.image.resize(frame, (new_h, new_w, frame.shape[-1]), "linear")
    canvas = jnp.full((out_hw[0], out_hw[1], frame.shape[-1]), pad_value,
                      dtype=frame.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, 0, 0))
    return canvas, r


def pad_to_square(frame: jnp.ndarray, out_size: int,
                  pad_value: float = 0.0) -> Tuple[jnp.ndarray, float]:
    """SAM-style preprocessing: scale longest side to `out_size`, pad
    bottom/right (segment-anything convention).  Returns (canvas, ratio)."""
    return pad_to_rect(frame, (out_size, out_size), out_size, pad_value)


def clip_views(
    frames: jnp.ndarray,                 # (T, H, W, 3) uint8
    primary_box: Optional[jnp.ndarray],  # (T, 4) xyxy or None → full frame
    yolo_size: int = 640,
    dino_size: int = 224,
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Produce the per-model views of a clip in one fused traversal:
    - YOLO letterboxed full frames (T, S, S, 3)
    - DINO normalized crops of the primary box (T, 224, 224, 3)
    """
    yolo_view = jax.vmap(lambda f: letterbox(f, yolo_size)[0])(frames)
    if primary_box is None:
        h, w = frames.shape[1], frames.shape[2]
        primary_box = jnp.tile(jnp.asarray([0.0, 0.0, w, h]),
                               (frames.shape[0], 1))
    dino_view = jax.vmap(
        lambda f, b: crop_resize_normalize(f, b, (dino_size, dino_size),
                                           dtype=dtype))(frames, primary_box)
    return yolo_view.astype(dtype), dino_view
