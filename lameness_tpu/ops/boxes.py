"""Box utilities — pure jnp, fully batched, static shapes.

TPU-native replacement for the reference's per-box Python loops
(``services/yolo-pipeline/app/main.py:79-105``) and the tracker's
``iou_batch`` (``services/tracking-service/app/tracker/matching.py:12-60``).
"""
from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> (...,) area, clamped at 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (..., N, 4) and (..., M, 4) xyxy boxes -> (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) cx,cy,w,h -> x1,y1,x2,y2."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xyxy_to_zsr(boxes: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> (cx, cy, scale=area, aspect=w/h) — the Kalman observation space
    used by the reference tracker (``tracker/kalman.py:31-64``)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, w * h, w / jnp.maximum(h, 1e-6)], axis=-1)


def zsr_to_xyxy(z: jnp.ndarray) -> jnp.ndarray:
    cx, cy, s, r = jnp.split(z, 4, axis=-1)
    s = jnp.maximum(s, 1e-6)
    r = jnp.maximum(r, 1e-6)
    w = jnp.sqrt(s * r)
    h = s / jnp.maximum(w, 1e-6)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
