"""Batched greedy NMS under XLA static shapes.

TPU-native replacement for ultralytics' CUDA/torchvision NMS
(used implicitly in ``services/yolo-pipeline/app/main.py:76``): exact greedy
non-maximum suppression expressed as a K-step ``lax.scan`` — each step
selects the current argmax and suppresses overlapping candidates, producing
a fixed-K padded output with a validity mask that downstream stages thread
through the whole jitted pipeline (SURVEY.md §7 hard part #1).

Cost is O(K·N) IoU rows; with N = 8400 anchors (640² YOLO) and K = 32 this
is ~270k IoU evaluations per image — noise next to the backbone convs, and
it stays on-device so boxes never leave HBM.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

_CLASS_OFFSET = 1e4  # multi-class NMS: separate classes by coordinate offset


def nms_single(
    boxes: jnp.ndarray,            # (N, 4) xyxy
    scores: jnp.ndarray,           # (N,)
    classes: jnp.ndarray,          # (N,) int32
    max_out: int,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.0,
    class_agnostic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS for one image.

    Returns (boxes (K,4), scores (K,), classes (K,), valid (K,)) — slots
    beyond the number of survivors are zeroed with valid=False.
    """
    n = boxes.shape[0]
    live_scores = jnp.where(scores > score_threshold, scores, -jnp.inf)

    if class_agnostic:
        offset_boxes = boxes
    else:
        offs = classes.astype(boxes.dtype)[:, None] * _CLASS_OFFSET
        offset_boxes = boxes + offs

    iou = pairwise_iou(offset_boxes, offset_boxes)  # (N, N)

    def step(live, _):
        idx = jnp.argmax(live)
        best = live[idx]
        keep = best > -jnp.inf
        # suppress: anything with IoU > threshold vs the selected box
        suppress = iou[idx] > iou_threshold
        live = jnp.where(keep & suppress, -jnp.inf, live)
        live = live.at[idx].set(-jnp.inf)
        return live, (idx, best, keep)

    _, (sel_idx, sel_score, sel_valid) = jax.lax.scan(
        step, live_scores, None, length=max_out)

    out_boxes = jnp.where(sel_valid[:, None], boxes[sel_idx], 0.0)
    out_scores = jnp.where(sel_valid, scores[sel_idx], 0.0)
    out_classes = jnp.where(sel_valid, classes[sel_idx], -1)
    return out_boxes, out_scores, out_classes, sel_valid


@partial(jax.jit, static_argnames=("max_out", "class_agnostic"))
def nms_batched(
    boxes: jnp.ndarray,            # (B, N, 4)
    scores: jnp.ndarray,           # (B, N)
    classes: jnp.ndarray,          # (B, N)
    max_out: int = 32,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.0,
    class_agnostic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vmapped greedy NMS over a (frame-)batch."""
    fn = partial(nms_single, max_out=max_out, iou_threshold=iou_threshold,
                 score_threshold=score_threshold, class_agnostic=class_agnostic)
    return jax.vmap(fn)(boxes, scores, classes)
