"""Core pytrees shared across pipeline stages.

Everything on the device hot path is a chex dataclass with **static shapes**:
variable-length quantities (detections per frame, tracks per video, nodes per
graph) are fixed-K padded and carry validity masks, so the whole multi-stage
pipeline stays inside one jitted XLA program (SURVEY.md §7 hard part #1).

Shape conventions (leading dims):
- ``B``  clip batch
- ``T``  sampled frames per clip (static per stage: 2/1/5 FPS over 5 s)
- ``K``  max detections per frame (cfg.yolo.max_detections)
- ``S``  max track slots (cfg.tracking.max_tracks)
- ``N``  max graph nodes (cfg.graphgps.max_nodes)
"""
from __future__ import annotations

from typing import Optional

import chex
import jax.numpy as jnp


@chex.dataclass
class ClipBatch:
    """A batch of decoded, device-resident clips.

    frames: (B, T, H, W, 3) uint8 or float — NHWC, RGB.
    frame_valid: (B, T) bool — padding mask for clips shorter than T.
    fps: (B,) float32 — source fps per clip.
    frame_indices: (B, T) int32 — original frame numbers in the source video.
    """
    frames: jnp.ndarray
    frame_valid: jnp.ndarray
    fps: jnp.ndarray
    frame_indices: jnp.ndarray


@chex.dataclass
class Detections:
    """Fixed-K padded per-frame detections.

    boxes: (B, T, K, 4) float32 xyxy in source-pixel coordinates.
    scores: (B, T, K) float32.
    classes: (B, T, K) int32.
    valid: (B, T, K) bool.
    """
    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray


@chex.dataclass
class Masks:
    """Per-frame segmentation of the primary detection.

    masks: (B, T, Hm, Wm) bool/float — low-res mask logits or bits.
    iou_pred: (B, T) float32 — decoder IoU prediction.
    valid: (B, T) bool.
    """
    masks: jnp.ndarray
    iou_pred: jnp.ndarray
    valid: jnp.ndarray


@chex.dataclass
class Embeddings:
    """Per-frame DINO embeddings.

    vectors: (B, T, D) float32 — mean-pooled last hidden state (D=768).
    valid: (B, T) bool.
    """
    vectors: jnp.ndarray
    valid: jnp.ndarray


@chex.dataclass
class Keypoints:
    """Per-frame pose keypoints of the primary cow.

    xy: (B, T, Kp, 2) float32 pixel coords.
    conf: (B, T, Kp) float32.
    valid: (B, T) bool.
    """
    xy: jnp.ndarray
    conf: jnp.ndarray
    valid: jnp.ndarray


@chex.dataclass
class TrackState:
    """Fixed-slot ByteTrack state carried across frames under lax.scan.

    kalman_mean: (S, 8) float32 — cx, cy, s, r + velocities (7 used).
    kalman_cov: (S, 8, 8) float32.
    track_id: (S,) int32 — 0 = empty slot.
    hits: (S,) int32; age: (S,) int32; time_since_update: (S,) int32.
    state: (S,) int32 — 0 empty / 1 tentative / 2 confirmed / 3 lost.
    score: (S,) float32.
    embedding: (S, D) float32 — momentum appearance feature.
    next_id: () int32.
    """
    kalman_mean: jnp.ndarray
    kalman_cov: jnp.ndarray
    track_id: jnp.ndarray
    hits: jnp.ndarray
    age: jnp.ndarray
    time_since_update: jnp.ndarray
    state: jnp.ndarray
    score: jnp.ndarray
    embedding: jnp.ndarray
    next_id: jnp.ndarray


@chex.dataclass
class PredictorOutput:
    """Output of one lameness predictor head over a batch.

    probability: (B,) float32 — P(lame).
    uncertainty: (B,) float32 — MC-dropout std.
    """
    probability: jnp.ndarray
    uncertainty: jnp.ndarray
    extra: Optional[dict] = None


def to_compute_dtype(x: jnp.ndarray, dtype: str = "bfloat16") -> jnp.ndarray:
    """uint8 frames -> normalized compute dtype in [0,1]."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return x.astype(jnp.dtype(dtype))
