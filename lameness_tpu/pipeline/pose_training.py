"""YOLOv8-pose fine-tuning for the 20-keypoint cow model.

TPU-native equivalent of ``scripts/train_cow_pose_model.py`` (which wraps
``YOLO("yolov8n-pose.pt").train``): trains our flax YoloV8 pose variant on
a COCO-keypoints-style dataset with a simplified single-positive-per-
target assignment (the detector's anchor whose cell contains the box
centre at the best-matching level), BCE objectness/class loss, DFL box
loss, and an OKS-style keypoint loss.

This is intentionally a compact trainer — enough to fine-tune the pose
head on the Roboflow-style cow dataset and to smoke-train end to end in
CI on synthetic data; full TAL/CIoU matching is a later optimisation.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.yolo import YoloV8, init_params
from .checkpoint import save_params

STRIDES = (8, 16, 32)


def assign_targets(boxes: np.ndarray, kpts: np.ndarray, img_size: int,
                   num_kpts: int = 20) -> Dict[str, np.ndarray]:
    """One ground-truth box+pose per image -> per-level dense targets.

    boxes: (B, 4) xyxy pixels; kpts: (B, K, 3) x,y,visible.
    Returns per-level obj/box/kpt targets and the positive-cell mask.
    """
    b = boxes.shape[0]
    out = {}
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    size = np.maximum(w, h)
    # pick the level whose stride best matches the object size / 8
    level_idx = np.clip(np.round(np.log2(np.maximum(size, 1) / 32)), 0, 2
                        ).astype(int)
    for li, stride in enumerate(STRIDES):
        g = img_size // stride
        obj = np.zeros((b, g, g), np.float32)
        box_t = np.zeros((b, g, g, 4), np.float32)
        kpt_t = np.zeros((b, g, g, num_kpts, 3), np.float32)
        for i in range(b):
            if level_idx[i] != li:
                continue
            cx = (boxes[i, 0] + boxes[i, 2]) / 2 / stride
            cy = (boxes[i, 1] + boxes[i, 3]) / 2 / stride
            gx, gy = int(np.clip(cx, 0, g - 1)), int(np.clip(cy, 0, g - 1))
            obj[i, gy, gx] = 1.0
            # ltrb distances in cell units (DFL target)
            ax, ay = gx + 0.5, gy + 0.5
            box_t[i, gy, gx] = [ax - boxes[i, 0] / stride,
                                ay - boxes[i, 1] / stride,
                                boxes[i, 2] / stride - ax,
                                boxes[i, 3] / stride - ay]
            kpt_t[i, gy, gx] = kpts[i]
        out[f"obj{li}"] = obj
        out[f"box{li}"] = box_t
        out[f"kpt{li}"] = kpt_t
    return out


def pose_loss(model: YoloV8, params, images: jnp.ndarray,
              targets: Dict[str, jnp.ndarray],
              reg_max: int = 16) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    out = model.apply(params, images)
    total_cls = total_box = total_kpt = 0.0
    for li, stride in enumerate(STRIDES):
        level = out["levels"][li]
        obj_t = targets[f"obj{li}"]                    # (B, g, g)
        box_t = targets[f"box{li}"]                    # (B, g, g, 4)
        kpt_t = targets[f"kpt{li}"]                    # (B, g, g, K, 3)
        cls_logits = level["cls"][..., 0]              # single class
        total_cls += optax.sigmoid_binary_cross_entropy(
            cls_logits, obj_t).mean()
        pos = obj_t[..., None]
        # DFL: cross-entropy of the distance distribution vs soft 2-bin target
        dist_logits = level["box"].reshape(*obj_t.shape, 4, reg_max)
        t = jnp.clip(box_t, 0, reg_max - 1 - 1e-3)
        tl = jnp.floor(t)
        wr = t - tl
        tl_i = tl.astype(jnp.int32)
        logp = jax.nn.log_softmax(dist_logits, axis=-1)
        nll = -(jnp.take_along_axis(logp, tl_i[..., None], -1)[..., 0]
                * (1 - wr)
                + jnp.take_along_axis(logp, jnp.minimum(
                    tl_i + 1, reg_max - 1)[..., None], -1)[..., 0] * wr)
        total_box += (nll.mean(axis=-1) * obj_t).sum() / \
            jnp.maximum(obj_t.sum(), 1)
        # keypoints: decode the head's offset parameterisation
        kpt_raw = level["kpt"].reshape(*obj_t.shape, -1, 3)
        g = obj_t.shape[1]
        cell_x = jnp.arange(g) + 0.5
        ax = jnp.broadcast_to(cell_x[None, None, :], obj_t.shape)
        ay = jnp.broadcast_to(cell_x[None, :, None], obj_t.shape)
        pred_x = (kpt_raw[..., 0] * 2.0 + (ax[..., None] - 0.5)) * stride
        pred_y = (kpt_raw[..., 1] * 2.0 + (ay[..., None] - 0.5)) * stride
        vis = kpt_t[..., 2]
        scale = jnp.maximum(box_t[..., 2] + box_t[..., 0], 1.0)[..., None] \
            * stride
        d2 = ((pred_x - kpt_t[..., 0]) ** 2
              + (pred_y - kpt_t[..., 1]) ** 2) / (scale ** 2)
        oks = 1.0 - jnp.exp(-d2 * 4.0)
        kpt_pos = pos * vis
        total_kpt += (oks * kpt_pos).sum() / jnp.maximum(kpt_pos.sum(), 1)
        total_kpt += optax.sigmoid_binary_cross_entropy(
            kpt_raw[..., 2], vis * obj_t[..., None]).mean()
    loss = total_cls + 0.5 * total_box + 2.0 * total_kpt
    return loss, {"cls": total_cls, "box": total_box, "kpt": total_kpt}


def load_coco_pose_dataset(root: Path, img_size: int = 320,
                           limit: Optional[int] = None):
    """Minimal COCO-keypoints loader: root/annotations.json + root/images.
    Keeps the first annotation per image (single-cow assumption)."""
    import cv2
    ann = json.load(open(Path(root) / "annotations.json"))
    imgs = {im["id"]: im for im in ann["images"]}
    by_img = {}
    for a in ann["annotations"]:
        by_img.setdefault(a["image_id"], a)
    images, boxes, kpts = [], [], []
    for img_id, a in list(by_img.items())[:limit]:
        meta = imgs[img_id]
        f = Path(root) / "images" / meta["file_name"]
        if not f.exists():
            continue
        im = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
        sy = img_size / im.shape[0]
        sx = img_size / im.shape[1]
        im = cv2.resize(im, (img_size, img_size))
        x, y, w, h = a["bbox"]
        k = np.asarray(a["keypoints"], np.float32).reshape(-1, 3)
        k[:, 0] *= sx
        k[:, 1] *= sy
        k[:, 2] = (k[:, 2] > 0).astype(np.float32)
        images.append(im)
        boxes.append([x * sx, y * sy, (x + w) * sx, (y + h) * sy])
        kpts.append(k)
    return (np.stack(images).astype(np.uint8), np.asarray(boxes, np.float32),
            np.stack(kpts))


def train_pose_model(images: np.ndarray, boxes: np.ndarray, kpts: np.ndarray,
                     models_dir: Optional[Path] = None, epochs: int = 30,
                     batch_size: int = 8, lr: float = 1e-3,
                     img_size: int = 320, num_kpts: int = 20,
                     seed: int = 0) -> Dict[str, Any]:
    """Train the pose variant; checkpoints under models_dir/pose."""
    model = YoloV8(variant="n", num_classes=1, num_keypoints=num_kpts)
    params = init_params(model, jax.random.PRNGKey(seed), img=img_size)
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    targets_np = assign_targets(boxes, kpts, img_size, num_kpts)
    x_all = jnp.asarray(images.astype(np.float32) / 255.0)
    t_all = {k: jnp.asarray(v) for k, v in targets_np.items()}

    @jax.jit
    def step(p, o, xb, tb):
        (loss, aux), grads = jax.value_and_grad(
            lambda pp: pose_loss(model, pp, xb, tb), has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, aux

    n = images.shape[0]
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        ep_loss, steps = 0.0, 0
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            tb = {k: v[idx] for k, v in t_all.items()}
            params, opt_state, loss, aux = step(params, opt_state,
                                                x_all[idx], tb)
            ep_loss += float(loss)
            steps += 1
        history.append(ep_loss / max(1, steps))
    if models_dir is not None:
        save_params(models_dir, "pose", params)
    return {"status": "completed", "loss_history": history,
            "final_loss": history[-1], "params": params}
