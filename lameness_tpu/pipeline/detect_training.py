"""YOLO detection training: task-aligned assignment + CIoU/DFL/BCE losses.

The reference fine-tunes its cow detector by shelling out to the
ultralytics trainer (reference: yolo_cow_id/train.py, ml-service's
model-retrain endpoints); the training recipe that package implements is
task-aligned assignment (TOOD) with a CIoU box loss, a distribution-focal
loss over the ltrb bin distributions, and BCE classification against the
soft task-aligned scores.  This module is that recipe as pure jittable
functions over our flax ``YoloV8`` raw head outputs.

TPU-native design: everything is fixed-shape — ground-truth boxes arrive
padded to ``max_boxes`` with a validity mask, the assigner is dense
(B, M, A) boolean algebra (no per-image Python), and one jitted
``train_step`` covers assign + losses + optax update, so the whole thing
compiles to a single XLA program.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.yolo import YoloV8, _anchors_for


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------
def elementwise_iou(a: jnp.ndarray, b: jnp.ndarray,
                    eps: float = 1e-7) -> jnp.ndarray:
    """IoU of aligned box arrays (..., 4) xyxy."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * \
        jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * \
        jnp.clip(b[..., 3] - b[..., 1], 0)
    return inter / (area_a + area_b - inter + eps)


def ciou(pred: jnp.ndarray, target: jnp.ndarray,
         eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU (aligned, (..., 4) xyxy): IoU - center-dist - aspect."""
    iou = elementwise_iou(pred, target, eps)
    # enclosing box diagonal
    c_lt = jnp.minimum(pred[..., :2], target[..., :2])
    c_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    c_wh = jnp.clip(c_rb - c_lt, 0.0)
    c2 = c_wh[..., 0] ** 2 + c_wh[..., 1] ** 2 + eps
    # center distance
    pc = (pred[..., :2] + pred[..., 2:]) / 2
    tc = (target[..., :2] + target[..., 2:]) / 2
    rho2 = ((pc - tc) ** 2).sum(-1)
    # aspect-ratio consistency
    pw = jnp.clip(pred[..., 2] - pred[..., 0], eps)
    ph = jnp.clip(pred[..., 3] - pred[..., 1], eps)
    tw = jnp.clip(target[..., 2] - target[..., 0], eps)
    th = jnp.clip(target[..., 3] - target[..., 1], eps)
    v = (4 / jnp.pi ** 2) * (jnp.arctan(tw / th) - jnp.arctan(pw / ph)) ** 2
    alpha = v / (v - iou + 1 + eps)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


# ---------------------------------------------------------------------------
# flat head views
# ---------------------------------------------------------------------------
class FlatPreds(NamedTuple):
    cls_logits: jnp.ndarray    # (B, A, C)
    dist_logits: jnp.ndarray   # (B, A, 4, reg_max)
    boxes: jnp.ndarray         # (B, A, 4) xyxy pixels (DFL expectation)
    anchors: jnp.ndarray       # (A, 2) pixel centers
    strides: jnp.ndarray       # (A,)
    kpts: jnp.ndarray | None   # (B, A, K, 3): xy pixels + visibility logit


def flatten_levels(levels, reg_max: int = 16,
                   strides: Sequence[int] = (8, 16, 32)) -> FlatPreds:
    cls_l, dist_l, box_l, anc_l, str_l, kpt_l = [], [], [], [], [], []
    for level, stride in zip(levels, strides):
        box_map, cls_map = level["box"], level["cls"]
        b, h, w, _ = box_map.shape
        anchors, stride_v = _anchors_for((h, w), stride)
        dist = box_map.reshape(b, h * w, 4, reg_max)
        prob = jax.nn.softmax(dist, axis=-1)
        bins = jnp.arange(reg_max, dtype=prob.dtype)
        ltrb = jnp.einsum("bnkr,r->bnk", prob, bins)
        x1y1 = (anchors[None] - ltrb[..., :2]) * stride_v[None, :, None]
        x2y2 = (anchors[None] + ltrb[..., 2:]) * stride_v[None, :, None]
        box_l.append(jnp.concatenate([x1y1, x2y2], -1))
        cls_l.append(cls_map.reshape(b, h * w, -1))
        dist_l.append(dist)
        anc_l.append(anchors * stride)
        str_l.append(stride_v)
        if "kpt" in level:
            kpt = level["kpt"].reshape(b, h * w, -1, 3)
            # same decode as models/yolo.py decode_predictions
            xy = (kpt[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) \
                * stride_v[None, :, None, None]
            kpt_l.append(jnp.concatenate([xy, kpt[..., 2:]], -1))
    return FlatPreds(jnp.concatenate(cls_l, 1), jnp.concatenate(dist_l, 1),
                     jnp.concatenate(box_l, 1), jnp.concatenate(anc_l, 0),
                     jnp.concatenate(str_l, 0),
                     jnp.concatenate(kpt_l, 1) if kpt_l else None)


# ---------------------------------------------------------------------------
# task-aligned assigner (dense, fixed shapes)
# ---------------------------------------------------------------------------
def task_aligned_assign(pd_scores: jnp.ndarray, pd_boxes: jnp.ndarray,
                        anchors: jnp.ndarray, gt_labels: jnp.ndarray,
                        gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray,
                        topk: int = 10, alpha: float = 0.5,
                        beta: float = 6.0):
    """TOOD assignment.

    pd_scores (B, A, C) in [0, 1]; pd_boxes (B, A, 4) pixels;
    anchors (A, 2) pixel centers; gt_labels (B, M) int; gt_boxes (B, M, 4)
    xyxy pixels; gt_mask (B, M) bool for padded slots.

    Returns target_labels (B, A), target_boxes (B, A, 4),
    target_scores (B, A, C) soft targets, fg_mask (B, A), and
    gt_idx (B, A) — the winning gt slot per anchor (valid where fg).
    """
    b, a, c = pd_scores.shape
    m = gt_boxes.shape[1]

    # anchor center strictly inside the gt box
    ax = anchors[None, None, :, 0]
    ay = anchors[None, None, :, 1]
    in_box = ((ax > gt_boxes[..., 0:1]) & (ax < gt_boxes[..., 2:3])
              & (ay > gt_boxes[..., 1:2]) & (ay < gt_boxes[..., 3:4]))
    in_box = in_box & gt_mask[..., None]                        # (B, M, A)

    # pairwise IoU pred-anchor-box vs gt  (B, M, A)
    lt = jnp.maximum(pd_boxes[:, None, :, :2], gt_boxes[:, :, None, :2])
    rb = jnp.minimum(pd_boxes[:, None, :, 2:], gt_boxes[:, :, None, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    pa = jnp.clip(pd_boxes[..., 2] - pd_boxes[..., 0], 0) * \
        jnp.clip(pd_boxes[..., 3] - pd_boxes[..., 1], 0)
    ga = jnp.clip(gt_boxes[..., 2] - gt_boxes[..., 0], 0) * \
        jnp.clip(gt_boxes[..., 3] - gt_boxes[..., 1], 0)
    iou = inter / (pa[:, None] + ga[..., None] - inter + 1e-7)

    # class score of each anchor at the gt's label
    lbl = jnp.clip(gt_labels, 0, c - 1)                         # (B, M)
    sc = jnp.take_along_axis(
        pd_scores[:, None].repeat(m, 1), lbl[..., None, None].repeat(a, 2),
        axis=-1)[..., 0]                                        # (B, M, A)
    align = (sc ** alpha) * (iou ** beta)
    align = jnp.where(in_box, align, 0.0)

    # top-k candidates per gt
    k = min(topk, a)
    kth = jnp.sort(align, axis=-1)[..., -k][..., None]          # (B, M, 1)
    cand = in_box & (align >= jnp.maximum(kth, 1e-9)) & (align > 0)

    # anchors claimed by several gts go to the highest-IoU gt
    n_claims = cand.sum(1)                                      # (B, A)
    best_gt = jnp.argmax(jnp.where(cand, iou, -1.0), axis=1)    # (B, A)
    keep = (jnp.arange(m)[None, :, None] == best_gt[:, None, :])
    cand = cand & jnp.where(n_claims[:, None] > 1, keep, True)

    # cold-start fallback AFTER dedup: a gt left with no candidate (all
    # align zero because box predictions collapsed to zero IoU, or its
    # only candidate lost the multi-claim resolution) would keep n_fg at
    # 0 and park the loss at a dead 0 with no gradient forever.  Such a
    # gt claims its closest in-box anchor OUTRIGHT (displacing any other
    # claim on that one anchor — the displaced gt survived dedup, so it
    # had candidates of its own); TAL takes over once any IoU is nonzero.
    gcx = (gt_boxes[..., 0:1] + gt_boxes[..., 2:3]) / 2
    gcy = (gt_boxes[..., 1:2] + gt_boxes[..., 3:4]) / 2
    cdist = jnp.where(in_box, (ax - gcx) ** 2 + (ay - gcy) ** 2, jnp.inf)
    # Two claim rounds: round 1 can (a) displace a gt whose ONLY TAL
    # candidate gets fallback-claimed, and (b) collide two candidate-less
    # gts on the same nearest anchor.  Collisions resolve to the closer
    # gt (ties: lower index); the loser and any displaced gt re-enter in
    # round 2 with already-fallback-claimed anchors masked out, so they
    # claim their nearest still-free in-box anchor instead of silently
    # losing the step.
    fb_claimed = jnp.zeros_like(cand[:, 0, :])                  # (B, A)
    for _ in range(2):
        cdist_r = jnp.where(fb_claimed[:, None, :], jnp.inf, cdist)
        need = ((~cand.any(-1)) & gt_mask
                & jnp.isfinite(cdist_r).any(-1))                # (B, M)
        fb_anchor = jnp.argmin(cdist_r, axis=-1)                # (B, M)
        fb = (jax.nn.one_hot(fb_anchor, a, dtype=jnp.bool_)
              & need[..., None])                                # (B, M, A)
        d_at = jnp.take_along_axis(cdist_r, fb_anchor[..., None],
                                   -1)[..., 0]                  # (B, M)
        winner = jnp.argmin(jnp.where(fb, d_at[..., None], jnp.inf),
                            axis=1)                             # (B, A)
        fb = fb & (jnp.arange(m)[None, :, None] == winner[:, None, :])
        fb_round = fb.any(axis=1)                               # (B, A)
        cand = (cand & ~fb_round[:, None, :]) | fb
        fb_claimed = fb_claimed | fb_round

    fg_mask = cand.any(axis=1)                                  # (B, A)
    gt_idx = jnp.argmax(cand, axis=1)                           # (B, A)
    bi = jnp.arange(b)[:, None]
    target_boxes = gt_boxes[bi, gt_idx]
    target_labels = jnp.where(fg_mask, gt_labels[bi, gt_idx], 0)

    # soft targets: align metric normalised so max per gt == max IoU per gt
    align_sel = jnp.where(cand, align, 0.0)
    pos_iou = jnp.where(cand, iou, 0.0)
    norm = align_sel.max(-1, keepdims=True) + 1e-9              # (B, M, 1)
    soft = (align_sel * pos_iou.max(-1, keepdims=True) / norm).max(1)
    # fallback anchors carry zero align; floor their soft target so the
    # classifier gets a pull-up signal out of the dead zone
    soft = jnp.where(fb_claimed, jnp.maximum(soft, 0.5), soft)
    onehot = jax.nn.one_hot(target_labels, c)
    target_scores = onehot * jnp.where(fg_mask, soft, 0.0)[..., None]
    return target_labels, target_boxes, target_scores, fg_mask, gt_idx


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------
def dfl_loss(dist_logits: jnp.ndarray, target_ltrb: jnp.ndarray,
             reg_max: int = 16) -> jnp.ndarray:
    """Distribution focal loss: CE against the two bins bracketing the
    target.  dist_logits (..., 4, reg_max); target_ltrb (..., 4) cells."""
    t = jnp.clip(target_ltrb, 0.0, reg_max - 1 - 1e-3)
    tl = jnp.floor(t)
    wr = t - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(dist_logits, axis=-1)
    il = tl.astype(jnp.int32)
    ll = jnp.take_along_axis(logp, il[..., None], -1)[..., 0]
    lr = jnp.take_along_axis(logp, (il + 1)[..., None], -1)[..., 0]
    return -(wl * ll + wr * lr).mean(-1)


def keypoint_loss(pd_kpts: jnp.ndarray, gt_kpts: jnp.ndarray,
                  gt_area: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """OKS-style location loss + visibility BCE, per anchor.

    pd_kpts (B, A, K, 3) xy pixels + vis logit; gt_kpts (B, A, K, 3)
    xy + vis flag (already gathered per anchor); gt_area (B, A).
    """
    vis = gt_kpts[..., 2] > 0                            # (B, A, K)
    d2 = ((pd_kpts[..., :2] - gt_kpts[..., :2]) ** 2).sum(-1)
    e = d2 / (2.0 * (gt_area[..., None] + 1e-9) * 4.0)   # sigma² folded in
    loc = ((1.0 - jnp.exp(-e)) * vis).sum(-1) / \
        jnp.maximum(vis.sum(-1), 1.0)
    kobj = optax.sigmoid_binary_cross_entropy(
        pd_kpts[..., 2], vis.astype(pd_kpts.dtype)).mean(-1)
    return loc, kobj


def detection_loss(levels, gt_labels, gt_boxes, gt_mask,
                   num_classes: int, reg_max: int = 16,
                   strides: Sequence[int] = (8, 16, 32),
                   box_w: float = 7.5, cls_w: float = 0.5,
                   dfl_w: float = 1.5, gt_kpts=None,
                   kpt_w: float = 12.0, kobj_w: float = 1.0
                   ) -> Tuple[jnp.ndarray, Dict]:
    """Total = box_w*CIoU + cls_w*BCE + dfl_w*DFL (ultralytics gains);
    with ``gt_kpts`` (B, M, K, 3) adds the pose-branch OKS + vis-BCE
    terms (kpt_w/kobj_w are the ultralytics pose gains)."""
    fp = flatten_levels(levels, reg_max, strides)
    pd_scores = jax.nn.sigmoid(fp.cls_logits)
    # assignment is a no-grad step (TOOD): detaching also avoids the inf
    # gradient of score**0.5 at underflowed sigmoids
    tl_, tb, ts, fg, gt_idx = task_aligned_assign(
        jax.lax.stop_gradient(pd_scores), jax.lax.stop_gradient(fp.boxes),
        fp.anchors, gt_labels, gt_boxes, gt_mask)

    tsum = jnp.maximum(ts.sum(), 1.0)
    cls = optax.sigmoid_binary_cross_entropy(fp.cls_logits, ts).sum() / tsum

    w = ts.sum(-1)                                       # (B, A)
    box = ((1.0 - ciou(fp.boxes, tb)) * w * fg).sum() / tsum

    # DFL targets in cell units relative to each anchor
    anc = fp.anchors / fp.strides[:, None]               # cells
    tb_c = tb / fp.strides[None, :, None]
    ltrb = jnp.concatenate([anc[None] - tb_c[..., :2],
                            tb_c[..., 2:] - anc[None]], -1)
    dfl = (dfl_loss(fp.dist_logits, ltrb, reg_max) * w * fg).sum() / tsum

    total = box_w * box + cls_w * cls + dfl_w * dfl
    aux = {"box": box, "cls": cls, "dfl": dfl, "n_fg": fg.sum()}

    if gt_kpts is not None and fp.kpts is not None:
        # gather each fg anchor's gt keypoints (same gt as its box target)
        bi = jnp.arange(gt_boxes.shape[0])[:, None]
        tk = gt_kpts[bi, gt_idx]                         # (B, A, K, 3)
        area = jnp.clip(tb[..., 2] - tb[..., 0], 0) * \
            jnp.clip(tb[..., 3] - tb[..., 1], 0)
        loc, kobj = keypoint_loss(fp.kpts, tk, area)
        kpt_l = (loc * w * fg).sum() / tsum
        kobj_l = (kobj * w * fg).sum() / tsum
        total = total + kpt_w * kpt_l + kobj_w * kobj_l
        aux.update(kpt=kpt_l, kobj=kobj_l)

    aux["total"] = total
    return total, aux


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------
class DetectTrainer:
    """Minimal single-program trainer for YoloV8 detection heads.

    Keeps an exponential moving average of the weights (ultralytics
    ramps its EMA decay as ``d * (1 - exp(-step/tau))``); evaluation
    should use ``ema_params``.
    """

    def __init__(self, model: YoloV8, params, lr: float = 1e-3,
                 weight_decay: float = 5e-4, ema_decay: float = 0.9999,
                 ema_tau: float = 2000.0):
        self.model = model
        self.tx = optax.chain(optax.clip_by_global_norm(10.0),
                              optax.adamw(lr, weight_decay=weight_decay))
        self.params = params
        self.opt_state = self.tx.init(params)
        self.ema_params = params
        self._n_steps = jnp.zeros((), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("has_kpts",))
        def step(params, opt_state, ema, n, images, gt_labels, gt_boxes,
                 gt_mask, gt_kpts, has_kpts):
            def loss_fn(p):
                out = self.model.apply({"params": p}, images)
                return detection_loss(out["levels"], gt_labels, gt_boxes,
                                      gt_mask, self.model.num_classes,
                                      self.model.reg_max,
                                      gt_kpts=gt_kpts if has_kpts else None)
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            n = n + 1.0
            d = ema_decay * (1.0 - jnp.exp(-n / ema_tau))
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                               ema, params)
            return params, opt_state, ema, n, aux
        self._step = step

    def train_step(self, images, gt_labels, gt_boxes, gt_mask,
                   gt_kpts=None) -> Dict:
        has_kpts = gt_kpts is not None
        if not has_kpts:                     # static placeholder for jit
            gt_kpts = jnp.zeros(gt_boxes.shape[:2] + (1, 3))
        (self.params, self.opt_state, self.ema_params, self._n_steps,
         aux) = self._step(self.params, self.opt_state, self.ema_params,
                           self._n_steps, images, gt_labels, gt_boxes,
                           gt_mask, gt_kpts, has_kpts)
        return {k: float(v) for k, v in aux.items()}
