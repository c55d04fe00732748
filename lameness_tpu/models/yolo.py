"""YOLOv8-style detector + pose estimator in flax.

TPU-native equivalent of the reference's ultralytics usage: cow detection in
video-preprocessing (``video-preprocessing/app/main.py:67-88``), clip
curation (``clip-curation/app/main.py:86,122``), the yolo-pipeline
(``yolo-pipeline/app/main.py:26-35``) and the 20-keypoint pose model of the
tleap-pipeline (``tleap-pipeline/app/main.py:122-137``).

Decode (DFL expectation + anchor offsets) and NMS run fully on device with
fixed-K outputs, so detection feeds tracking/segmentation without leaving
HBM.  Weights convert from an ultralytics ``model.state_dict()`` dump
(``convert_ultralytics_state_dict``); with no weights the head runs
random-initialised, mirroring the reference's pretrained/fallback behavior.

Layout notes: NHWC; BatchNorm is inference-mode (folded running stats as
parameters, ultralytics eps=1e-3).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_batched

# base (depth, width, max_channels) scales per variant
VARIANTS = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.00, 512),
    "x": (1.0, 1.25, 512),
}


def _make_div(x: float, div: int = 8) -> int:
    return max(div, int(x + div / 2) // div * div)


class BN(nn.Module):
    """Inference-mode batch norm: running stats stored as parameters."""
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        # fold in the params' (f32) precision, then return in the INPUT
        # dtype (torch-autocast semantics): under the bf16 policy the f32
        # stats must not promote every downstream conv back to f32
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class ConvBnSiLU(nn.Module):
    out_ch: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=pad, use_bias=False, name="conv")(x)
        x = BN(name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        h = ConvBnSiLU(self.out_ch, 3, name="cv1")(x)
        h = ConvBnSiLU(self.out_ch, 3, name="cv2")(h)
        if self.shortcut and x.shape[-1] == self.out_ch:
            return x + h
        return h


class C2f(nn.Module):
    out_ch: int
    n: int = 1
    shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        c = self.out_ch // 2
        y = ConvBnSiLU(2 * c, 1, name="cv1")(x)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, name=f"m{i}")(parts[-1]))
        return ConvBnSiLU(self.out_ch, 1, name="cv2")(
            jnp.concatenate(parts, axis=-1))


class SPPF(nn.Module):
    out_ch: int
    pool: int = 5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 2
        x = ConvBnSiLU(c, 1, name="cv1")(x)
        p = self.pool
        pool = lambda t: nn.max_pool(t, (p, p), strides=(1, 1),
                                     padding=((p // 2, p // 2), (p // 2, p // 2)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBnSiLU(self.out_ch, 1,
                          name="cv2")(jnp.concatenate([x, y1, y2, y3], -1))


class DetectBranch(nn.Module):
    """One level of the decoupled Detect head (box DFL + cls)."""
    c2: int
    c3: int
    reg_max: int
    nc: int

    @nn.compact
    def __call__(self, x):
        box = ConvBnSiLU(self.c2, 3, name="box0")(x)
        box = ConvBnSiLU(self.c2, 3, name="box1")(box)
        box = nn.Conv(4 * self.reg_max, (1, 1), name="box2")(box)
        cls = ConvBnSiLU(self.c3, 3, name="cls0")(x)
        cls = ConvBnSiLU(self.c3, 3, name="cls1")(cls)
        cls = nn.Conv(self.nc, (1, 1), name="cls2")(cls)
        return box, cls


class PoseBranch(nn.Module):
    c4: int
    nk: int                       # num_keypoints * 3

    @nn.compact
    def __call__(self, x):
        k = ConvBnSiLU(self.c4, 3, name="kpt0")(x)
        k = ConvBnSiLU(self.c4, 3, name="kpt1")(k)
        return nn.Conv(self.nk, (1, 1), name="kpt2")(k)


class YoloV8(nn.Module):
    """Backbone + PAN neck + detect (and optional pose) head.

    __call__(images (B, S, S, 3)) -> dict of per-level raw outputs plus
    decoded, NMS-ready predictions via ``decode``.
    """
    variant: str = "n"
    num_classes: int = 80
    reg_max: int = 16
    num_keypoints: int = 0        # >0 adds a pose branch (kpts * 3 channels)

    def _chs(self) -> List[int]:
        d, w, mc = VARIANTS[self.variant]
        base = [64, 128, 256, 512, 1024]
        return [_make_div(min(c, mc) * w) for c in base]

    def _depth(self, n: int) -> int:
        d, _, _ = VARIANTS[self.variant]
        return max(1, round(n * d))

    @nn.compact
    def __call__(self, x):
        chs = self._chs()          # n: [16, 32, 64, 128, 256]
        n2 = self._depth(3)
        n3 = self._depth(6)

        x = ConvBnSiLU(chs[0], 3, 2, name="stem")(x)               # P1
        x = ConvBnSiLU(chs[1], 3, 2, name="down1")(x)              # P2
        x = C2f(chs[1], n2, True, name="c2f1")(x)
        x = ConvBnSiLU(chs[2], 3, 2, name="down2")(x)              # P3
        p3 = C2f(chs[2], n3, True, name="c2f2")(x)
        x = ConvBnSiLU(chs[3], 3, 2, name="down3")(p3)             # P4
        p4 = C2f(chs[3], n3, True, name="c2f3")(x)
        x = ConvBnSiLU(chs[4], 3, 2, name="down4")(p4)             # P5
        x = C2f(chs[4], n2, True, name="c2f4")(x)
        p5 = SPPF(chs[4], 5, name="sppf")(x)

        # PAN neck
        u = jax.image.resize(p5, (p5.shape[0], p4.shape[1], p4.shape[2],
                                  p5.shape[3]), "nearest")
        h4 = C2f(chs[3], n2, False, name="neck1")(jnp.concatenate([u, p4], -1))
        u = jax.image.resize(h4, (h4.shape[0], p3.shape[1], p3.shape[2],
                                  h4.shape[3]), "nearest")
        o3 = C2f(chs[2], n2, False, name="neck2")(jnp.concatenate([u, p3], -1))
        d = ConvBnSiLU(chs[2], 3, 2, name="neck_down1")(o3)
        o4 = C2f(chs[3], n2, False, name="neck3")(jnp.concatenate([d, h4], -1))
        d = ConvBnSiLU(chs[3], 3, 2, name="neck_down2")(o4)
        o5 = C2f(chs[4], n2, False, name="neck4")(jnp.concatenate([d, p5], -1))

        c2 = max(16, chs[2] // 4, self.reg_max * 4)
        c3 = max(chs[2], min(self.num_classes, 100))
        outs: Dict[str, Any] = {"levels": []}
        feats = [o3, o4, o5]
        for i, f in enumerate(feats):
            box, cls = DetectBranch(c2, c3, self.reg_max, self.num_classes,
                                    name=f"detect{i}")(f)
            level = {"box": box, "cls": cls}
            if self.num_keypoints:
                c4 = max(chs[2] // 4, self.num_keypoints * 3)
                level["kpt"] = PoseBranch(c4, self.num_keypoints * 3,
                                          name=f"pose{i}")(f)
            outs["levels"].append(level)
        return outs


# ---------------------------------------------------------------------------
# decode + NMS (pure functions over the raw head outputs)
# ---------------------------------------------------------------------------
def _anchors_for(shape_hw: Tuple[int, int], stride: int):
    h, w = shape_hw
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)
    gx, gy = jnp.meshgrid(xs, ys)
    anchors = jnp.stack([gx.ravel(), gy.ravel()], -1)      # cell units
    return anchors, jnp.full((h * w,), float(stride))


def decode_predictions(levels: List[Dict[str, jnp.ndarray]],
                       reg_max: int = 16,
                       strides: Sequence[int] = (8, 16, 32)):
    """Raw per-level maps -> flat (B, A, ...) boxes/scores/keypoints.

    Boxes are xyxy in input-canvas pixels (DFL expectation decode).
    """
    all_boxes, all_scores, all_kpts = [], [], []
    for level, stride in zip(levels, strides):
        box_map, cls_map = level["box"], level["cls"]
        b, h, w, _ = box_map.shape
        anchors, stride_v = _anchors_for((h, w), stride)
        dist = box_map.reshape(b, h * w, 4, reg_max)
        dist = jax.nn.softmax(dist, axis=-1)
        bins = jnp.arange(reg_max, dtype=dist.dtype)
        ltrb = jnp.einsum("bnkr,r->bnk", dist, bins)       # cell units
        x1y1 = (anchors[None] - ltrb[..., :2]) * stride_v[None, :, None]
        x2y2 = (anchors[None] + ltrb[..., 2:]) * stride_v[None, :, None]
        all_boxes.append(jnp.concatenate([x1y1, x2y2], -1))
        all_scores.append(jax.nn.sigmoid(
            cls_map.reshape(b, h * w, -1)))
        if "kpt" in level:
            kpt = level["kpt"].reshape(b, h * w, -1, 3)
            xy = (kpt[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) \
                * stride_v[None, :, None, None]
            conf = jax.nn.sigmoid(kpt[..., 2:3])
            all_kpts.append(jnp.concatenate([xy, conf], -1))
    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    kpts = jnp.concatenate(all_kpts, axis=1) if all_kpts else None
    return boxes, scores, kpts


def detect(levels, conf_threshold: float = 0.25, iou_threshold: float = 0.45,
           max_det: int = 32, reg_max: int = 16,
           strides: Sequence[int] = (8, 16, 32), pre_topk: int = 256):
    """Full postprocess: decode -> class argmax -> pre-NMS top-k -> NMS.

    The pre-NMS top-k keeps the greedy-NMS candidate set small (the IoU
    matrix is pre_topk², not num_anchors²), exactly like ultralytics'
    candidate cap — 640² YOLO has 8400 anchors, NMS sees 256.

    Returns dict(boxes (B,K,4), scores (B,K), classes (B,K), valid (B,K),
    keypoints (B,K,Kp,3) when the model has a pose head).
    """
    boxes, scores, kpts = decode_predictions(levels, reg_max, strides)
    cls_score = scores.max(axis=-1)
    cls_id = scores.argmax(axis=-1).astype(jnp.int32)
    if cls_score.shape[-1] > pre_topk:
        top_scores, top_idx = jax.lax.top_k(cls_score, pre_topk)
        boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        cls_id = jnp.take_along_axis(cls_id, top_idx, axis=1)
        if kpts is not None:
            kpts = jnp.take_along_axis(kpts, top_idx[..., None, None], axis=1)
        cls_score = top_scores
    ob, osc, ocl, valid = nms_batched(
        boxes, cls_score, cls_id, max_out=max_det,
        iou_threshold=iou_threshold, score_threshold=conf_threshold)
    out = {"boxes": ob, "scores": osc, "classes": ocl, "valid": valid}
    if kpts is not None:
        # recover keypoints of the selected anchors by nearest-box matching
        # (exact: NMS returns original boxes, match on all 4 coords)
        def per_image(sel_boxes, all_b, all_k):
            d = jnp.abs(sel_boxes[:, None, :] - all_b[None, :, :]).sum(-1)
            idx = jnp.argmin(d, axis=1)
            return all_k[idx]
        out["keypoints"] = jax.vmap(per_image)(ob, boxes, kpts)
    return out


# ---------------------------------------------------------------------------
# ultralytics state_dict conversion
# ---------------------------------------------------------------------------
_BACKBONE_MAP = [
    ("stem", "0"), ("down1", "1"), ("c2f1", "2"), ("down2", "3"),
    ("c2f2", "4"), ("down3", "5"), ("c2f3", "6"), ("down4", "7"),
    ("c2f4", "8"), ("sppf", "9"), ("neck1", "12"), ("neck2", "15"),
    ("neck_down1", "16"), ("neck3", "18"), ("neck_down2", "19"),
    ("neck4", "21"),
]


def _conv_bn(sd, t):
    return {
        "conv": {"kernel": np.transpose(sd[f"{t}.conv.weight"], (2, 3, 1, 0))},
        "bn": {"scale": sd[f"{t}.bn.weight"], "bias": sd[f"{t}.bn.bias"],
               "mean": sd[f"{t}.bn.running_mean"],
               "var": sd[f"{t}.bn.running_var"]},
    }


def _plain_conv(sd, t):
    return {"kernel": np.transpose(sd[f"{t}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{t}.bias"]}


def _c2f(sd, t, n):
    p = {"cv1": _conv_bn(sd, f"{t}.cv1"), "cv2": _conv_bn(sd, f"{t}.cv2")}
    for i in range(n):
        p[f"m{i}"] = {"cv1": _conv_bn(sd, f"{t}.m.{i}.cv1"),
                      "cv2": _conv_bn(sd, f"{t}.m.{i}.cv2")}
    return p


def export_ultralytics_state_dict(params: Dict, has_pose: bool = False
                                  ) -> Dict[str, Any]:
    """Inverse of :func:`convert_ultralytics_state_dict`: emit this
    module's params under ultralytics YOLOv8 key names (``0.conv.weight``
    …).  Used to synthesize checkpoints in the real torch file layout so
    the weight-drop parity harness (scripts/parity_drop.py) is testable
    end-to-end without the real downloads, and to round-trip-test the
    converter's name bijection."""
    sd: Dict[str, Any] = {}

    def put_conv_bn(t, node):
        sd[f"{t}.conv.weight"] = np.transpose(
            np.asarray(node["conv"]["kernel"]), (3, 2, 0, 1))
        sd[f"{t}.bn.weight"] = np.asarray(node["bn"]["scale"])
        sd[f"{t}.bn.bias"] = np.asarray(node["bn"]["bias"])
        sd[f"{t}.bn.running_mean"] = np.asarray(node["bn"]["mean"])
        sd[f"{t}.bn.running_var"] = np.asarray(node["bn"]["var"])
        sd[f"{t}.bn.num_batches_tracked"] = np.asarray(0)

    def put_plain(t, node):
        sd[f"{t}.weight"] = np.transpose(np.asarray(node["kernel"]),
                                         (3, 2, 0, 1))
        sd[f"{t}.bias"] = np.asarray(node["bias"])

    p = params["params"]
    for ours, idx in _BACKBONE_MAP:
        node = p[ours]
        if "cv1" in node:                               # c2f or sppf
            put_conv_bn(f"{idx}.cv1", node["cv1"])
            put_conv_bn(f"{idx}.cv2", node["cv2"])
            ms = sorted((k for k in node
                         if k.startswith("m") and k[1:].isdigit()),
                        key=lambda k: int(k[1:]))   # m10 after m9
            for k in ms:
                put_conv_bn(f"{idx}.m.{k[1:]}.cv1", node[k]["cv1"])
                put_conv_bn(f"{idx}.m.{k[1:]}.cv2", node[k]["cv2"])
        else:
            put_conv_bn(idx, node)
    for i in range(3):
        d = p[f"detect{i}"]
        put_conv_bn(f"22.cv2.{i}.0", d["box0"])
        put_conv_bn(f"22.cv2.{i}.1", d["box1"])
        put_plain(f"22.cv2.{i}.2", d["box2"])
        put_conv_bn(f"22.cv3.{i}.0", d["cls0"])
        put_conv_bn(f"22.cv3.{i}.1", d["cls1"])
        put_plain(f"22.cv3.{i}.2", d["cls2"])
        if has_pose and f"pose{i}" in p:
            k = p[f"pose{i}"]
            put_conv_bn(f"22.cv4.{i}.0", k["kpt0"])
            put_conv_bn(f"22.cv4.{i}.1", k["kpt1"])
            put_plain(f"22.cv4.{i}.2", k["kpt2"])
    # the DFL bin-expectation conv the converter deliberately skips
    sd["22.dfl.conv.weight"] = np.arange(16, dtype=np.float32).reshape(
        1, 16, 1, 1)
    return sd


def convert_ultralytics_state_dict(sd: Dict[str, Any], variant: str = "n",
                                   has_pose: bool = False) -> Dict:
    """Convert ``model.model.state_dict()`` of an ultralytics YOLOv8 (keys
    like ``model.0.conv.weight``) into this module's params.  The DFL conv
    (fixed bin-expectation weights) is folded into our softmax decode and is
    skipped."""
    sd = {k[len("model."):] if k.startswith("model.") else k:
          (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    d_scale = VARIANTS[variant][0]
    n2 = max(1, round(3 * d_scale))
    n3 = max(1, round(6 * d_scale))
    depths = {"c2f1": n2, "c2f2": n3, "c2f3": n3, "c2f4": n2,
              "neck1": n2, "neck2": n2, "neck3": n2, "neck4": n2}
    p: Dict[str, Any] = {}
    for ours, idx in _BACKBONE_MAP:
        if ours.startswith(("c2f", "neck")) and not ours.startswith("neck_"):
            p[ours] = _c2f(sd, idx, depths[ours])
        elif ours == "sppf":
            p[ours] = {"cv1": _conv_bn(sd, f"{idx}.cv1"),
                       "cv2": _conv_bn(sd, f"{idx}.cv2")}
        else:
            p[ours] = _conv_bn(sd, idx)
    head = "22"
    for i in range(3):
        p[f"detect{i}"] = {
            "box0": _conv_bn(sd, f"{head}.cv2.{i}.0"),
            "box1": _conv_bn(sd, f"{head}.cv2.{i}.1"),
            "box2": _plain_conv(sd, f"{head}.cv2.{i}.2"),
            "cls0": _conv_bn(sd, f"{head}.cv3.{i}.0"),
            "cls1": _conv_bn(sd, f"{head}.cv3.{i}.1"),
            "cls2": _plain_conv(sd, f"{head}.cv3.{i}.2"),
        }
        if has_pose:
            p[f"pose{i}"] = {
                "kpt0": _conv_bn(sd, f"{head}.cv4.{i}.0"),
                "kpt1": _conv_bn(sd, f"{head}.cv4.{i}.1"),
                "kpt2": _plain_conv(sd, f"{head}.cv4.{i}.2"),
            }
    return {"params": p}


def init_params(model: YoloV8, key=None, img: int = 640) -> Dict:
    """Random-init params (the reference's no-weights fallback).  Jitted:
    eager init dispatches hundreds of op-by-op compiles on TPU."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return jax.jit(model.init, static_argnums=())(
        key, jnp.zeros((1, img, img, 3), jnp.float32))
