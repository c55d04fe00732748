"""The fused, device-resident lameness engine.

This is what the reference's nine NATS hops collapse into (SURVEY.md §3.1):
a per-clip-batch device pipeline that runs

  frames ─ letterbox ─→ YOLO detect (DFL + batched NMS)
        ├─ primary-box select (largest valid cow, full-frame fallback
        │   mirroring tleap:295-304)
        ├─ SAM: 1024² pad → ViT encoder → box-prompted mask decoder
        │   (or the reference's bbox-rectangle fallback, sam3:94-100)
        ├─ DINO: 224² resize-crop → ViT-B/14 → mean-pooled 768-d embeddings
        ├─ pose: trained head when loaded, else anatomical heuristic
        │   (tleap:199-265) → locomotion features on device
        └─ 44-d sequence features → TCN + GaitTransformer heads with
            vmapped MC-dropout

with intermediate tensors staying in HBM end to end.  Stage sampling rates
follow the reference (YOLO/SAM 2 FPS, DINO 1 FPS, pose 5 FPS over the 5 s
canonical clip).

Execution modes:
- ``staged`` (default): each stage is its own jitted program; arrays flow
  between stages without leaving the device.  Compiles in seconds per
  stage — the remote-compile TPU service cannot digest the single fused
  HLO of the full graph.
- ``monolith``: everything in ONE jit (available for backends with a local
  compiler; same math).

The host shell (``serve/driver.py``) pads clip batches and converts
outputs into the schema-exact result JSONs.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..models import dino as dino_mod
from ..models import pose as pose_mod
from ..models import sequence_features as seqf
from ..models.gait_transformer import GaitTransformer
from ..models.sam import Sam, build_sam
from ..models.tcn import TCN
from ..models.yolo import YoloV8, detect, init_params
from ..ops import preprocess as prep
from ..ops.boxes import clip_boxes
from ..ops.preprocess import letterbox, pad_to_square, unletterbox_boxes


def _pack_leaves_u8(leaves):
    """Traced: flatten a list of device arrays into ONE uint8 buffer.

    Device→host readback over the tunnel pays a ~30 ms round trip PER
    transfer, and the output tree has ~25 leaves — per-leaf
    ``np.asarray`` costs ~0.75 s/batch in RTTs alone.  Bitcasting every
    leaf to raw bytes and concatenating lets the host fetch the whole
    tree with ONE ``device_get``; ``unpack_output`` restores shapes and
    dtypes exactly (bitcast is lossless; bool travels as uint8 0/1).

    Dispatching this program right after a batch's stage programs also
    queues it AHEAD of the next batch on the device FIFO, so a later
    sync doesn't wait behind the next batch's compute (the ld_iter
    finding, docs/PROBES_r03.json).
    """
    parts = []
    for x in leaves:
        if x.dtype == jnp.bool_:
            parts.append(x.astype(jnp.uint8).reshape(-1))
        elif x.dtype == jnp.uint8:
            parts.append(x.reshape(-1))
        else:
            parts.append(
                jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1))
    return jnp.concatenate(parts)


@dataclasses.dataclass
class EngineSpec:
    """Static geometry of the fused step (one XLA signature per spec)."""
    clip_frames: int = 125           # canonical 5 s @ 25 fps
    frame_height: int = 720
    frame_width: int = 1280
    fps: int = 25
    yolo_size: int = 640
    pose_size: int = 640             # trained pose-model input canvas
    dino_size: int = 224
    sam_size: int = 1024
    max_det: int = 8
    use_sam_model: bool = True       # False => bbox-rectangle mask fallback
    sam_mask_size: int = 256         # decoder low-res mask side
    dtype: Any = jnp.float32
    # split-resolution ingest: det/SAM frames stay at frame_* (the
    # canonical coordinate space) while dino/pose frames transfer at a
    # reduced lo_* geometry — neither consumer reads more than ~640 px
    # of width (dino: 224² crop, pose: 640 letterbox whose content from
    # 720p is already 640×360), so the wire carries fewer bytes with the
    # same model-input information.  All boxes/keypoints stay in hi
    # (frame_*) coordinates; only pixels ride the lo array.
    lo_height: Optional[int] = None
    lo_width: Optional[int] = None
    # rect-canvas SAM (serving knob LAMENESS_SAM_RECT): encode the
    # pad-free (h·ratio, sam_size) canvas instead of the padded square —
    # a 16:9 frame drops 4096 -> 2304 encoder tokens (global attention
    # ~3x less work, windowed layers ~40% less).  NOT bit-parity with the
    # reference's always-square canvas: pad tokens there participate in
    # attention, so content activations differ slightly; default OFF.
    sam_rect: bool = False
    # heuristic-pose wire trim: the heuristic keypoint path
    # (models/pose.py::heuristic_keypoints_device, the reference's
    # tleap:199-265 fallback) derives keypoints from the nearest-det
    # bbox alone — it never reads pose-frame PIXELS.  With no trained
    # pose model installed, pose-only frames (pose_idx minus det∪dino)
    # are transferred and then never read by any stage, so
    # ``pose_pixels=False`` drops them from the packed/lo arrays:
    # split-ingest wire ~18 → ~11 MB/clip, native packed 33 → 15 rows.
    # Outputs are bit-identical (the dropped rows were unread).  A spec
    # without pose pixels cannot run a trained pose model —
    # install_pose_params refuses with guidance.
    pose_pixels: bool = True
    # single-chip memory governor for the big SAM encoders: encode the
    # B·Td detection frames in sequential sub-batches of this size
    # (lax.map) instead of one batched call — peak encoder activation
    # memory scales with the CHUNK, not the batch, so vit_h fits batch 8
    # on one chip (VERDICT r4 item 2; the OOM was activations, params are
    # only ~1.2 GB bf16).  0 = whole batch in one call (vit_b default).
    # Bench knob: LAMENESS_SAM_CHUNK.
    sam_encode_chunk: int = 0

    # stage frame subsets (reference sampling rules, SURVEY §6)
    @property
    def det_idx(self):               # 2 FPS → every fps//2 frames
        return np.arange(0, self.clip_frames, max(1, self.fps // 2))

    @property
    def dino_idx(self):              # 1 FPS
        return np.arange(0, self.clip_frames, max(1, self.fps))

    @property
    def pose_idx(self):              # 5 FPS
        return np.arange(0, self.clip_frames, max(1, self.fps // 5))

    # -- packed device input -------------------------------------------------
    # No stage reads frames outside det ∪ dino ∪ pose (33 of 125 for the
    # canonical clip), so device inputs carry only those P rows
    # ((B, P, H, W, 3)) — host→HBM transfer drops ~3.8×, which dominates
    # end-to-end latency on bandwidth-limited links.  Stage gathers index
    # by *position within the packed array*; temporal logic (e.g. the
    # pose→nearest-det-frame mapping) still uses the original indices.
    @property
    def packed_idx(self):
        subsets = [self.det_idx, self.dino_idx]
        if self.pose_pixels:
            subsets.append(self.pose_idx)
        return np.unique(np.concatenate(subsets))

    @property
    def n_packed(self) -> int:
        return int(len(self.packed_idx))

    @property
    def det_pos(self):
        return np.searchsorted(self.packed_idx, self.det_idx)

    @property
    def dino_pos(self):
        return np.searchsorted(self.packed_idx, self.dino_idx)

    @property
    def pose_pos(self):
        assert self.pose_pixels, \
            "pose frames are not packed (pose_pixels=False)"
        return np.searchsorted(self.packed_idx, self.pose_idx)

    def pack_frames(self, frames):
        """(B, T, H, W, 3) with T == clip_frames → (B, P, H, W, 3); a
        passthrough if already packed."""
        t = frames.shape[1]
        if t == self.n_packed:
            return frames
        assert t == self.clip_frames, \
            f"expected {self.clip_frames} (full) or {self.n_packed} " \
            f"(packed) frames, got {t}"
        return frames[:, self.packed_idx]

    # -- split-resolution ingest ---------------------------------------------
    @property
    def split(self) -> bool:
        return self.lo_height is not None

    @property
    def hi_idx(self):                # det ∪ SAM frames (SAM reuses det)
        return self.det_idx

    @property
    def lo_idx(self):                # dino ∪ pose frames
        if not self.pose_pixels:
            return self.dino_idx
        return np.unique(np.concatenate([self.dino_idx, self.pose_idx]))

    @property
    def dino_pos_lo(self):
        return np.searchsorted(self.lo_idx, self.dino_idx)

    @property
    def pose_pos_lo(self):
        assert self.pose_pixels, \
            "pose frames are not in the lo array (pose_pixels=False)"
        return np.searchsorted(self.lo_idx, self.pose_idx)

    def split_pack_host(self, frames) -> Dict[str, np.ndarray]:
        """Host-side split pack: (B, T|P, H, W, 3) uint8 RGB at ANY
        source resolution → {"hi": (B, Th, frame_h, frame_w, 3),
        "lo": (B, Tl, lo_h, lo_w, 3)} with cv2 bilinear resizes.
        Accepts full clips (T == clip_frames) or packed arrays
        (T == n_packed, rows ordered by packed_idx)."""
        import cv2
        assert self.split, "split_pack_host needs lo_height/lo_width"
        frames = np.asarray(frames)
        t = frames.shape[1]
        if t == self.clip_frames:
            hi_rows, lo_rows = self.hi_idx, self.lo_idx
        else:
            assert t == self.n_packed, \
                f"expected {self.clip_frames} or {self.n_packed} frames, " \
                f"got {t}"
            hi_rows = np.searchsorted(self.packed_idx, self.hi_idx)
            lo_rows = np.searchsorted(self.packed_idx, self.lo_idx)

        def rs(sub, w, h):
            if sub.shape[-3] == h and sub.shape[-2] == w:
                return np.ascontiguousarray(sub)
            return np.stack([
                np.stack([cv2.resize(f, (w, h),
                                     interpolation=cv2.INTER_LINEAR)
                          for f in clip]) for clip in sub])
        return {"hi": rs(frames[:, hi_rows], self.frame_width,
                         self.frame_height),
                "lo": rs(frames[:, lo_rows], self.lo_width,
                         self.lo_height)}


def unpad_mask_logits(masks: jnp.ndarray, mh: int, mw: int,
                      out_size: int) -> jnp.ndarray:
    """(N, Hm, Wm) low-res logits over the (possibly padded) canvas ->
    (N, out, out) over the FRAME: slice the content region [:mh, :mw] and
    rescale.  Static-shape analog of the reference predictor's
    unpad+resize (segment_anything postprocess, models/sam.py::
    postprocess_mask).  Handles the rect-canvas mode's non-square input."""
    if masks.shape[-2:] == (out_size, out_size) \
            and (mh, mw) == (out_size, out_size):
        return masks
    return jax.vmap(lambda m: jax.image.resize(
        m[:mh, :mw], (out_size, out_size), "linear"))(masks)


class LamenessEngine:
    """Owns model defs + params, staged jits, and the optional monolith."""

    def __init__(self, config: Optional[Config] = None,
                 spec: Optional[EngineSpec] = None,
                 rng: Optional[jax.Array] = None,
                 init_models: bool = True):
        self.config = config or Config()
        self.spec = spec or EngineSpec()
        # the config memory governor flows onto the spec even for
        # init_models=False engines (the parity/rect-harness pattern
        # installs .sam manually and still needs chunked encoding)
        if self.config.sam.encode_chunk and not self.spec.sam_encode_chunk:
            self.spec.sam_encode_chunk = self.config.sam.encode_chunk
        if not init_models:
            return
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 5)
        s = self.spec
        self.yolo = YoloV8(variant="n", num_classes=self.config.yolo.num_classes)
        self.dino = dino_mod.DinoV2()       # ViT-B/14, dinov2-base geometry
        # variant geometry from config (vit_b/vit_l/vit_h — the
        # reference selects by checkpoint name, sam3:51-72)
        self.sam = build_sam(self.config.sam.variant, img_size=s.sam_size,
                             encoder_remat=self.config.sam.encoder_remat) \
            if s.use_sam_model else None
        self.tcn = TCN(input_dim=44)
        self.gait = GaitTransformer(input_dim=44)
        # jit every init: eager init is pathologically slow on remote-compile
        # TPU backends (each op dispatches its own compilation)
        self.params: Dict[str, Any] = {}
        self.params["yolo"] = init_params(self.yolo, ks[0], img=s.yolo_size)
        self.params["dino"] = jax.jit(self.dino.init)(
            ks[1], jnp.zeros((1, s.dino_size, s.dino_size, 3), s.dtype))
        if self.sam is not None:
            self.params["sam"] = jax.jit(self.sam.init)(
                ks[2], jnp.zeros((1, s.sam_size, s.sam_size, 3), s.dtype),
                jnp.zeros((1, 4)))
        self.params["tcn"] = jax.jit(self.tcn.init)(
            ks[3], jnp.zeros((1, seqf.TARGET_LEN, 44)))
        self.params["gait"] = jax.jit(self.gait.init)(
            ks[4], jnp.zeros((1, seqf.TARGET_LEN, 44)),
            jnp.zeros((1, seqf.TARGET_LEN), bool))
        self.pose_model = None       # created when pose weights install
        self.loaded_weights = {k: False for k in
                               ("yolo", "dino", "sam", "pose", "tcn", "gait")}
        self._build_jits()

    def with_spec(self, spec: "EngineSpec") -> "LamenessEngine":
        """A second engine over the SAME models + params (device arrays
        shared — no re-init, no extra HBM) with a different static
        geometry.  Model input sizes (yolo/pose/dino/sam canvases) must
        match; only the frame geometry may differ."""
        s = self.spec
        assert (spec.yolo_size, spec.pose_size, spec.dino_size,
                spec.sam_size) == (s.yolo_size, s.pose_size, s.dino_size,
                                   s.sam_size), \
            "with_spec shares params: model input sizes must match"
        if self.loaded_weights.get("pose") and not spec.pose_pixels:
            raise ValueError(
                "with_spec: a trained pose model is installed but the new "
                "spec has pose_pixels=False (no pose frames on the wire)")
        # compute dtype follows the shared params' precision policy — a
        # fresh spec's default f32 would silently promote bf16-cast params
        # back to f32 compute (≈30% slower on v5e, no accuracy gain)
        spec.dtype = s.dtype
        eng = LamenessEngine(config=self.config, spec=spec,
                             init_models=False)
        eng.yolo, eng.dino, eng.sam = self.yolo, self.dino, self.sam
        eng.tcn, eng.gait = self.tcn, self.gait
        eng.pose_model = self.pose_model
        eng.params = self.params
        eng.loaded_weights = self.loaded_weights
        eng._build_jits()
        return eng

    def _build_jits(self):
        self._jit_detect = jax.jit(self._detect_stage)
        self._jit_sam = jax.jit(self._sam_stage)
        self._jit_dino = jax.jit(self._dino_stage)
        self._jit_heads = jax.jit(self._heads_stage)
        self._jit_front = jax.jit(self._front_stage)
        self._jit_back = jax.jit(self._back_stage)
        self._fused = jax.jit(self._fused_step)
        from ..video.yuv import i420_to_rgb_device
        self._jit_yuv = jax.jit(i420_to_rgb_device)
        self._flat_yuv_jits = {}
        self._jit_pack_out = jax.jit(_pack_leaves_u8)

    # -- transfer format -----------------------------------------------------
    def default_transfer(self) -> str:
        """'yuv420' on TPU backends (I420 planes halve host→HBM bytes on
        the bandwidth-limited link; the device rebuilds RGB in one tiny
        fused program within ±1 LSB of the decoder's own conversion —
        video/yuv.py), 'rgb' elsewhere.  LAMENESS_YUV_INGEST=0 forces
        rgb; =1 forces yuv420."""
        import os
        env = os.environ.get("LAMENESS_YUV_INGEST")
        if env == "0":
            return "rgb"
        if env == "1":
            return "yuv420"
        return "yuv420" if jax.default_backend() == "tpu" else "rgb"

    def to_device(self, frames: np.ndarray, transfer: Optional[str] = None):
        """Pack host frames and move them to the device, returning
        device-resident RGB ready for run_staged/run_paired.

        frames: (B, T|P, H, W, 3) uint8 RGB.  transfer='yuv420' converts
        to I420 on host (cv2 SIMD, ~1-2 ms/frame) so the wire carries
        1.5 bytes/pixel instead of 3.

        With an inference mesh installed (``shard_inference``) the batch
        is padded to the data-axis size and placed SHARDED: each chip
        receives exactly its clips' bytes over its own host link (the
        yuv path uses the batch-major row packing, ``pack_i420_rows``).
        Callers that pass host frames through ``process_clip_batch`` get
        the padding trimmed back automatically."""
        transfer = transfer or self.default_transfer()
        mesh = getattr(self, "_mesh", None)
        if self.spec.split:
            tree = frames if isinstance(frames, dict) \
                else self.spec.split_pack_host(frames)
        else:
            tree = self.spec.pack_frames(np.asarray(frames))
        if mesh is not None:
            return self._to_device_sharded(tree, transfer, mesh)
        if transfer == "yuv420":
            from ..video.yuv import pack_i420_flat, rgb_to_i420
            i420 = {k: rgb_to_i420(v) for k, v in tree.items()} \
                if isinstance(tree, dict) else rgb_to_i420(tree)
            flat, layout = pack_i420_flat(i420)
            return self.yuv_flat_jit(layout)(jax.device_put(flat))
        # explicit device_put: feeding numpy straight into jit takes a slow
        # per-call transfer path on tunnelled TPU backends (and a
        # jnp.asarray hop commits via the default route before the put)
        return jax.device_put(dict(tree) if isinstance(tree, dict)
                              else tree)

    def _to_device_sharded(self, tree, transfer: str, mesh):
        """Data-parallel placement of a packed host frame tree: pad the
        batch to a data-axis multiple, then put each chip its own rows.
        RGB goes straight through a batch-sharded device_put; I420 rides
        the (B, row_bytes) packing so one contiguous per-chip transfer
        carries each clip's full byte stream."""
        from ..parallel.mesh import (DATA_AXIS, batch_sharding,
                                     pad_batch_to_multiple)
        dp = mesh.shape[DATA_AXIS]
        tree, _ = pad_batch_to_multiple(tree, dp)
        if transfer == "yuv420":
            from ..video.yuv import pack_i420_rows, rgb_to_i420
            i420 = {k: rgb_to_i420(v) for k, v in tree.items()} \
                if isinstance(tree, dict) else rgb_to_i420(tree)
            rows, layout = pack_i420_rows(i420)
            rows_dev = jax.device_put(rows, batch_sharding(mesh))
            return self.yuv_rows_jit(layout)(rows_dev)
        return jax.device_put(dict(tree) if isinstance(tree, dict)
                              else tree, batch_sharding(mesh))

    def yuv_rows_jit(self, layout):
        """Jitted (B, row_bytes) I420 buffer → RGB frame tree for a static
        layout — the sharded-ingest sibling of yuv_flat_jit.  The input
        arrives batch-sharded over the mesh and every op preserves the
        leading axis, so the program partitions with zero collectives."""
        key = ("rows",) + layout
        jit = self._flat_yuv_jits.get(key)
        if jit is None:
            from ..video.yuv import i420_rows_to_rgb_device
            jit = jax.jit(
                lambda rows: i420_rows_to_rgb_device(rows, layout))
            self._flat_yuv_jits[key] = jit
        return jit

    def yuv_flat_jit(self, layout):
        """Jitted flat-I420-buffer → RGB frame tree for a static layout
        (one program: static slices + the fused BT.601 conversion).  The
        whole batch rides the wire as ONE contiguous put — the tunnel's
        effective rate halves below ~64 MB per transfer (ld_put_idle,
        docs/PROBES_r03.json)."""
        jit = self._flat_yuv_jits.get(layout)
        if jit is None:
            from ..video.yuv import i420_flat_to_rgb_device
            jit = jax.jit(
                lambda flat: i420_flat_to_rgb_device(flat, layout))
            self._flat_yuv_jits[layout] = jit
        return jit

    def pack_output(self, out):
        """Dispatch the flat-readback program on an output tree.

        Returns (flat_dev_u8, meta); fetch with
        ``unpack_output(np.asarray(flat_dev_u8), meta)``.  Call this
        right after dispatching the stages that produced ``out`` so the
        pack program queues BEFORE any later batch's stages — a sync
        that waits behind the next batch's compute serializes the
        stream loop (ld_iter, docs/PROBES_r03.json)."""
        leaves, treedef = jax.tree_util.tree_flatten(out)
        flat = self._jit_pack_out(leaves)
        layout = [(tuple(l.shape), np.dtype(l.dtype)) for l in leaves]
        return flat, (treedef, layout)

    @staticmethod
    def unpack_output(buf: np.ndarray, meta) -> Dict[str, np.ndarray]:
        """Host-side inverse of pack_output: ONE fetched uint8 buffer →
        the numpy output tree, shapes/dtypes restored exactly."""
        treedef, layout = meta
        buf = np.asarray(buf)
        leaves = []
        off = 0
        for shape, dtype in layout:
            n = int(np.prod(shape, dtype=np.int64))
            if dtype == np.bool_:
                nbytes = n
                arr = buf[off:off + nbytes].astype(bool).reshape(shape)
            else:
                nbytes = n * dtype.itemsize
                # .copy() re-allocates aligned memory so the view is safe
                # at any byte offset
                arr = (buf[off:off + nbytes].copy().view(dtype)
                       .reshape(shape))
            leaves.append(arr)
            off += nbytes
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # -- paired programs (mode="pair"): halve per-clip dispatches ------------
    def _front_stage(self, params, frames):
        """detect + dino in ONE program — they are independent, so XLA
        can overlap their compute, and a high-latency dispatch path (the
        remote tunnel) pays 2 round trips per clip instead of 4."""
        out = dict(self._detect_stage(params, frames))
        out.update(self._dino_stage(params, frames))
        return out

    def _back_stage(self, params, frames, primary_bt, score_bt, dropout_rng):
        """sam + heads in one program (both consume the primaries)."""
        out = dict(self._sam_stage(params, frames, primary_bt))
        out.update(self._heads_stage(params, frames, primary_bt, score_bt,
                                     dropout_rng))
        return out

    # -- weight loading hooks ------------------------------------------------
    def load_torch_weights(self, name: str, state_dict) -> None:
        """Convert + install torch weights for a sub-model."""
        if name == "dino":
            self.params["dino"] = dino_mod.convert_hf_state_dict(state_dict)
        elif name == "sam":
            from ..models.sam import (build_sam, convert_hf_state_dict,
                                      detect_sam_layout, infer_variant,
                                      sa_to_hf_state_dict)
            if detect_sam_layout(state_dict) == "sa":
                # original segment-anything .pth (the reference registry's
                # files, sam3:51-72): pure key rename, same tensors
                state_dict = sa_to_hf_state_dict(state_dict)
            params = convert_hf_state_dict(state_dict)
            dim = params["params"]["vision_encoder"]["pos_embed"].shape[-1]
            if self.sam is not None and dim != self.sam.encoder_dim:
                # checkpoint geometry wins over config (the reference
                # selects the variant by checkpoint name, sam3:51-72);
                # the remat knob must survive the rebuild
                self.sam = build_sam(
                    infer_variant(dim), img_size=self.spec.sam_size,
                    encoder_remat=self.config.sam.encoder_remat)
            self.params["sam"] = params
        elif name == "yolo":
            from ..models.yolo import convert_ultralytics_state_dict as conv
            self.params["yolo"] = conv(state_dict)
        elif name == "pose":
            # trained 20-kp cow pose model (tleap:122-137's
            # cow_pose_roboflow.pt): the pose-variant YoloV8
            from ..models.yolo import convert_ultralytics_state_dict as conv
            self.install_pose_params(conv(state_dict, has_pose=True))
            return
        else:
            raise ValueError(name)
        self.loaded_weights[name] = True
        self._maybe_recast(name)
        self._build_jits()

    def _maybe_recast(self, name: str) -> None:
        """Weights installed AFTER apply_engine_policy must follow the
        active precision policy, or their f32 params silently drag the
        whole stage back to f32 compute."""
        if self.spec.dtype != jnp.bfloat16 or name not in self.params:
            return
        from .precision import recast_installed
        self.params[name] = recast_installed(name, self.params[name])

    def install_pose_params(self, params) -> None:
        """Install trained pose-model params (from load_torch_weights or a
        pipeline/pose_training.py checkpoint) and switch _heads_stage from
        the anatomical heuristic to trained inference with per-frame
        heuristic fallback (tleap:142-197's hybrid)."""
        if not self.spec.pose_pixels:
            raise ValueError(
                "this engine's spec has pose_pixels=False (heuristic-pose "
                "wire trim: no pose frames are transferred) — rebuild with "
                "EngineSpec(pose_pixels=True) to run a trained pose model")
        if self.pose_model is None:
            self.pose_model = YoloV8(variant="n", num_classes=1,
                                     num_keypoints=pose_mod.NUM_KEYPOINTS)
        self.params["pose"] = params
        self.loaded_weights["pose"] = True
        self._maybe_recast("pose")
        self._build_jits()

    # -- stage 1: detection --------------------------------------------------
    def _primary_boxes(self, boxes, scores, classes, valid,
                       h: float, w: float):
        """Largest-area valid COW box per frame (tleap:295-304 filters on
        the cow class).  Only when NO cow is detected does the largest
        high-confidence non-cow detection stand in, then the full-frame
        0.1-margin fallback.  boxes: (N, K, 4)."""
        cow = self.config.yolo.cow_class_id
        areas = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
            jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)
        cow_areas = jnp.where(valid & (classes == cow), areas, -1.0)
        any_areas = jnp.where(valid & (scores > 0.5), areas, -1.0)
        has_cow = cow_areas.max(axis=-1) > 0                   # (N,)
        has_any = any_areas.max(axis=-1) > 0
        pick = jnp.where(has_cow[:, None], cow_areas, any_areas)
        best = jnp.argmax(pick, axis=-1)                       # (N,)
        take = jax.vmap(lambda b, i: b[i])
        pb = take(boxes, best)
        ps = take(scores, best)
        has = has_cow | has_any
        fallback = jnp.asarray([0.1 * w, 0.1 * h, 0.9 * w, 0.9 * h])
        pb = jnp.where(has[:, None], pb, fallback)
        ps = jnp.where(has, ps, 0.5)
        return pb, ps, has

    # -- stage frame accessors (single packed array OR split dict) -----------
    def _det_frames(self, frames):
        """det/SAM subset + its pixel geometry (always hi space)."""
        s = self.spec
        if isinstance(frames, dict):
            return frames["hi"], s.frame_height, s.frame_width
        return frames[:, s.det_pos], s.frame_height, s.frame_width

    def _dino_frames(self, frames):
        s = self.spec
        if isinstance(frames, dict):
            return frames["lo"][:, s.dino_pos_lo], s.lo_height, s.lo_width
        return frames[:, s.dino_pos], s.frame_height, s.frame_width

    def _pose_frames(self, frames):
        s = self.spec
        if isinstance(frames, dict):
            return frames["lo"][:, s.pose_pos_lo], s.lo_height, s.lo_width
        return frames[:, s.pose_pos], s.frame_height, s.frame_width

    def _detect_stage(self, params, frames):
        """frames: (B, P, H, W, 3) packed uint8 (or split dict) → boxes +
        primaries, all in hi (frame_*) coordinates."""
        s = self.spec
        det_frames, h, w = self._det_frames(frames)
        b = det_frames.shape[0]
        td = det_frames.shape[1]
        flat = det_frames.reshape(b * td, h, w, 3)
        canvases, ratio, pad = jax.vmap(
            lambda f: letterbox(f, s.yolo_size))(flat)
        yolo_out = self.yolo.apply(params["yolo"], canvases.astype(s.dtype))
        det = detect(yolo_out["levels"],
                     conf_threshold=self.config.yolo.confidence_threshold,
                     max_det=s.max_det)
        boxes = jax.vmap(unletterbox_boxes)(det["boxes"], ratio, pad)
        boxes = clip_boxes(boxes, float(h), float(w))
        primary, primary_score, primary_valid = self._primary_boxes(
            boxes, det["scores"], det["classes"], det["valid"],
            float(h), float(w))
        return {
            "det_boxes": boxes.reshape(b, td, s.max_det, 4),
            "det_scores": det["scores"].reshape(b, td, s.max_det),
            "det_classes": det["classes"].reshape(b, td, s.max_det),
            "det_valid": det["valid"].reshape(b, td, s.max_det),
            "primary_boxes": primary.reshape(b, td, 4),
            "primary_scores": primary_score.reshape(b, td),
            "primary_valid": primary_valid.reshape(b, td),
        }

    def _sam_fused_active(self) -> bool:
        """Whether the SAM encoder's global layers use the fused Pallas
        kernel (mirrors VisionAttention's auto rule)."""
        if self.sam is None:
            return False
        fused = self.sam.fused_global
        if fused is None:
            g = self.spec.sam_size // 16
            fused = jax.default_backend() == "tpu" and g >= 32
        return bool(fused)

    # -- stage 2: segmentation ----------------------------------------------
    def _sam_stage(self, params, frames, primary_bt):
        """frames: (B, P, H, W, 3) packed (or split dict);
        primary_bt: (B, Td, 4) in hi coordinates."""
        s = self.spec
        det_frames, h, w = self._det_frames(frames)
        b = det_frames.shape[0]
        td = det_frames.shape[1]
        flat = det_frames.reshape(b * td, h, w, 3)
        primary = primary_bt.reshape(b * td, 4)
        if self.sam is not None:
            sam_ratio = s.sam_size / max(h, w)
            if s.sam_rect:
                # pad-free rect canvas: content dims rounded up to the
                # patch grid (16 px) — see EngineSpec.sam_rect
                ch = -(-int(round(h * sam_ratio)) // 16) * 16
                cw = -(-int(round(w * sam_ratio)) // 16) * 16
            else:
                ch = cw = s.sam_size
            sam_in = jax.vmap(
                lambda f: prep.pad_to_rect(f, (ch, cw), s.sam_size)[0])(flat)
            sam_in = prep.normalize(sam_in).astype(s.dtype)
            sam_boxes = primary * sam_ratio
            # content extent of the frame inside the (possibly padded)
            # canvas, in low-res-mask pixels (decoder upscales the token
            # grid 4x, so the mask canvas is (ch/4, cw/4))
            mh = int(round((ch // 4) * (h * sam_ratio) / ch))
            mw = int(round((cw // 4) * (w * sam_ratio) / cw))
            # bottom-padded canvas: pad token rows are image-independent,
            # so pre-global windowed layers compute them once per batch
            # (SamVisionEncoder content_rows; LAMENESS_SAM_PADSPLIT=0
            # kill switch).  Content rows only exist when the canvas is
            # the padded square and the frame is landscape.
            import os as _os
            crows = 0
            if (not s.sam_rect and w > h
                    and _os.environ.get("LAMENESS_SAM_PADSPLIT") != "0"):
                crows = -(-int(round(h * sam_ratio)) // 16)
            if self._sam_fused_active():
                # fused Pallas rel-pos attention never materialises the
                # (N, N) bias — all clip frames encode in one batch
                # (or in sam_encode_chunk sub-batches: peak activation
                # memory scales with the chunk, letting vit_h run b8)
                chunk = s.sam_encode_chunk
                n_img = sam_in.shape[0]
                if chunk and 0 < chunk < n_img:
                    pad = (-n_img) % chunk
                    si = jnp.concatenate(
                        [sam_in, sam_in[:pad]]) if pad else sam_in
                    emb = jax.lax.map(
                        lambda c: self.sam.apply(params["sam"], c, crows,
                                                 method=self.sam.encode),
                        si.reshape((-1, chunk) + si.shape[1:]))
                    emb = emb.reshape((-1,) + emb.shape[2:])[:n_img]
                else:
                    emb = self.sam.apply(params["sam"], sam_in, crows,
                                         method=self.sam.encode)
            else:
                # unfused path: the global-attention bias is (12, 4096,
                # 4096) f32 per frame — batching all frames would
                # materialize ~17 GB in HBM, so encode frame-by-frame
                emb = jax.lax.map(
                    lambda f: self.sam.apply(params["sam"], f[None],
                                             method=self.sam.encode)[0],
                    sam_in)
            masks, iou_pred = self.sam.apply(
                params["sam"], emb, sam_boxes, method=self.sam.decode_boxes)
            masks = masks[:, 0]
            iou_pred = iou_pred[:, 0]
            # decoder logits cover the PADDED square canvas (segment_anything
            # predictor unpads before returning, models/sam.py
            # postprocess_mask); downstream (driver._mask_features, the
            # rectangle fallback below, mask_area_frac) all treat the
            # low-res mask as FRAME space — slice the content region and
            # rescale so both paths share that convention
            masks = unpad_mask_logits(masks, mh, mw, s.sam_mask_size)
        else:
            # reference fallback: rectangle mask from the box (sam3:94-100)
            gy = jax.lax.broadcasted_iota(
                jnp.float32, (s.sam_mask_size, s.sam_mask_size), 0)
            gx = jax.lax.broadcasted_iota(
                jnp.float32, (s.sam_mask_size, s.sam_mask_size), 1)
            scale_y = s.sam_mask_size / h
            scale_x = s.sam_mask_size / w

            def rect(box):
                x1, y1 = box[0] * scale_x, box[1] * scale_y
                x2, y2 = box[2] * scale_x, box[3] * scale_y
                inside = (gx >= x1) & (gx < x2) & (gy >= y1) & (gy < y2)
                return jnp.where(inside, 10.0, -10.0)
            masks = jax.vmap(rect)(primary)
            iou_pred = jnp.ones((b * td,))
        mask_bits = masks > 0.0
        return {
            "masks": mask_bits.reshape(b, td, *mask_bits.shape[-2:]),
            "mask_iou_pred": iou_pred.reshape(b, td),
            "mask_area_frac": mask_bits.mean(axis=(-2, -1)).reshape(b, td),
        }

    # -- stage 3: embeddings -------------------------------------------------
    def _dino_stage(self, params, frames):
        s = self.spec
        dino_frames, h, w = self._dino_frames(frames)
        b = dino_frames.shape[0]
        tdn = dino_frames.shape[1]
        dino_in = dino_mod.preprocess_frames(
            dino_frames.reshape(b * tdn, h, w, 3)).astype(s.dtype)
        out = self.dino.apply(params["dino"], dino_in)
        return {"embeddings": out["pooled"].reshape(b, tdn, -1)}

    # -- trained pose inference (tleap:122-197's hybrid path) ----------------
    def _trained_pose(self, params, frames, pose_boxes):
        """Run the trained 20-kp pose model at 5 FPS; per-frame heuristic
        fallback where it finds nothing overlapping the primary box.

        Returns (kpts_old (B,Tp,20,3) in H_NAMES order for locomotion,
        kpts_model (B,Tp,20,3) in KEYPOINT_NAMES order for the result JSON,
        trained_mask (B,Tp))."""
        from ..models.yolo import detect as yolo_detect
        from ..ops.boxes import pairwise_iou
        s = self.spec
        b, tp = pose_boxes.shape[:2]
        pose_frames, ph, pw = self._pose_frames(frames)
        flat = pose_frames.reshape(b * tp, ph, pw, 3)
        canvases, ratio, pad = jax.vmap(
            lambda f: letterbox(f, s.pose_size))(flat)
        out = self.pose_model.apply(params["pose"], canvases.astype(s.dtype))
        det = yolo_detect(out["levels"],
                          conf_threshold=self.config.yolo.confidence_threshold,
                          max_det=4)
        boxes = jax.vmap(unletterbox_boxes)(det["boxes"], ratio, pad)
        kxy = (det["keypoints"][..., :2] - pad[:, None, None, :]) \
            / ratio[:, None, None, None]
        kconf = det["keypoints"][..., 2:]
        # split mode: unletterboxed coords are in lo pixel space — scale
        # to the canonical hi space (aspect ratios match, one factor)
        if pw != s.frame_width:
            sc = s.frame_width / pw
            boxes = boxes * sc
            kxy = kxy * sc
        prim = pose_boxes.reshape(b * tp, 4)
        iou = jax.vmap(pairwise_iou)(prim[:, None, :], boxes)[:, 0]  # (N, K)
        iou = jnp.where(det["valid"], iou, -1.0)
        best = jnp.argmax(iou, axis=-1)
        hit = jnp.take_along_axis(iou, best[:, None], axis=-1)[:, 0] > 0.1
        take = jax.vmap(lambda a, i: a[i])
        kpts_model = jnp.concatenate(
            [take(kxy, best), take(kconf, best)], axis=-1)   # (N, 20, 3)
        kpts_old = pose_mod.map_roboflow_to_old_device(kpts_model)
        heur = pose_mod.heuristic_keypoints_device(prim)
        kpts_old = jnp.where(hit[:, None, None], kpts_old, heur)
        # miss frames: zero the model-name rows (coords + confidence) so
        # the result JSON can't carry a padding slot's garbage keypoints
        # as confident-looking data; locomotion uses the heuristic rows
        kpts_model = jnp.where(hit[:, None, None], kpts_model, 0.0)
        return (kpts_old.reshape(b, tp, -1, 3),
                kpts_model.reshape(b, tp, -1, 3),
                hit.reshape(b, tp))

    # -- stage 4: pose + sequence heads --------------------------------------
    def _heads_stage(self, params, frames, primary_bt, score_bt, dropout_rng):
        """primary_bt: (B, Td, 4) det-frame boxes; heads run at 5 FPS."""
        s = self.spec
        b = primary_bt.shape[0]
        pose_frames_idx = s.pose_idx
        tp = len(pose_frames_idx)
        det_pos = np.asarray(s.det_idx)
        nearest = np.abs(pose_frames_idx[:, None] - det_pos[None, :]
                         ).argmin(axis=1)
        pose_boxes = primary_bt[:, nearest]                  # (B, Tp, 4)
        pose_scores = score_bt[:, nearest]
        pose_valid = jnp.ones((b, tp), bool)
        extra = {}
        if self.loaded_weights.get("pose") and self.pose_model is not None:
            kpts, kpts_model, trained_mask = self._trained_pose(
                params, frames, pose_boxes)
            extra = {"keypoints_model": kpts_model,
                     "pose_trained_mask": trained_mask}
        else:
            kpts = pose_mod.heuristic_keypoints_device(pose_boxes)

        loco = jax.vmap(pose_mod.locomotion_features_device)(
            kpts[..., :2], kpts[..., 2], pose_valid)
        feats, low_conf = jax.vmap(seqf.extract_from_arrays)(
            kpts[..., :2], kpts[..., 2], pose_boxes, pose_scores, pose_valid)
        pad_before = (seqf.TARGET_LEN - tp) // 2
        pad_after = seqf.TARGET_LEN - tp - pad_before
        feats_p = jnp.pad(feats, ((0, 0), (pad_before, pad_after), (0, 0)))
        mask_p = jnp.pad(low_conf, ((0, 0), (pad_before, pad_after)),
                         constant_values=True)

        n_mc = self.config.tcn.mc_samples
        keys = jax.random.split(dropout_rng, 2)

        def tcn_one(k):
            return self.tcn.apply(params["tcn"], feats_p, deterministic=False,
                                  rngs={"dropout": k})
        tcn_preds = jax.vmap(tcn_one)(jax.random.split(keys[0], n_mc))

        def gait_one(k):
            return self.gait.apply(params["gait"], feats_p, mask_p,
                                   deterministic=False,
                                   rngs={"dropout": k})["probability"]
        gait_preds = jax.vmap(gait_one)(jax.random.split(keys[1], n_mc))
        gait_det = self.gait.apply(params["gait"], feats_p, mask_p)

        return {
            **extra,
            "keypoints": kpts,
            "pose_boxes": pose_boxes,
            "locomotion": loco,
            "seq_features": feats_p,
            "seq_mask": mask_p,
            "tcn_probability": tcn_preds.mean(axis=0)[:, 0],
            "tcn_uncertainty": tcn_preds.std(axis=0, ddof=1)[:, 0],
            "gait_probability": gait_preds.mean(axis=0)[:, 0],
            "gait_uncertainty": gait_preds.std(axis=0, ddof=1)[:, 0],
            "gait_saliency": gait_det["saliency"],
        }

    # -- monolith (all four stages in one jit) -------------------------------
    def _fused_step(self, params, frames, dropout_rng):
        out = dict(self._detect_stage(params, frames))
        out.update(self._sam_stage(params, frames, out["primary_boxes"]))
        out.update(self._dino_stage(params, frames))
        out.update(self._heads_stage(params, frames, out["primary_boxes"],
                                     out["primary_scores"], dropout_rng))
        return out

    # -- public API ----------------------------------------------------------
    def _check_packed(self, frames_dev) -> None:
        if isinstance(frames_dev, dict):
            s = self.spec
            if (frames_dev["hi"].shape[1] != len(s.hi_idx)
                    or frames_dev["lo"].shape[1] != len(s.lo_idx)):
                raise ValueError(
                    f"split frames need hi T={len(s.hi_idx)} / "
                    f"lo T={len(s.lo_idx)}, got "
                    f"{frames_dev['hi'].shape[1]}/"
                    f"{frames_dev['lo'].shape[1]}")
            return
        if frames_dev.shape[1] != self.spec.n_packed:
            raise ValueError(
                f"expected packed frames (P={self.spec.n_packed}), got "
                f"T={frames_dev.shape[1]}; use spec.pack_frames() or "
                f"process_clip_batch")

    def run_staged(self, frames_dev: jnp.ndarray,
                   rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        """Chained per-stage jits; everything stays on device.

        frames_dev must be PACKED (B, P, H, W, 3) — see
        EngineSpec.pack_frames; callers with full clips should go through
        process_clip_batch, which packs before the transfer."""
        self._check_packed(frames_dev)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        with self._mesh_ctx():
            out = dict(self._jit_detect(self.params, frames_dev))
            out.update(self._jit_sam(self.params, frames_dev,
                                     out["primary_boxes"]))
            out.update(self._jit_dino(self.params, frames_dev))
            out.update(self._jit_heads(self.params, frames_dev,
                                       out["primary_boxes"],
                                       out["primary_scores"], rng))
        return out

    def _mesh_ctx(self):
        """The inference mesh as a context (nullcontext when unsharded):
        inside it jit partitions from the committed input shardings and
        places small uncommitted operands (rngs) replicated."""
        import contextlib
        mesh = getattr(self, "_mesh", None)
        return mesh if mesh is not None else contextlib.nullcontext()

    def run_paired(self, frames_dev: jnp.ndarray,
                   rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        """Two-program chain ([detect+dino] -> [sam+heads]): identical
        outputs to run_staged with half the dispatches — wins when
        per-dispatch latency is high (tunnelled backends); the 4-program
        mode stays the default because its smaller HLOs are known to
        compile on remote-compile services."""
        self._check_packed(frames_dev)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        with self._mesh_ctx():
            out = dict(self._jit_front(self.params, frames_dev))
            out.update(self._jit_back(self.params, frames_dev,
                                      out["primary_boxes"],
                                      out["primary_scores"], rng))
        return out

    def process_clip_batch(self, frames: np.ndarray,
                           rng: Optional[jax.Array] = None,
                           mode: str = "staged",
                           transfer: Optional[str] = None,
                           readback: bool = True
                           ) -> Dict[str, np.ndarray]:
        """frames: (B, T, H, W, 3) uint8 RGB, T == spec.clip_frames (packed
        host-side before transfer) or already packed (T == n_packed);
        device arrays pass through untouched (pre-transferred callers).
        transfer: see to_device — None picks the backend default.
        readback=False returns the on-device output tree without the
        blocking device→host copy — pipelined callers (process_stream's
        writer thread) read back off the dispatch path so batch N's
        readback/writes overlap batch N+1's compute."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        orig_b = None
        if isinstance(frames, jax.Array) or (
                isinstance(frames, dict)
                and all(isinstance(v, jax.Array) for v in frames.values())):
            frames_dev = frames
            self._check_packed(frames_dev)
        else:
            if getattr(self, "_mesh", None) is not None:
                # to_device pads the batch to the data-axis multiple;
                # remember the real size so the readback trims it
                leaf = next(iter(frames.values())) \
                    if isinstance(frames, dict) else frames
                orig_b = int(np.asarray(leaf).shape[0])
            frames_dev = self.to_device(frames, transfer)
        if mode == "monolith":
            with self._mesh_ctx():
                out = self._fused(self.params, frames_dev, rng)
        elif mode == "pair":
            out = self.run_paired(frames_dev, rng)
        else:
            out = self.run_staged(frames_dev, rng)
        if not readback:
            return out
        # one device_get for the whole tree — per-leaf np.asarray costs a
        # tunnel round trip per leaf (~25 leaves x ~30 ms)
        flat, meta = self.pack_output(out)
        out_np = self.unpack_output(np.asarray(flat), meta)
        if orig_b is not None:
            out_np = jax.tree_util.tree_map(lambda x: x[:orig_b], out_np)
        return out_np

    def warmup(self, batch: int = 1, mode: str = "staged") -> Dict[str, float]:
        """Compile all four stage programs concurrently on dummy inputs —
        the stages are independent, so cold-start wall time drops from the
        sum of the compiles to roughly the slowest one.  Returns per-stage
        compile seconds."""
        import threading
        import time as _time
        s = self.spec
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            # warm the SHARDED signature the serving path will hit: round
            # the batch to the data axis and place inputs like to_device/
            # the detect stage would
            from ..parallel.mesh import DATA_AXIS, batch_sharding
            batch = -(-batch // mesh.shape[DATA_AXIS]) \
                * mesh.shape[DATA_AXIS]
        if s.split:
            frames = {"hi": np.zeros((batch, len(s.hi_idx), s.frame_height,
                                      s.frame_width, 3), np.uint8),
                      "lo": np.zeros((batch, len(s.lo_idx), s.lo_height,
                                      s.lo_width, 3), np.uint8)}
        else:
            frames = np.zeros((batch, s.n_packed, s.frame_height,
                               s.frame_width, 3), np.uint8)
        td = len(s.det_idx)
        boxes = np.tile(np.asarray([[1.0, 1.0, 10.0, 10.0]], np.float32),
                        (batch, td, 1))
        scores = np.full((batch, td), 0.5, np.float32)
        if mesh is not None:
            sh = batch_sharding(mesh)
            frames, boxes, scores = jax.device_put((frames, boxes, scores),
                                                   sh)
        else:
            frames, boxes, scores = jax.device_put((frames, boxes, scores))
        rng = jax.random.PRNGKey(0)
        timings: Dict[str, float] = {}

        def run(name, fn, *args):
            t0 = _time.time()
            out = fn(*args)
            # scalar readback, not block_until_ready: the latter under-syncs
            # on tunnelled backends, letting warmup work bleed into the
            # caller's first timed run
            leaf = jax.tree_util.tree_leaves(out)[0]
            jax.device_get(leaf[(0,) * leaf.ndim])
            timings[name] = round(_time.time() - t0, 1)

        if mode == "pair":
            threads = [
                threading.Thread(target=run, args=(
                    "front", self._jit_front, self.params, frames)),
                threading.Thread(target=run, args=(
                    "back", self._jit_back, self.params, frames, boxes,
                    scores, rng)),
            ]
        else:
            threads = [
                threading.Thread(target=run, args=(
                    "detect", self._jit_detect, self.params, frames)),
                threading.Thread(target=run, args=(
                    "sam", self._jit_sam, self.params, frames, boxes)),
                threading.Thread(target=run, args=(
                    "dino", self._jit_dino, self.params, frames)),
                threading.Thread(target=run, args=(
                    "heads", self._jit_heads, self.params, frames, boxes,
                    scores, rng)),
            ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return timings

    def shard_inference(self, mesh) -> None:
        """Inference over a device mesh.  Pure data mesh: params
        replicated, clip batches sharded over ``data``.  A composed
        {data, model} mesh (SURVEY §2.5 TPU-native equivalents (c))
        additionally column/row-shards the DINO tower's QKV/MLP weights
        over ``model`` — GSPMD inserts the head all-reduce; outputs are
        numerically equivalent to the replicated layout within float
        reassociation of that reduction (dryrun pins atol=1e-4; NOT
        bitwise).  XLA partitions every stage
        automatically from the input shardings (no per-op annotations
        needed — the batch axis threads through all stages)."""
        from ..parallel.mesh import (MODEL_AXIS, replicate_params,
                                     shard_params_tp)
        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            self.params = shard_params_tp(mesh, self.params)
        else:
            self.params = replicate_params(mesh, self.params)
        self._mesh = mesh
        self._build_jits()

    def process_clip_batch_sharded(self, frames: np.ndarray,
                                   rng: Optional[jax.Array] = None,
                                   transfer: Optional[str] = None
                                   ) -> Dict[str, np.ndarray]:
        """Multi-chip variant of process_clip_batch: pads the batch to the
        data-axis size, shards (each chip gets its own clips' bytes —
        to_device/_to_device_sharded), runs the staged pipeline, unpads.
        Since round 3 this is the same code path process_clip_batch takes
        once shard_inference() is installed (split-ingest and yuv420
        transfer included); kept as the explicit-intent API."""
        assert getattr(self, "_mesh", None) is not None, \
            "call shard_inference(mesh) first"
        return self.process_clip_batch(frames, rng=rng, transfer=transfer)

    def fused_fn(self):
        """(fn, example_args) for compile checking — the graft entry point.
        Uses the detection+heads core (the SAM/DINO encoders compile-check
        via their own stage jits; the combined HLO overwhelms remote
        compile services)."""
        s = self.spec

        def core(params, frames, rng):
            out = dict(self._detect_stage(params, frames))
            out.update(self._heads_stage(params, frames,
                                         out["primary_boxes"],
                                         out["primary_scores"], rng))
            return out

        example = (self.params,
                   jnp.zeros((1, s.n_packed, s.frame_height,
                              s.frame_width, 3), jnp.uint8),
                   jax.random.PRNGKey(0))
        return core, example


def make_test_engine(frame_height: int = 90,
                     frame_width: int = 160) -> LamenessEngine:
    """Small-geometry engine for CPU tests: 15 frames at 160x90 (or an
    override geometry, e.g. the reduced-ingest bench self-test), no SAM."""
    spec = EngineSpec(clip_frames=15, frame_height=frame_height,
                      frame_width=frame_width,
                      fps=5, yolo_size=64, pose_size=64, dino_size=56,
                      use_sam_model=False, sam_mask_size=64)
    cfg = Config()
    eng = LamenessEngine(config=cfg, spec=spec, init_models=False)
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    eng.yolo = YoloV8(variant="n", num_classes=cfg.yolo.num_classes)
    eng.dino = dino_mod.DinoV2(hidden_size=64, num_layers=2, num_heads=4,
                               patch_size=14, pos_grid=4, ls_init=1.0)
    eng.sam = None
    eng.tcn = TCN(input_dim=44)
    eng.gait = GaitTransformer(input_dim=44)
    eng.params = {
        "yolo": init_params(eng.yolo, ks[0], img=spec.yolo_size),
        "dino": jax.jit(eng.dino.init)(
            ks[1], jnp.zeros((1, spec.dino_size, spec.dino_size, 3))),
        "tcn": jax.jit(eng.tcn.init)(
            ks[3], jnp.zeros((1, seqf.TARGET_LEN, 44))),
        "gait": jax.jit(eng.gait.init)(
            ks[4], jnp.zeros((1, seqf.TARGET_LEN, 44)),
            jnp.zeros((1, seqf.TARGET_LEN), bool)),
    }
    eng.pose_model = None
    eng.loaded_weights = {k: False for k in
                          ("yolo", "dino", "sam", "pose", "tcn", "gait")}
    eng._build_jits()
    return eng
