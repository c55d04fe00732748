"""Clip curation: raw upload -> canonical 5 s, 25 fps, 1280x720, left->right.

Behavioral rebuild of ``services/clip-curation/app/main.py:61-704``:
walking-pass segmentation on direction changes (MIN_PASS_FRAMES=30,
5-frame direction window, 5%-width hysteresis), six-metric window scoring
(framing .25 / steadiness .25 / straightness .15 / visual .15 /
occlusion .10 / progress .10 over band 0.25-0.85), 25%-step window
sliding, right->left horizontal flip normalisation, and the quality
report schema checked in under ``data/quality_reports``.

TPU-first restructure (SURVEY.md §7 hard part 7): the reference re-seeks
and re-decodes frames per candidate window for blur/brightness; here ONE
streaming decode pass caches per-frame detection + Laplacian-blur +
brightness, and every window score is pure array math over the cache.

The detector is injected (frame -> best-detection dict or None): the
jitted YOLO path when weights exist, else a background-subtraction motion
detector — mirroring the reference's graceful degradation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..io import schemas
from .decode import VideoReader, write_video

TARGET_FPS = 25
TARGET_RESOLUTION = (1280, 720)
CANONICAL_DURATION = 5.0
MIN_PASS_FRAMES = 30
PROGRESS_BAND = (0.25, 0.85)

Detector = Callable[[np.ndarray], Optional[Dict[str, Any]]]


@dataclass
class WalkingPass:
    start_frame: int
    end_frame: int
    direction: str
    centroids: List[Tuple[float, float]]
    bboxes: List[List[float]]
    confidences: List[float]
    normalized_progress: List[float] = field(default_factory=list)
    frame_indices: List[int] = field(default_factory=list)


@dataclass
class QualityMetrics:
    framing_score: float
    steadiness_score: float
    straightness_score: float
    visual_quality_score: float
    occlusion_score: float
    overall_score: float


@dataclass
class ClipCandidate:
    start_frame: int
    end_frame: int
    start_time: float
    end_time: float
    metrics: QualityMetrics
    needs_flip: bool


# ---------------------------------------------------------------------------
# detectors
# ---------------------------------------------------------------------------
def motion_detector() -> Detector:
    """Weight-free fallback: MOG2 background subtraction, largest blob."""
    bg = cv2.createBackgroundSubtractorMOG2(history=50, varThreshold=32)

    def detect(frame_bgr: np.ndarray) -> Optional[Dict[str, Any]]:
        mask = bg.apply(frame_bgr)
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
        contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            return None
        c = max(contours, key=cv2.contourArea)
        area = cv2.contourArea(c)
        h, w = frame_bgr.shape[:2]
        if area < 0.02 * h * w:
            return None
        x, y, bw, bh = cv2.boundingRect(c)
        return {"bbox": [float(x), float(y), float(x + bw), float(y + bh)],
                "confidence": min(1.0, area / (0.1 * h * w)),
                "centroid": (x + bw / 2, y + bh / 2),
                "area": float(bw * bh)}
    return detect


def _best_detection(boxes, scores, classes, valid, h: int, w: int,
                    cow_class_id: int) -> Optional[Dict[str, Any]]:
    """clip-curation:103-131 selection: accept cow class or any detection
    > 10% of frame, keep largest (shared by the per-frame and batched
    curation detectors so their outputs are identical by construction)."""
    best = None
    best_area = 0.0
    for b, s, c, v in zip(boxes, scores, classes, valid):
        if not v:
            continue
        area = max(0.0, (b[2] - b[0]) * (b[3] - b[1]))
        if (c == cow_class_id or area > 0.1 * h * w) and area > best_area:
            best_area = area
            best = {"bbox": [float(x) for x in b],
                    "confidence": float(s),
                    "centroid": ((b[0] + b[2]) / 2, (b[1] + b[3]) / 2),
                    "area": float(area)}
    return best


class BatchedYoloDetector:
    """Chunked device YOLO curation detector (VERDICT r3 item 4).

    The reference runs its detector one frame at a time
    (clip-curation:133-167); so did the injected per-frame path here —
    one device dispatch per frame, pathological on a remote-dispatch
    backend.  This detector letterboxes + detects a CHUNK of frames in
    ONE jitted program (ceil(F/chunk) dispatches per video instead of
    F; the last ragged chunk is zero-padded so there is exactly one
    compiled signature per video geometry).

    Selection semantics and numerics are identical to ``yolo_detector``
    (same letterbox math vmapped on device, same NMS, same
    ``_best_detection``) — pinned by tests/test_curation_batched.py.
    Exposes ``detect_stream`` (the pipelined loop
    ClipCurator.track_cow_through_video feeds from its producer thread),
    ``detect_batch`` over an in-memory array, and per-frame ``__call__``
    for Detector compatibility.  On TPU backends chunks ride the wire as
    I420 planes (transfer='yuv420' default — half the bytes on the
    bandwidth-limited link; CPU keeps rgb so parity tests stay
    bit-exact).
    """

    def __init__(self, model, params, conf: float = 0.3,
                 cow_class_id: int = 19, size: int = 640,
                 chunk: Optional[int] = None,
                 transfer: Optional[str] = None):
        import os

        import jax
        import jax.numpy as jnp
        from ..models.yolo import detect as yolo_detect
        from ..ops.preprocess import letterbox, unletterbox_boxes
        from ..video.yuv import i420_to_rgb_device
        if chunk is None:
            # the tunnel's effective host→device rate roughly halves
            # below ~64 MB per transfer (ld_put_idle, docs/PROBES_r03.json):
            # 48 frames of 720p I420 ≈ 66 MB per put, vs ~22 MB at 16.
            # Zero-pad rows in the ragged tail chunk are nearly free on
            # the wire (the tunnel compresses the stream).
            env = os.environ.get("LAMENESS_CURATION_CHUNK")
            chunk = int(env) if env else \
                (48 if jax.default_backend() == "tpu" else 16)
        self.chunk = int(chunk)
        self.cow_class_id = cow_class_id
        self.transfer = transfer         # None -> backend default
        self.dispatches = 0              # observable dispatch counter

        def batched(frames_rgb):         # (N, H, W, 3) uint8
            canvas = jax.vmap(lambda f: letterbox(f, size)[0])(frames_rgb)
            _, ratio, pad = letterbox(
                jnp.zeros(frames_rgb.shape[1:], jnp.uint8), size)
            out = model.apply(params, canvas)
            det = yolo_detect(out["levels"], conf_threshold=conf, max_det=8)
            boxes = jax.vmap(
                lambda b: unletterbox_boxes(b, ratio, pad))(det["boxes"])
            return boxes, det["scores"], det["classes"], det["valid"]

        self._jit = jax.jit(batched)
        # I420 wire format: the chunk rides the tunnel at 1.5 bytes/px
        # instead of 3 and the SAME program rebuilds RGB on device first
        # (±2 LSB of the decoder's own conversion, video/yuv.py) — on
        # the bandwidth-limited link curation is transfer-bound, so this
        # halves its wall time
        self._jit_yuv = jax.jit(
            lambda yuv: batched(i420_to_rgb_device(yuv)))

    def _resolve_transfer(self, h: int, w: int) -> str:
        """'yuv420' on TPU backends (same default + env override as
        EngineSpec ingest, pipeline/engine.py::default_transfer), 'rgb'
        elsewhere and for odd geometries I420 cannot represent."""
        if h % 2 or w % 2:
            return "rgb"
        if self.transfer:
            return self.transfer
        import os

        import jax
        env = os.environ.get("LAMENESS_YUV_INGEST")
        if env == "0":
            return "rgb"
        if env == "1":
            return "yuv420"
        return "yuv420" if jax.default_backend() == "tpu" else "rgb"

    def detect_stream(self, chunk_iter, timers=None
                      ) -> List[Optional[Dict[str, Any]]]:
        """Pipelined device loop over an iterator of (count, rgb_chunk).

        rgb_chunk: (bs, H, W, 3) uint8 RGB with ``count`` valid leading
        rows (tail chunks zero-padded to a fixed bs → one compiled
        signature).  Chunk k+1's host→device transfer is issued between
        dispatching chunk k and syncing its outputs — the single-thread
        overlap pattern from serve/driver.py::process_stream — so the
        wire streams while the device computes.
        """
        import contextlib

        import jax
        results: List[Optional[Dict[str, Any]]] = []
        pending = None
        prep = fn = None

        def consume(item):
            count, h, w, res = item
            boxes, scores, classes, valid = (np.asarray(a) for a in res)
            for i in range(count):
                results.append(_best_detection(
                    boxes[i], scores[i], classes[i], valid[i], h, w,
                    self.cow_class_id))

        for count, chunk in chunk_iter:
            h, w = chunk.shape[1:3]
            if fn is None:
                if self._resolve_transfer(h, w) == "yuv420":
                    from ..video.yuv import rgb_to_i420
                    prep, fn = (lambda c: rgb_to_i420(
                        np.ascontiguousarray(c))), self._jit_yuv
                else:
                    prep, fn = np.ascontiguousarray, self._jit
            with (timers.time("curation.detect") if timers
                  else contextlib.nullcontext()):
                dev = jax.device_put(prep(chunk))
                res = fn(dev)
                self.dispatches += 1
                if pending is not None:
                    consume(pending)
                pending = (count, h, w, res)
        if pending is not None:
            consume(pending)
        return results

    def detect_batch(self, frames: np.ndarray, *, bgr: bool = True
                     ) -> List[Optional[Dict[str, Any]]]:
        """(N, H, W, 3) uint8 -> N best-detection dicts (or None).

        ``bgr=False`` takes RGB directly (the decode loop already holds
        RGB — skips a per-frame BGR round trip that detect_batch would
        immediately undo)."""
        n, h, w = frames.shape[:3]
        rgb = frames[..., ::-1] if bgr else frames
        # single frames (Detector-protocol __call__) run a batch-1
        # signature instead of zero-padding to a full chunk — one extra
        # compile, 1/chunk the per-call compute/wire
        bs = 1 if n == 1 else self.chunk

        def chunks():
            for o in range(0, n, bs):
                c = rgb[o:o + bs]
                if len(c) < bs:
                    c = np.concatenate(
                        [c, np.zeros((bs - len(c), h, w, 3), np.uint8)],
                        axis=0)
                yield min(bs, n - o), c

        return self.detect_stream(chunks())

    def __call__(self, frame_bgr: np.ndarray) -> Optional[Dict[str, Any]]:
        return self.detect_batch(frame_bgr[None])[0]


def yolo_detector(model, params, conf: float = 0.3,
                  cow_class_id: int = 19, size: int = 640) -> Detector:
    """Device YOLO as a per-frame curation detector (clip-curation:103-131
    semantics).  Prefer ``BatchedYoloDetector`` — one dispatch per chunk
    instead of per frame; this stays for injection sites that feed single
    frames."""
    import jax.numpy as jnp
    from ..models.yolo import detect as yolo_detect
    from ..ops.preprocess import letterbox, unletterbox_boxes

    import jax

    @jax.jit
    def device_fn(rgb):      # ONE dispatch per frame, not one per op
        canvas, ratio, pad = letterbox(rgb, size)
        out = model.apply(params, canvas[None])
        det = yolo_detect(out["levels"], conf_threshold=conf, max_det=8)
        boxes = unletterbox_boxes(det["boxes"][0], ratio, pad)
        return boxes, det["scores"][0], det["classes"][0], det["valid"][0]

    def detect_fn(frame_bgr: np.ndarray) -> Optional[Dict[str, Any]]:
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        boxes, scores, classes, valid = device_fn(
            jax.device_put(np.ascontiguousarray(rgb)))
        h, w = frame_bgr.shape[:2]
        return _best_detection(np.asarray(boxes), np.asarray(scores),
                               np.asarray(classes), np.asarray(valid),
                               h, w, cow_class_id)
    return detect_fn


# ---------------------------------------------------------------------------
# per-frame quality stats (single streaming pass)
# ---------------------------------------------------------------------------
def blur_score(gray: np.ndarray) -> float:
    """Laplacian variance / 500, capped at 1 (clip-curation:351-356)."""
    return min(1.0, cv2.Laplacian(gray, cv2.CV_64F).var() / 500.0)


def brightness_score(gray: np.ndarray) -> float:
    """1 - |mean-128|/128 (clip-curation:358-365)."""
    return max(0.0, 1.0 - abs(float(np.mean(gray)) - 128) / 128)


class ClipCurator:
    def __init__(self, dirs, detector: Optional[Detector] = None,
                 bus=None, subjects=None, timers=None):
        from ..utils.timing import StageTimers
        self.dirs = dirs
        self.detector = detector or motion_detector()
        self.bus = bus
        self.subjects = subjects
        self.timers = timers or StageTimers()
        self.canonical_dir = dirs.canonical
        self.reports_dir = dirs.quality_reports
        self._frame_cache: Optional[Dict[str, Any]] = None
        self.canonical_dir.mkdir(parents=True, exist_ok=True)
        self.reports_dir.mkdir(parents=True, exist_ok=True)

    # -- stage 1: one decode pass -------------------------------------------
    def _cache_frame(self, cache: Dict[str, Any], frame: np.ndarray):
        """Retain a decoded frame for downstream reuse (canonical/backup
        extraction + the driver's preprocess crop read the SAME raw
        upload — on a 1-CPU host each re-decode is pure repeated work).
        The cache is byte-capped (LAMENESS_FRAME_CACHE_MB, default 2048);
        past the cap it is dropped whole and every consumer falls back to
        its own decode, so outputs never depend on cache state."""
        if cache["frames"] is None:
            return
        cache["bytes"] += frame.nbytes
        if cache["bytes"] > cache["cap"]:
            cache["frames"] = None
        else:
            cache["frames"].append(frame)

    @staticmethod
    def _cache_cap_bytes() -> int:
        import os
        return int(float(os.environ.get(
            "LAMENESS_FRAME_CACHE_MB", "2048")) * 1e6)

    def take_frame_cache(self, video_path: Path
                         ) -> Optional[Dict[str, Any]]:
        """Pop the one-video decoded-frame cache if it matches ``video_path``
        (driver._preprocess calls this; popping frees the memory once the
        last consumer is done)."""
        fc = self._frame_cache
        self._frame_cache = None
        if fc and fc["frames"] is not None \
                and fc["path"] == Path(video_path).resolve():
            return fc
        return None

    def track_cow_through_video(self, video_path: Path):
        """Detection + visual-quality stats for every frame in one pass.

        A detector exposing ``detect_stream`` (BatchedYoloDetector) runs
        once per CHUNK of frames — ceil(F/chunk) device dispatches per
        video instead of F (the reference's per-frame loop,
        clip-curation:133-167) — with decode + Laplacian/brightness on a
        producer thread while the calling thread streams chunks to the
        device (transfer-bound on the tunnel; host work hides under the
        wire).  Stateful per-frame detectors (MOG2 background
        subtraction needs frame order) keep the serial frame loop."""
        batch_fn = getattr(self.detector, "detect_stream", None)
        cache = {"path": Path(video_path).resolve(), "frames": [],
                 "bytes": 0, "cap": self._cache_cap_bytes(), "info": None}
        self._frame_cache = None
        if batch_fn is None:
            detections, info, visual = self._track_serial(video_path, cache)
        else:
            detections, info, visual = self._track_streamed(
                video_path, cache, batch_fn)
        if cache["frames"] is not None:
            cache["info"] = info
            self._frame_cache = cache
        return detections, info, visual

    def _track_serial(self, video_path: Path, cache):
        with VideoReader(video_path) as vr:
            info = vr.info
            detections: List[Dict[str, Any]] = []
            visual: List[float] = []
            for idx, frame_rgb in vr.frames(interval=1, rgb=True):
                gray = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2GRAY)
                visual.append((blur_score(gray) + brightness_score(gray)) / 2)
                self._cache_frame(cache, frame_rgb)
                with self.timers.time("curation.detect"):
                    # stateful per-frame detectors (MOG2) take BGR
                    det = self.detector(
                        cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))
                detections.append({
                    "frame": idx,
                    "time": idx / info["fps"] if info["fps"] > 0 else 0,
                    "detection": det,
                })
        return detections, info, np.asarray(visual)

    def _track_streamed(self, video_path: Path, cache, batch_fn):
        """Producer thread: decode + per-frame quality stats + frame
        cache, pushing fixed-size chunks.  Calling thread: the pipelined
        device loop (ALL device IO on one thread — two threads doing
        device IO degrade both on the tunnel, sg_put_contended,
        docs/PROBES_r03.json)."""
        import queue as _queue
        import threading as _threading
        chunk = getattr(self.detector, "chunk", 16)
        q: "_queue.Queue" = _queue.Queue(maxsize=4)
        state: Dict[str, Any] = {"info": None, "visual": [], "indices": [],
                                 "err": None, "abort": False}

        def safe_put(item) -> bool:
            # never block forever: if the device loop died, its thread
            # stops draining the bounded queue — the abort flag lets the
            # producer exit so join() cannot hang
            while not state["abort"]:
                try:
                    q.put(item, timeout=0.5)
                    return True
                except _queue.Full:
                    continue
            return False

        def producer():
            try:
                with VideoReader(video_path) as vr:
                    state["info"] = vr.info
                    pend: List[np.ndarray] = []
                    for idx, frame_rgb in vr.frames(interval=1, rgb=True):
                        gray = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2GRAY)
                        state["visual"].append(
                            (blur_score(gray) + brightness_score(gray)) / 2)
                        state["indices"].append(idx)
                        self._cache_frame(cache, frame_rgb)
                        pend.append(frame_rgb)
                        if len(pend) >= chunk:
                            if not safe_put((len(pend), np.stack(pend))):
                                return
                            pend = []
                    if pend:
                        c = np.stack(pend)
                        if len(pend) < chunk:
                            c = np.concatenate(
                                [c, np.zeros((chunk - len(pend),)
                                             + c.shape[1:], np.uint8)],
                                axis=0)
                        safe_put((len(pend), c))
            except Exception as e:      # re-raised on the calling thread
                state["err"] = e
            finally:
                safe_put(None)          # sentinel MUST reach the consumer

        def chunk_iter():
            while True:
                item = q.get()
                if item is None:
                    return
                yield item

        t = _threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            dets = batch_fn(chunk_iter(), timers=self.timers)
        except BaseException:
            state["abort"] = True
            raise
        finally:
            t.join()
        if state["err"] is not None:
            raise state["err"]
        info = state["info"]
        fps = info["fps"] if info else 0
        detections = [{"frame": idx,
                       "time": idx / fps if fps > 0 else 0,
                       "detection": det}
                      for idx, det in zip(state["indices"], dets)]
        return detections, info, np.asarray(state["visual"])

    # -- stage 2: walking passes (clip-curation:175-289) ---------------------
    def identify_walking_passes(self, detections: List[Dict],
                                video_info: Dict) -> List[WalkingPass]:
        passes: List[WalkingPass] = []
        width = video_info["width"]
        start = None
        direction = None
        cents: List[Tuple[float, float]] = []
        boxes: List[List[float]] = []
        confs: List[float] = []

        def flush(end_frame: int):
            if start is not None and len(cents) >= MIN_PASS_FRAMES:
                passes.append(self._make_pass(start, end_frame,
                                              direction or "left_to_right",
                                              cents, boxes, confs))

        for det in detections:
            if det["detection"] is None:
                flush(det["frame"] - 1)
                start, cents, boxes, confs = None, [], [], []
                continue
            centroid = det["detection"]["centroid"]
            if start is None:
                start = det["frame"]
                direction = None
                cents = [centroid]
                boxes = [det["detection"]["bbox"]]
                confs = [det["detection"]["confidence"]]
            else:
                if len(cents) >= 5:
                    x_move = centroid[0] - cents[-5][0]
                    new_dir = "left_to_right" if x_move > 0 else "right_to_left"
                    if direction is None:
                        direction = new_dir
                    elif new_dir != direction and abs(x_move) > width * 0.05:
                        flush(det["frame"] - 1)
                        start = det["frame"]
                        direction = new_dir
                        cents = [centroid]
                        boxes = [det["detection"]["bbox"]]
                        confs = [det["detection"]["confidence"]]
                        continue
                cents.append(centroid)
                boxes.append(det["detection"]["bbox"])
                confs.append(det["detection"]["confidence"])
        if detections:
            flush(detections[-1]["frame"])
        return passes

    def _make_pass(self, start, end, direction, cents, boxes, confs):
        xs = [c[0] for c in cents]
        lo, hi = min(xs), max(xs)
        rng = hi - lo if hi > lo else 1
        if direction == "left_to_right":
            progress = [(x - lo) / rng for x in xs]
        else:
            progress = [(hi - x) / rng for x in xs]
        return WalkingPass(start_frame=start, end_frame=end,
                           direction=direction, centroids=list(cents),
                           bboxes=list(boxes), confidences=list(confs),
                           normalized_progress=progress)

    # -- stage 3: window scoring over the cache (clip-curation:291-432) ------
    def score_window(self, wp: WalkingPass, start_idx: int, window_frames: int,
                     video_info: Dict, visual_cache: np.ndarray
                     ) -> QualityMetrics:
        end_idx = min(start_idx + window_frames, len(wp.centroids))
        if end_idx - start_idx < window_frames * 0.8:
            return QualityMetrics(0, 0, 0, 0, 0, 0)
        cents = wp.centroids[start_idx:end_idx]
        boxes = wp.bboxes[start_idx:end_idx]
        confs = wp.confidences[start_idx:end_idx]
        progress = wp.normalized_progress[start_idx:end_idx]
        fw, fh = video_info["width"], video_info["height"]

        areas = [(b[2] - b[0]) * (b[3] - b[1]) for b in boxes]
        size_score = min(1.0, np.mean(areas) / (fw * fh) / 0.3)
        margins = []
        for b in boxes:
            m = min(b[0] / fw, (fw - b[2]) / fw, b[1] / fh, (fh - b[3]) / fh)
            margins.append(min(1.0, m / 0.05))
        framing = size_score * 0.6 + float(np.mean(margins)) * 0.4

        xs = [c[0] for c in cents]
        vel = np.diff(xs)
        mean_speed = abs(float(np.mean(vel)))
        steadiness = max(0.0, 1.0 - float(np.std(vel)) / mean_speed) \
            if mean_speed > 0 else 0.0

        ys = [c[1] for c in cents]
        straightness = max(0.0, 1.0 - (max(ys) - min(ys)) / fh * 10)

        n = end_idx - start_idx
        sample_idx = [wp.start_frame + start_idx + i
                      for i in range(0, n, max(1, n // 5))][:5]
        vis = [visual_cache[i] for i in sample_idx if i < len(visual_cache)]
        visual = float(np.mean(vis)) if vis else 0.5

        occlusion = float(np.mean(confs))
        avg_p = float(np.mean(progress))
        if avg_p < PROGRESS_BAND[0]:
            prog = avg_p / PROGRESS_BAND[0]
        elif avg_p > PROGRESS_BAND[1]:
            prog = (1.0 - avg_p) / (1.0 - PROGRESS_BAND[1])
        else:
            prog = 1.0

        overall = (framing * 0.25 + steadiness * 0.25 + straightness * 0.15
                   + visual * 0.15 + occlusion * 0.10 + prog * 0.10)
        return QualityMetrics(float(framing), float(steadiness),
                              float(straightness), visual, occlusion,
                              float(overall))

    def find_best_window(self, wp: WalkingPass, video_info: Dict,
                         visual_cache: np.ndarray) -> Optional[ClipCandidate]:
        fps = video_info["fps"]
        window_frames = int(CANONICAL_DURATION * fps)
        if len(wp.centroids) < window_frames:
            return None
        best = None
        best_score = -1.0
        step = max(1, window_frames // 4)
        for start_idx in range(0, len(wp.centroids) - window_frames + 1, step):
            m = self.score_window(wp, start_idx, window_frames, video_info,
                                  visual_cache)
            if m.overall_score > best_score:
                best_score = m.overall_score
                sf = wp.start_frame + start_idx
                best = ClipCandidate(
                    start_frame=sf, end_frame=sf + window_frames,
                    start_time=sf / fps, end_time=(sf + window_frames) / fps,
                    metrics=m, needs_flip=wp.direction == "right_to_left")
        return best

    # -- stage 4: extraction (clip-curation:434-505) -------------------------
    def extract_canonical_clip(self, video_path: Path, cand: ClipCandidate,
                               output_path: Path, video_info: Dict,
                               frames_cache: Optional[List[np.ndarray]] = None
                               ) -> bool:
        """``frames_cache``: the track pass's decoded frames (indices are
        contiguous from 0, matching the decode loop) — selection logic is
        identical either way, so the output bytes are too."""
        target_frames = int(CANONICAL_DURATION * TARGET_FPS)
        ratio = video_info["fps"] / TARGET_FPS
        frames_out: List[np.ndarray] = []

        def feed(pairs):
            for idx, frame in pairs:
                if idx < cand.start_frame:
                    continue
                rel = idx - cand.start_frame
                if rel >= len(frames_out) * ratio and \
                        len(frames_out) < target_frames:
                    f = cv2.resize(frame, TARGET_RESOLUTION)
                    if cand.needs_flip:
                        f = cv2.flip(f, 1)
                    frames_out.append(f)
                if len(frames_out) >= target_frames:
                    break

        if frames_cache is not None:
            feed(enumerate(frames_cache))
        else:
            with VideoReader(video_path) as vr:
                feed(vr.frames(interval=1, rgb=True))
        return write_video(output_path, frames_out, TARGET_FPS)

    # -- full curation (clip-curation:567-672) -------------------------------
    def curate_video(self, video_path: Path, video_id: str) -> Dict[str, Any]:
        with self.timers.time("curation.track"):
            detections, info, visual_cache = \
                self.track_cow_through_video(video_path)
        # one-video memo: preprocessing of the SAME raw upload can reuse
        # these per-frame detections instead of re-running the detector
        # over its first frames (driver._preprocess); one entry only so
        # long streams don't accumulate per-frame dicts
        self.last_detections = {"video_id": video_id,
                                "detections": detections}
        passes = self.identify_walking_passes(detections, info)
        candidates = []
        for wp in passes:
            c = self.find_best_window(wp, info, visual_cache)
            if c:
                candidates.append(c)
        candidates.sort(key=lambda c: c.metrics.overall_score, reverse=True)
        selected = candidates[0] if candidates else None
        backup = candidates[1] if len(candidates) > 1 else None
        status, rejection = "success", None
        if selected is None and self._is_canonical_like(info):
            # pass-through fallback: the upload is already a canonical-
            # duration clip (e.g. re-processing a previously curated one,
            # or footage from a panning camera the weight-free detector
            # cannot segment).  Select the whole clip unflipped with
            # detector-independent metrics rather than rejecting —
            # rejecting the curation side branch would strand an
            # otherwise processable video.
            selected = self._passthrough_candidate(info, visual_cache)
        if selected is None:
            status = "rejected"
            rejection = ("no valid walking pass of sufficient length"
                         if not passes else "no window long enough for 5s clip")
        else:
            fc = self._frame_cache["frames"] \
                if (self._frame_cache is not None
                    and self._frame_cache["path"]
                    == Path(video_path).resolve()) else None
            out_path = self.canonical_dir / f"{video_id}_canonical.mp4"
            with self.timers.time("curation.extract"):
                ok = self.extract_canonical_clip(video_path, selected,
                                                 out_path, info,
                                                 frames_cache=fc)
            if not ok:
                status, rejection = "failed", "clip extraction failed"
            if backup is not None and ok:
                self.extract_canonical_clip(
                    video_path, backup,
                    self.canonical_dir / f"{video_id}_backup.mp4", info,
                    frames_cache=fc)

        report = schemas.quality_report(
            video_id=video_id,
            source=info,
            passes=[{"start_frame": p.start_frame, "end_frame": p.end_frame,
                     "direction": p.direction,
                     "duration": (p.end_frame - p.start_frame + 1) / info["fps"]
                     if info["fps"] > 0 else 0}
                    for p in passes],
            selected_window=self._window_dict(selected),
            backup_window=self._window_dict(backup),
            status=status, rejection_reason=rejection,
            target_fps=TARGET_FPS, target_resolution=TARGET_RESOLUTION,
            target_duration=CANONICAL_DURATION)
        schemas.write_result(self.reports_dir / f"{video_id}_quality.json",
                             report)
        if self.bus is not None:
            subject = (self.subjects.video_curated if self.subjects
                       else "video.curated")
            self.bus.publish_sync(subject, {
                "video_id": video_id, "status": status,
                "canonical_path": str(self.canonical_dir
                                      / f"{video_id}_canonical.mp4"),
                "quality_report": str(self.reports_dir
                                      / f"{video_id}_quality.json")})
        return report

    @staticmethod
    def _is_canonical_like(info: Dict[str, Any]) -> bool:
        """Already a ~5 s clip? (duration within 1.5x of the canonical
        target and at least 2 s of footage)."""
        fps = info.get("fps") or 0
        frames = info.get("total_frames") or 0
        if fps <= 0:
            return False
        duration = frames / fps
        return 2.0 <= duration <= CANONICAL_DURATION * 1.5

    def _passthrough_candidate(self, info: Dict[str, Any],
                               visual_cache: np.ndarray) -> ClipCandidate:
        fps = info["fps"]
        n = min(int(info["total_frames"]), int(CANONICAL_DURATION * fps))
        visual = float(np.mean(visual_cache[:n])) if len(visual_cache) else 0.0
        m = QualityMetrics(
            framing_score=0.0, steadiness_score=0.0, straightness_score=0.0,
            visual_quality_score=visual, occlusion_score=0.0,
            # only the detector-independent visual term contributes
            # (weight .15, clip-curation:379-386)
            overall_score=0.15 * visual)
        return ClipCandidate(start_frame=0, end_frame=n,
                             start_time=0.0, end_time=n / fps,
                             metrics=m, needs_flip=False)

    @staticmethod
    def _window_dict(c: Optional[ClipCandidate]) -> Optional[Dict[str, Any]]:
        if c is None:
            return None
        return {
            "start_frame": c.start_frame, "end_frame": c.end_frame,
            "start_time": c.start_time, "end_time": c.end_time,
            "needs_flip": c.needs_flip,
            "metrics": {
                "framing_score": c.metrics.framing_score,
                "steadiness_score": c.metrics.steadiness_score,
                "straightness_score": c.metrics.straightness_score,
                "visual_quality_score": c.metrics.visual_quality_score,
                "occlusion_score": c.metrics.occlusion_score,
                "overall_score": c.metrics.overall_score,
            },
        }
