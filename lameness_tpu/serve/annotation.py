"""Annotated-video renderer: skeleton + detections + info overlay.

Behavioral rebuild of ``services/annotation-renderer/app/main.py``:
the corrected Roboflow skeleton chains/edges (main.py:67-95), robust
keypoint reindexing by id/name with synonym normalisation (108-223),
walking-direction detection (252), per-body-part edge colouring, YOLO box
drawing, and the info overlay — producing the ``{video_id}_annotated.mp4``
the admin UI streams.  S3 transfer is optional (boto3-gated).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..video.decode import VideoReader, write_video

NUM_KP = 20
KEYPOINT_NAMES = [
    "left_ear_base", "neck", "withers", "mid_back", "right_hind_hip",
    "right_hind_mid_leg", "right_hind_fetlock", "left_hind_shoulder",
    "left_hind_mid_leg", "left_hind_fetlock", "right_front_shoulder",
    "right_front_mid_leg", "right_front_lower_leg", "left_front_shoulder",
    "left_front_mid_leg", "left_front_lower_leg", "right_front_hoof",
    "left_front_hoof", "right_hind_hoof", "left_hind_hoof",
]
_NAME_TO_ID = {n: i for i, n in enumerate(KEYPOINT_NAMES)}
# old animal-pose synonyms (heuristic pose emits these)
_SYNONYMS = {
    "left_ear": 0, "right_ear": 0, "nose": 0, "left_eye": 0, "right_eye": 0,
    "throat": 1, "tailbase": 3,
    "left_front_elbow": 13, "right_front_elbow": 10,
    "left_back_elbow": 7, "right_back_elbow": 4,
    "left_front_knee": 14, "right_front_knee": 11,
    "left_back_knee": 8, "right_back_knee": 5,
    "left_front_paw": 17, "right_front_paw": 16,
    "left_back_paw": 19, "right_back_paw": 18,
}

# corrected chains/edges (annotation-renderer:67-95)
EDGES_BODY = [(0, 1), (1, 2), (2, 3), (2, 10), (2, 13), (3, 7), (3, 4)]
EDGES_FRONT_L = [(13, 14), (14, 15), (15, 17)]
EDGES_FRONT_R = [(10, 11), (11, 12), (12, 16)]
EDGES_HIND_L = [(7, 8), (8, 9), (9, 19)]
EDGES_HIND_R = [(4, 5), (5, 6), (6, 18)]
ALL_EDGES = EDGES_BODY + EDGES_FRONT_L + EDGES_FRONT_R + EDGES_HIND_L \
    + EDGES_HIND_R
SKELETON_COLORS = {
    "head": (0, 255, 255), "spine": (0, 255, 0), "front_left": (255, 0, 0),
    "front_right": (0, 165, 255), "hind_left": (255, 0, 255),
    "hind_right": (255, 255, 0),
}


def _norm_name(s: str) -> str:
    return s.strip().lower().replace(" ", "_").replace("-", "_")


def reindex_keypoints(raw: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Mixed id/name keypoints -> fixed 20-slot list (renderer:156-223)."""
    out: List[Optional[Dict[str, Any]]] = [None] * NUM_KP
    for kp in raw:
        idx = None
        if "id" in kp and isinstance(kp["id"], int) and 0 <= kp["id"] < NUM_KP:
            idx = kp["id"]
        elif "name" in kp:
            name = _norm_name(str(kp["name"]))
            idx = _NAME_TO_ID.get(name, _SYNONYMS.get(name))
        if idx is None:
            continue
        cand = {"x": float(kp.get("x", 0)), "y": float(kp.get("y", 0)),
                "confidence": float(kp.get("confidence", 0))}
        if out[idx] is None or cand["confidence"] > out[idx]["confidence"]:
            out[idx] = cand
    return [kp or {"x": 0.0, "y": 0.0, "confidence": 0.0} for kp in out]


def detect_walking_direction(keypoints: List[Dict]) -> str:
    """head (withers/neck) left of hips -> right_to_left (renderer:252-271)."""
    head_x = [keypoints[i]["x"] for i in (0, 1, 2)
              if keypoints[i]["confidence"] > 0.2]
    hip_x = [keypoints[i]["x"] for i in (4, 7, 3)
             if keypoints[i]["confidence"] > 0.2]
    if not head_x or not hip_x:
        return "unknown"
    return "left_to_right" if np.mean(head_x) > np.mean(hip_x) \
        else "right_to_left"


def _edge_color(edge: Tuple[int, int]) -> Tuple[int, int, int]:
    if edge in EDGES_FRONT_L:
        return SKELETON_COLORS["front_left"]
    if edge in EDGES_FRONT_R:
        return SKELETON_COLORS["front_right"]
    if edge in EDGES_HIND_L:
        return SKELETON_COLORS["hind_left"]
    if edge in EDGES_HIND_R:
        return SKELETON_COLORS["hind_right"]
    if edge in ((0, 1),):
        return SKELETON_COLORS["head"]
    return SKELETON_COLORS["spine"]


def draw_skeleton(frame: np.ndarray, keypoints: List[Dict],
                  conf_threshold: float = 0.25,
                  radius: int = 4, thickness: int = 2) -> np.ndarray:
    kps = reindex_keypoints(keypoints)
    for i, j in ALL_EDGES:
        if kps[i]["confidence"] > conf_threshold and \
                kps[j]["confidence"] > conf_threshold:
            p1 = (int(kps[i]["x"]), int(kps[i]["y"]))
            p2 = (int(kps[j]["x"]), int(kps[j]["y"]))
            cv2.line(frame, p1, p2, _edge_color((i, j)), thickness,
                     cv2.LINE_AA)
    for kp in kps:
        if kp["confidence"] > conf_threshold:
            cv2.circle(frame, (int(kp["x"]), int(kp["y"])), radius,
                       (255, 255, 255), -1, cv2.LINE_AA)
            cv2.circle(frame, (int(kp["x"]), int(kp["y"])), radius,
                       (0, 0, 0), 1, cv2.LINE_AA)
    return frame


def draw_detections(frame: np.ndarray, detections: List[Dict],
                    color=(0, 200, 0)) -> np.ndarray:
    for det in detections:
        b = det.get("bbox")
        if not b:
            continue
        cv2.rectangle(frame, (int(b[0]), int(b[1])), (int(b[2]), int(b[3])),
                      color, 2)
        label = f"{det.get('class', 'cow')} {det.get('confidence', 0):.2f}"
        cv2.putText(frame, label, (int(b[0]), max(12, int(b[1]) - 5)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA)
    return frame


def draw_info_overlay(frame: np.ndarray, lines: List[str]) -> np.ndarray:
    pad, lh = 8, 20
    h = pad * 2 + lh * len(lines)
    w = max((len(l) for l in lines), default=0) * 9 + pad * 2
    overlay = frame.copy()
    cv2.rectangle(overlay, (5, 5), (5 + w, 5 + h), (0, 0, 0), -1)
    frame = cv2.addWeighted(overlay, 0.55, frame, 0.45, 0)
    for i, line in enumerate(lines):
        cv2.putText(frame, line, (5 + pad, 5 + pad + lh * (i + 1) - 6),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1,
                    cv2.LINE_AA)
    return frame


class AnnotationRenderer:
    def __init__(self, dirs):
        self.dirs = dirs
        self.out_dir = dirs.root and Path(dirs.root) / "annotated"
        Path(self.out_dir).mkdir(parents=True, exist_ok=True)
        self.status: Dict[str, Dict[str, Any]] = {}

    def render(self, video_id: str,
               video_path: Optional[Path] = None) -> Optional[Path]:
        """Overlay skeletons (tleap), boxes (yolo) and an info banner on the
        processed video (renderer:626-860)."""
        if video_path is None:
            candidates = (list(self.dirs.processed.glob(
                f"{video_id}_cropped.mp4"))
                + list(self.dirs.videos.glob(f"{video_id}.*")))
            if not candidates:
                self.status[video_id] = {"status": "failed",
                                         "error": "video not found"}
                return None
            video_path = candidates[0]
        self.status[video_id] = {"status": "rendering"}
        yolo = self._read("yolo", video_id) or {}
        tleap = self._read("tleap", video_id) or {}
        fusion = self._read("fusion", video_id) or {}

        dets_by_frame: Dict[int, List[Dict]] = {}
        for entry in yolo.get("detections", []):
            dets_by_frame[entry["frame"]] = entry.get("detections", [])
        pose_by_frame: Dict[int, Dict] = {}
        for seq in tleap.get("pose_sequences", []):
            pose_by_frame[seq["frame"]] = seq

        prob = fusion.get("fusion_result", {}).get("final_probability")
        frames_out: List[np.ndarray] = []
        direction = "unknown"
        with VideoReader(video_path) as vr:
            for idx, frame_rgb in vr.frames(interval=1, rgb=False):
                frame = frame_rgb            # BGR for cv2 drawing
                near_det = self._nearest(dets_by_frame, idx, 15)
                if near_det is not None:
                    frame = draw_detections(frame, dets_by_frame[near_det])
                near_pose = self._nearest(pose_by_frame, idx, 15)
                if near_pose is not None:
                    kps = pose_by_frame[near_pose].get("keypoints", [])
                    frame = draw_skeleton(frame, kps)
                    d = detect_walking_direction(reindex_keypoints(kps))
                    if d != "unknown":
                        direction = d
                lines = [f"video: {video_id[:13]}", f"frame: {idx}",
                         f"direction: {direction}"]
                if prob is not None:
                    lines.append(f"lameness: {prob:.1%}")
                frame = draw_info_overlay(frame, lines)
                frames_out.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        out_path = Path(self.out_dir) / f"{video_id}_annotated.mp4"
        with VideoReader(video_path) as vr:
            fps = vr.info["fps"]
        write_video(out_path, frames_out, fps)
        self.status[video_id] = {"status": "completed",
                                 "output": str(out_path),
                                 "frames": len(frames_out)}
        return out_path

    @staticmethod
    def _nearest(d: Dict[int, Any], idx: int, tol: int) -> Optional[int]:
        if not d:
            return None
        best = min(d, key=lambda k: abs(k - idx))
        return best if abs(best - idx) <= tol else None

    def _read(self, pipeline: str, video_id: str) -> Optional[Dict]:
        f = self.dirs.results_for(pipeline) / f"{video_id}_{pipeline}.json"
        if f.exists():
            try:
                return json.load(open(f))
            except Exception:
                return None
        return None
