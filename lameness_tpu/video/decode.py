"""Host video decode/encode (cv2) feeding device-resident pipelines.

The reference decodes the same video once per service (4× redundant decode,
SURVEY.md §3.1); here a single ``VideoReader`` pass yields frames once and
every model view is produced on device (``ops/preprocess.py``).
Encoding uses cv2's VideoWriter (mp4v), with an ffmpeg re-encode pass when
the binary exists (clip-curation:487-497 behavior).
"""
from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import cv2
import numpy as np


class VideoReader:
    def __init__(self, path: Path):
        self.path = Path(path)
        self.cap = cv2.VideoCapture(str(path))
        if not self.cap.isOpened():
            raise IOError(f"failed to open video: {path}")

    @property
    def info(self) -> Dict[str, float]:
        fps = self.cap.get(cv2.CAP_PROP_FPS)
        total = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        return {
            "fps": fps,
            "width": int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            "total_frames": total,
            "duration": total / fps if fps > 0 else 0,
        }

    def frames(self, interval: int = 1, rgb: bool = True
               ) -> Iterator[Tuple[int, np.ndarray]]:
        """Yield (frame_index, HWC uint8) every `interval`-th frame."""
        idx = 0
        while True:
            ret, frame = self.cap.read()
            if not ret:
                break
            if idx % interval == 0:
                if rgb:
                    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                yield idx, frame
            idx += 1

    def read_sampled(self, interval: int = 1, rgb: bool = True,
                     max_frames: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Decode sampled frames into one array: (frames (T,H,W,3), idx (T,))."""
        out, indices = [], []
        for i, f in self.frames(interval, rgb):
            out.append(f)
            indices.append(i)
            if max_frames and len(out) >= max_frames:
                break
        if not out:
            return (np.zeros((0, 0, 0, 3), np.uint8), np.zeros(0, np.int64))
        return np.stack(out), np.asarray(indices, np.int64)

    def read_selected(self, indices, rgb: bool = True):
        """Decode only the requested frame indices (sorted), using cheap
        ``grab()`` to skip frames that are never consumed — the engine's
        stage subsets touch ~36 of a canonical clip's 125 frames, so this
        cuts host decode work ~3x.

        Returns dict {index: frame (H, W, 3) uint8}.
        """
        import cv2 as _cv2
        wanted = sorted(set(int(i) for i in indices))
        out = {}
        if not wanted:
            return out
        last = wanted[-1]
        pos = 0
        w_iter = iter(wanted)
        nxt = next(w_iter)
        while pos <= last:
            if pos == nxt:
                ok, frame = self.cap.read()
                if not ok:
                    break
                if rgb:
                    frame = _cv2.cvtColor(frame, _cv2.COLOR_BGR2RGB)
                out[pos] = frame
                try:
                    nxt = next(w_iter)
                except StopIteration:
                    break
            else:
                if not self.cap.grab():
                    break
            pos += 1
        return out

    def release(self):
        self.cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.release()


def sample_interval(fps: float, target_fps: float) -> int:
    """The reference's sampling rule: max(1, int(fps) // target)."""
    return max(1, int(fps) // int(target_fps))


def write_video(path: Path, frames: List[np.ndarray], fps: float,
                is_rgb: bool = True, reencode: bool = True) -> bool:
    """Write frames (HWC uint8) to mp4; optional ffmpeg libx264 re-encode."""
    if not frames:
        return False
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                          fps, (w, h))
    for f in frames:
        if is_rgb:
            f = cv2.cvtColor(f, cv2.COLOR_RGB2BGR)
        out.write(f)
    out.release()
    if reencode and shutil.which("ffmpeg"):
        tmp = path.with_suffix(".temp.mp4")
        path.rename(tmp)
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-i", str(tmp), "-c:v", "libx264",
                 "-preset", "medium", "-crf", "23", "-pix_fmt", "yuv420p",
                 str(path)], capture_output=True, check=True)
            tmp.unlink()
        except Exception:
            if tmp.exists():
                tmp.rename(path)
    return True
