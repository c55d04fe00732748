#!/usr/bin/env python
"""Batch re-encode videos to pipeline-friendly mp4.

Equivalent of the reference's ``scripts/convert_videos.py`` /
``convert_uploaded_videos.py``: walks a directory, re-encodes anything
that is not decodable mp4 (cv2 first, ffmpeg when available).

Usage: python scripts/convert_videos.py SRC_DIR [DST_DIR]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    src = Path(sys.argv[1])
    dst = Path(sys.argv[2]) if len(sys.argv) > 2 else src / "converted"
    dst.mkdir(parents=True, exist_ok=True)

    from lameness_tpu.video.decode import VideoReader, write_video
    exts = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".mpg", ".wmv")
    done = skipped = failed = 0
    for f in sorted(src.iterdir()):
        if f.suffix.lower() not in exts or f.is_dir():
            continue
        out = dst / (f.stem + ".mp4")
        try:
            with VideoReader(f) as vr:
                info = vr.info
                frames = [fr for _, fr in vr.frames()]
            if not frames:
                raise IOError("no frames decoded")
            write_video(out, frames, info["fps"] or 25)
            done += 1
            print(f"ok   {f.name} -> {out.name} "
                  f"({len(frames)} frames @ {info['fps']:.1f} fps)")
        except Exception as e:
            failed += 1
            print(f"FAIL {f.name}: {e}")
    print(f"\nconverted {done}, failed {failed}")


if __name__ == "__main__":
    main()
