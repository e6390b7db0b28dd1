"""Extract frames from videos at a fixed fps with ffmpeg (dataset prep).

Counterpart of the reference's extractor (scripts/utils/frame_extraction.py):
each video becomes a directory of %06d.jpg frames at --fps (default 25),
which the eval datasets sample from (docs/prepare_*.md workflow). Parallel
across videos with a process pool.

Usage: python scripts/frame_extraction.py --video_dir X --frame_dir Y [--fps 25]
"""

from __future__ import annotations

import argparse
import os
import subprocess
from concurrent.futures import ProcessPoolExecutor

VIDEO_EXTS = (".mp4", ".mkv", ".avi", ".mov", ".webm")


def extract_one(task):
    src, dst, fps = task
    os.makedirs(dst, exist_ok=True)
    cmd = [
        "ffmpeg", "-nostdin", "-loglevel", "error", "-y",
        "-i", src, "-vf", f"fps={fps}", "-q:v", "2",
        os.path.join(dst, "%06d.jpg"),
    ]
    try:
        subprocess.run(cmd, check=True)
        return src, True
    except Exception:
        return src, False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", required=True)
    p.add_argument("--frame_dir", required=True)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    args = p.parse_args()

    tasks = []
    for name in sorted(os.listdir(args.video_dir)):
        if not name.lower().endswith(VIDEO_EXTS):
            continue
        stem = os.path.splitext(name)[0]
        dst = os.path.join(args.frame_dir, stem)
        if os.path.isdir(dst) and os.listdir(dst):
            continue  # already extracted
        tasks.append((os.path.join(args.video_dir, name), dst, args.fps))

    print(f"extracting {len(tasks)} videos at {args.fps} fps")
    with ProcessPoolExecutor(max_workers=args.workers) as ex:
        for src, ok in ex.map(extract_one, tasks):
            if not ok:
                print("FAILED:", src)


if __name__ == "__main__":
    main()
