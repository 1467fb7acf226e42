"""Image-sequence <-> video converters.

TPU-port of the reference's two standalone cv2 glue tools
(``tools/image_to_video.py:1-66`` and ``tools/video_to_image.py:1-38``) as
library functions + one CLI. Deliberate deviations from the reference
scripts, which are one-off helpers hard-wired to their author's run:

* no ``cv2.imshow`` preview, no hard-coded start index 3700, no vertical
  flip — those are session artifacts, not behavior worth preserving;
* frames are sorted and written deterministically; directory creation is
  handled here instead of failing.

Usage::

    python -m pram_tpu.utils.video to-video  --image_dir d --video_path v.mp4
    python -m pram_tpu.utils.video to-images --video_path v.mp4 --image_dir d
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

_IMG_EXTS = (".jpg", ".jpeg", ".png")


def images_to_video(
    image_dir: str,
    video_path: str,
    fps: int = 30,
    height: int = -1,
) -> int:
    """Encode the sorted jpg/png frames of ``image_dir`` into an mp4.

    height: output frame height (-1 = first frame's native height); widths
    follow the first frame's aspect ratio. Returns the frame count.
    """
    import cv2

    names = sorted(
        n for n in os.listdir(image_dir)
        if os.path.splitext(n)[1].lower() in _IMG_EXTS
    )
    if not names:
        raise ValueError(f"no jpg/png images in {image_dir}")
    first = cv2.imread(os.path.join(image_dir, names[0]))
    if first is None:
        raise ValueError(f"unreadable first frame {names[0]}")
    if height <= 0:
        height = first.shape[0]
    width = int(round(first.shape[1] * height / first.shape[0]))
    writer = cv2.VideoWriter(
        video_path,
        cv2.VideoWriter_fourcc(*"mp4v"),
        fps,
        (width, height),
    )
    try:
        n = 0
        for name in names:
            frame = cv2.imread(os.path.join(image_dir, name), 1)
            if frame is None:
                continue
            if frame.shape[:2] != (height, width):
                frame = cv2.resize(frame, (width, height))
            writer.write(frame)
            n += 1
    finally:
        writer.release()
    return n


def video_to_images(
    video_path: str,
    image_dir: str,
    sample_ratio: int = -1,
    height: int = -1,
    name_fmt: str = "{:06d}.png",
) -> int:
    """Dump video frames as numbered pngs (every ``sample_ratio``-th frame
    when > 0; optionally resized to ``height``). Returns frames written.

    Frame numbering counts SOURCE frames (skipped frames advance the
    counter), matching the reference's naming so downstream pose files
    keyed by frame index stay aligned.
    """
    import cv2

    os.makedirs(image_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise ValueError(f"cannot open video {video_path}")
    written = 0
    nframe = 0
    try:
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            if sample_ratio <= 0 or nframe % sample_ratio == 0:
                if height > 0 and frame.shape[0] != height:
                    w = int(round(frame.shape[1] * height / frame.shape[0]))
                    frame = cv2.resize(frame, (w, height))
                cv2.imwrite(
                    os.path.join(image_dir, name_fmt.format(nframe)), frame
                )
                written += 1
            nframe += 1
    finally:
        cap.release()
    return written


def main(argv: Optional[list] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    tv = sub.add_parser("to-video", help="image dir -> mp4")
    tv.add_argument("--image_dir", required=True)
    tv.add_argument("--video_path", required=True)
    tv.add_argument("--fps", type=int, default=30)
    tv.add_argument("--height", type=int, default=-1)
    ti = sub.add_parser("to-images", help="video -> numbered pngs")
    ti.add_argument("--video_path", required=True)
    ti.add_argument("--image_dir", required=True)
    ti.add_argument("--sample_ratio", type=int, default=-1)
    ti.add_argument("--height", type=int, default=-1)
    args = ap.parse_args(argv)
    if args.cmd == "to-video":
        n = images_to_video(
            args.image_dir, args.video_path, args.fps, args.height
        )
        print(f"wrote {n} frames -> {args.video_path}")
    else:
        n = video_to_images(
            args.video_path, args.image_dir, args.sample_ratio, args.height
        )
        print(f"wrote {n} frames -> {args.image_dir}")


if __name__ == "__main__":
    main()
