"""Offline comparison-video compositor.

Equivalent of the reference's stitching utility
(lsd_slam_viewer/src/main_stitchVideos.cpp): take N directories of
numbered frame images (as dumped by the viewer's video mode,
PointCloudViewer.cpp:251), compose each frame index side-by-side /
grid-wise with optional per-pane labels, and write the stitched frames
to an output directory (encode with any external tool afterwards).

Usage:
    python -m lsd_slam_tpu.viewer.stitch out:/tmp/stitched \
        /run1/frames /run2/frames [cols:2] [label:run1,run2] [scale:0.5]
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional, Sequence

import numpy as np


def _load(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def _frame_list(d: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    return sorted(f for f in os.listdir(d) if f.lower().endswith(exts))


def _label(img: np.ndarray, text: str) -> np.ndarray:
    from PIL import Image, ImageDraw
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    draw.rectangle([4, 4, 10 + 7 * len(text), 22], fill=(0, 0, 0))
    draw.text((8, 6), text, fill=(255, 255, 255))
    return np.asarray(pil)


def stitch_grid(frames: Sequence[np.ndarray], cols: int) -> np.ndarray:
    """Compose frames into a row-major grid, padding panes to the max
    pane size and the last row with black."""
    h = max(f.shape[0] for f in frames)
    w = max(f.shape[1] for f in frames)
    padded = []
    for f in frames:
        p = np.zeros((h, w, 3), np.uint8)
        p[: f.shape[0], : f.shape[1]] = f
        padded.append(p)
    rows = (len(padded) + cols - 1) // cols
    while len(padded) < rows * cols:
        padded.append(np.zeros((h, w, 3), np.uint8))
    return np.concatenate(
        [np.concatenate(padded[r * cols:(r + 1) * cols], axis=1)
         for r in range(rows)], axis=0)


def stitch_dirs(dirs: Sequence[str], out_dir: str, cols: int = 0,
                labels: Optional[Sequence[str]] = None,
                scale: float = 1.0) -> int:
    """Stitch per-index frames from `dirs` into out_dir/%05d.png.

    Frame count = min over inputs (the reference holds the shorter video's
    last frame; truncating keeps all panes live). Returns frames written."""
    from PIL import Image
    lists = [_frame_list(d) for d in dirs]
    n = min(len(l) for l in lists)
    if n == 0:
        return 0
    cols = cols or len(dirs)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        panes = []
        for k, d in enumerate(dirs):
            img = _load(os.path.join(d, lists[k][i]))
            if scale != 1.0:
                pil = Image.fromarray(img)
                pil = pil.resize((max(1, int(img.shape[1] * scale)),
                                  max(1, int(img.shape[0] * scale))))
                img = np.asarray(pil)
            if labels and k < len(labels) and labels[k]:
                img = _label(img, labels[k])
            panes.append(img)
        Image.fromarray(stitch_grid(panes, cols)).save(
            os.path.join(out_dir, f"{i:05d}.png"))
    return n


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    out, cols, scale, labels, dirs = "", 0, 1.0, None, []
    for a in argv:
        if a.startswith("out:"):
            out = a[4:]
        elif a.startswith("cols:"):
            cols = int(a[5:])
        elif a.startswith("scale:"):
            scale = float(a[6:])
        elif a.startswith("label:"):
            labels = a[6:].split(",")
        else:
            dirs.append(a)
    if not out or not dirs:
        print(__doc__)
        return 2
    n = stitch_dirs(dirs, out, cols=cols, labels=labels, scale=scale)
    print(f"stitched {n} frames x {len(dirs)} panes -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
