"""Dataset input: image folders (+ undistortion) and synthetic streams.

== the input side of main_on_images.cpp (file list + undistort + feed) and
InputImageStream. Image decode uses PIL; undistortion is the device gather
from lsd_slam_tpu.camera.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from lsd_slam_tpu.camera import Undistorter, undistorter_for_file

_IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".pgm", ".ppm", ".bmp", ".tif"}


class ImageFolderSource:
    """Sorted image files from a directory, grayscale, undistorted.

    == main_on_images.cpp:222-268 (getdir + imread + undistort)."""

    def __init__(self, image_dir: str, calib_file: Optional[str] = None,
                 undistorter: Optional[Undistorter] = None):
        self.image_dir = image_dir
        self.files: List[str] = sorted(
            os.path.join(image_dir, f) for f in os.listdir(image_dir)
            if os.path.splitext(f)[1].lower() in _IMAGE_EXTS)
        if undistorter is None and calib_file is not None:
            undistorter = undistorter_for_file(calib_file)
        self.undistorter = undistorter
        self.camera = undistorter.camera if undistorter else None

    def __len__(self) -> int:
        return len(self.files)

    def read(self, idx: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.files[idx]).convert("L")
        arr = np.asarray(img, np.float32)
        if self.undistorter is not None:
            arr = np.asarray(self.undistorter(arr))
        return arr

    def __iter__(self) -> Iterator[Tuple[int, float, np.ndarray]]:
        for i in range(len(self.files)):
            # timestamps from filename if numeric, else index/30s
            stem = os.path.splitext(os.path.basename(self.files[i]))[0]
            try:
                ts = float(stem)
            except ValueError:
                ts = i / 30.0
            yield i, ts, self.read(i)
