"""Video / image-folder input readers with crop, resize and luma conversion.

Covers the reference input layer (v2e.py:339-356, 608-739 and
v2e_utils.ImageFolderReader): cv2 video decode or an ordered folder of
image files, optional (left,right,top,bottom) crop, INTER_AREA resize to the
output dimensions, and BGR->gray luma conversion.
"""
from __future__ import annotations

import logging
import os
from typing import Iterator, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".pgm")


class ImageFolderReader:
    """Reads an ordered folder of frames with the cv2.VideoCapture-ish API."""

    def __init__(self, folder: str, frame_rate: float):
        self.folder = folder
        self.frame_rate = frame_rate
        files = [
            f for f in sorted(os.listdir(folder))
            if f.lower().endswith(IMG_EXTENSIONS)
        ]
        if not files:
            raise ValueError(f"no image files found in {folder}")
        self.files = [os.path.join(folder, f) for f in files]
        self.num_frames = len(self.files)
        self.idx = 0
        import cv2

        probe = cv2.imread(self.files[0])
        self.frame_height, self.frame_width = probe.shape[:2]
        self.frame_channels = probe.shape[2] if probe.ndim == 3 else 1

    def read(self, skip: bool = False):
        import cv2

        if self.idx >= self.num_frames:
            return False, None
        if skip:
            self.idx += 1
            return True, None
        frame = cv2.imread(self.files[self.idx])
        self.idx += 1
        return True, frame

    def release(self) -> None:
        pass


def open_video_input(path: str, input_frame_rate: Optional[float] = None):
    """Open a video file or image folder; returns (cap, fps, n_frames, w, h)."""
    import cv2

    if os.path.isdir(path):
        if input_frame_rate is None:
            raise ValueError(
                "--input_frame_rate must be set when the input is a folder of images"
            )
        cap = ImageFolderReader(path, input_frame_rate)
        return cap, input_frame_rate, cap.num_frames, cap.frame_width, cap.frame_height
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"could not open video input {path}")
    fps = cap.get(cv2.CAP_PROP_FPS)
    if input_frame_rate is not None:
        logger.info(
            f"overriding video metadata frame rate {fps} with {input_frame_rate}"
        )
        fps = input_frame_rate
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    return cap, fps, n, w, h


def luma_frames(
    cap,
    output_width: Optional[int],
    output_height: Optional[int],
    crop: Optional[Tuple[int, int, int, int]] = None,
    start_frame: int = 0,
    stop_frame: Optional[int] = None,
    hdr: bool = False,
) -> Iterator[np.ndarray]:
    """Yield gray float32 frames, cropped and resized to the output size.

    Matches the reference stage-1 per-frame path (v2e.py:687-739): crop by
    (left,right,top,bottom), cv2 INTER_AREA resize, BGR->gray.
    """
    import cv2

    idx = 0
    while True:
        if stop_frame is not None and idx >= stop_frame:
            break
        ret, frame = cap.read() if not isinstance(cap, ImageFolderReader) else cap.read()
        if not ret or frame is None:
            break
        if idx < start_frame:
            idx += 1
            continue
        idx += 1
        if frame.ndim == 3:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if crop is not None:
            left, right, top, bottom = crop
            h, w = frame.shape
            frame = frame[top : h - bottom if bottom else h,
                          left : w - right if right else w]
        if output_width is not None and output_height is not None and (
            frame.shape[1] != output_width or frame.shape[0] != output_height
        ):
            frame = cv2.resize(
                frame, (output_width, output_height), interpolation=cv2.INTER_AREA
            )
        # keep uint8 (4x cheaper host->device); HDR inputs stay float
        yield frame if frame.dtype == np.uint8 and not hdr else frame.astype(
            np.float32
        )
