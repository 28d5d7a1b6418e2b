"""AVI video writing helper (reference v2e_utils.py:277-308)."""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def video_writer(output_path: str, height: int, width: int, frame_rate: int = 30):
    """Create a cv2 XVID VideoWriter like the reference."""
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"XVID")
    out = cv2.VideoWriter(output_path, fourcc, frame_rate, (width, height))
    logger.debug(
        f"opened {output_path} with XVID codec, {frame_rate} fps, {width}x{height}"
    )
    return out


def read_image(path: str):
    """Read an image as float grayscale (reference v2e_utils.py:335-349)."""
    import cv2
    import numpy as np

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    return np.array(img, dtype=np.float64)
