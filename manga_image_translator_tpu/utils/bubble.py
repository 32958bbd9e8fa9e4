"""Bubble vs free-text heuristic (contract: reference utils/bubble.py)."""
from __future__ import annotations

import cv2
import numpy as np


def check_color(image: np.ndarray) -> bool:
    """True when the region contains saturated (non-grayscale) pixels."""
    gray = np.dot(image[..., :3], [0.299, 0.587, 0.114])[..., None]
    color_distance = np.sum((image - gray) ** 2, axis=-1)
    return int(np.sum(color_distance > 100)) > 10


def is_ignore(region_img: np.ndarray, ignore_bubble: int = 0) -> bool:
    """Decide whether a text region sits outside a speech bubble.

    Ratio of black pixels in the 2px border band: near 0 (white bubble) or
    near 100 (black bubble) means a normal bubble; in-between means free
    text over artwork, which gets skipped when ``ignore_bubble`` is set
    (valid range 1..50).
    """
    if ignore_bubble < 1 or ignore_bubble > 50:
        return False
    _, binary = cv2.threshold(region_img, 127, 255, cv2.THRESH_BINARY)
    h, w = binary.shape[:2]
    bands = [binary[0:2, 0:w], binary[h - 2:h, 0:w],
             binary[2:h - 2, 0:2], binary[2:h - 2, w - 2:w]]
    val0 = sum(int(np.sum(b.ravel() == 0)) for b in bands)
    total = sum(b.size for b in bands)
    ratio = round(val0 / max(total, 1), 6) * 100
    if ignore_bubble <= ratio <= (100 - ignore_bubble):
        return True
    return check_color(region_img)
