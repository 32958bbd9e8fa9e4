"""No-op detector (reference detection/none.py)."""
from __future__ import annotations

import numpy as np

from .common import CommonDetector


class NoneDetector(CommonDetector):
    async def _detect(self, image: np.ndarray, detect_size: int,
                      text_threshold: float, box_threshold: float,
                      unclip_ratio: float, verbose: bool = False):
        h, w = image.shape[:2]
        return [], np.zeros((h, w), np.uint8), None
