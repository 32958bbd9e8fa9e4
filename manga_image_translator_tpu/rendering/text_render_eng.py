"""manga2eng renderer: English typesetting centered in speech balloons.

Behavioral contract from reference ``rendering/text_render_eng.py`` +
``ballon_extractor.py``: estimate the balloon's free region via flood fill
from the text block, word-wrap the translation to the balloon width, shrink
the font until it fits (bounded by downscale_constraint), center the lines.
"""
from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np
from PIL import Image, ImageDraw

from ..utils.textblock import TextBlock
from . import text_render


def extract_ballon_region(img: np.ndarray, xyxy, enlarge_ratio: float = 2.0):
    """Estimate the balloon interior around a text bbox by flood filling the
    (assumed near-uniform) background from points just outside the text."""
    x1, y1, x2, y2 = [int(v) for v in xyxy]
    h, w = img.shape[:2]
    cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
    bw, bh = x2 - x1, y2 - y1
    ex1 = max(int(cx - bw * enlarge_ratio / 2), 0)
    ey1 = max(int(cy - bh * enlarge_ratio / 2), 0)
    ex2 = min(int(cx + bw * enlarge_ratio / 2), w)
    ey2 = min(int(cy + bh * enlarge_ratio / 2), h)
    crop = img[ey1:ey2, ex1:ex2]
    gray = cv2.cvtColor(crop, cv2.COLOR_RGB2GRAY)
    _, binary = cv2.threshold(gray, 127, 255, cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    # flood from the text-bbox corner band (likely balloon interior)
    mask = np.zeros((binary.shape[0] + 2, binary.shape[1] + 2), np.uint8)
    seed = (min(max(cx - ex1, 0), binary.shape[1] - 1),
            min(max(y1 - ey1 - 2, 0), binary.shape[0] - 1))
    ff = binary.copy()
    try:
        cv2.floodFill(ff, mask, seed, 128, loDiff=30, upDiff=30)
        region = (ff == 128).astype(np.uint8) * 255
        if region.sum() == 0:
            raise ValueError
    except Exception:
        region = np.full_like(binary, 255)
    return region, (ex1, ey1, ex2, ey2)


def render_textblock_list_eng(img: np.ndarray, text_regions: List[TextBlock],
                              line_spacing: float = 0,
                              size_tol: float = 1.2,
                              original_img: Optional[np.ndarray] = None,
                              downscale_constraint: float = 0.8,
                              disable_font_border: bool = False
                              ) -> np.ndarray:
    for region in text_regions:
        if not region.translation:
            continue
        fg, bg = region.get_font_colors()
        if disable_font_border:
            bg = None
        x1, y1, x2, y2 = [int(v) for v in region.xyxy]
        bw = max(x2 - x1, 8)
        bh = max(y2 - y1, 8)
        text = region.get_translation_for_rendering()

        font_size = max(int(region.font_size), 8)
        min_size = max(int(font_size * downscale_constraint), 6)
        chosen = None
        for fs in range(font_size, min_size - 1, -2):
            font = text_render.get_cached_font(fs)
            lines = text_render._break_text(font, text, bw * size_tol)
            total_h = len(lines) * int(fs * (1.15 + line_spacing))
            if total_h <= bh * size_tol:
                chosen = (fs, lines)
                break
        if chosen is None:
            font = text_render.get_cached_font(min_size)
            chosen = (min_size, text_render._break_text(font, text,
                                                        bw * size_tol))
        fs, lines = chosen
        box = text_render.put_text_horizontal(
            fs, ' '.join(lines) if False else text, bw, bh, 'center', False,
            fg, bg, region.target_lang, True, line_spacing or None)
        gh, gw = box.shape[:2]
        # center the rendered box on the region center
        cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
        ox1 = max(cx - gw // 2, 0)
        oy1 = max(cy - gh // 2, 0)
        ox2 = min(ox1 + gw, img.shape[1])
        oy2 = min(oy1 + gh, img.shape[0])
        sub = box[:oy2 - oy1, :ox2 - ox1]
        alpha = sub[:, :, 3:4].astype(np.float32) / 255.0
        img[oy1:oy2, ox1:ox2] = np.clip(
            img[oy1:oy2, ox1:ox2].astype(np.float32) * (1 - alpha)
            + sub[:, :, :3].astype(np.float32) * alpha, 0, 255
        ).astype(np.uint8)
    return img
