import asyncio

import cv2
import numpy as np

from manga_image_translator_tpu.mask_refinement import (
    complete_mask,
    dispatch,
    extend_rect,
)
from manga_image_translator_tpu.utils.geometry import Quadrilateral
from manga_image_translator_tpu.utils.textblock import TextBlock


def make_page(with_text_at):
    """White page with black text-ish blobs and a matching raw mask."""
    img = np.full((200, 200, 3), 255, np.uint8)
    mask = np.zeros((200, 200), np.uint8)
    for (x, y, w, h) in with_text_at:
        # several "strokes" inside the line bbox
        for sx in range(x, x + w, 12):
            cv2.rectangle(img, (sx, y), (sx + 6, y + h), (0, 0, 0), -1)
            cv2.rectangle(mask, (sx, y), (sx + 6, y + h), 255, -1)
    return img, mask


def test_extend_rect_clamps():
    assert extend_rect(0, 0, 10, 10, 100, 100, 5) == (0, 0, 20, 20)
    x, y, w, h = extend_rect(90, 90, 10, 10, 100, 100, 5)
    assert x == 85 and y == 85
    assert x + w <= 100 and y + h <= 100


def test_complete_mask_covers_text():
    img, mask = make_page([(40, 40, 80, 20)])
    q = Quadrilateral(np.array([[38, 38], [122, 38], [122, 62], [38, 62]]),
                      '', 1.0)
    out = complete_mask(img, mask.copy(), [q], kernel_size=3)
    assert out is not None
    # text pixels must be masked
    assert out[50, 42] > 0
    # far-away pixels must not
    assert out[150, 150] == 0


def test_complete_mask_ignores_distant_ccs():
    img, mask = make_page([(40, 40, 60, 16), (150, 150, 30, 30)])
    # only one textline, at the first location
    q = Quadrilateral(np.array([[38, 38], [102, 38], [102, 58], [38, 58]]),
                      '', 1.0)
    out = complete_mask(img, mask.copy(), [q], kernel_size=3)
    assert out is not None
    assert out[170, 160] == 0  # distant CC not attributed to the line


def test_dispatch_end_to_end():
    img, mask = make_page([(40, 40, 80, 20)])
    blk = TextBlock([[[38, 38], [122, 38], [122, 62], [38, 62]]], texts=['x'])
    out = asyncio.run(dispatch([blk], img, mask))
    assert out.shape == img.shape[:2]
    assert out.dtype == np.uint8
    assert out.max() == 255


def test_dispatch_empty_regions():
    img, mask = make_page([])
    out = asyncio.run(dispatch([], img, mask))
    assert out.shape == img.shape[:2]
    assert out.max() == 0
