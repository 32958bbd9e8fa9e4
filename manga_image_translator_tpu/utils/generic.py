"""Generic host utilities: Context, image IO, text helpers.

Behavioral contract from reference ``manga_translator/utils/generic.py``
(Context :28, load_image :223, dump_image :241) — new implementation.
"""
from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np
from PIL import Image


class Context(dict):
    """dict with attribute access; carries pipeline state between stages.

    Fields used by the pipeline: input, img_rgb, img_alpha, img_colorized,
    upscaled, textlines, mask_raw, mask, text_regions, img_inpainted,
    gimp_mask, img_rendered, result.
    """

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)


def load_image(img: Image.Image) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """PIL image -> (RGB uint8 array, optional alpha channel array)."""
    if img.mode == 'RGBA':
        arr = np.asarray(img)
        return arr[:, :, :3].copy(), arr[:, :, 3].copy()
    if img.mode == 'P':
        img = img.convert('RGBA')
        arr = np.asarray(img)
        return arr[:, :, :3].copy(), arr[:, :, 3].copy()
    if img.mode != 'RGB':
        img = img.convert('RGB')
    return np.asarray(img).copy(), None


def dump_image(rgb: np.ndarray, alpha: Optional[np.ndarray] = None) -> Image.Image:
    """(RGB array, optional alpha) -> PIL image."""
    rgb = np.asarray(rgb)
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    if alpha is not None:
        arr = np.dstack([rgb, np.asarray(alpha, dtype=np.uint8)])
        return Image.fromarray(arr, 'RGBA')
    return Image.fromarray(rgb, 'RGB')


def replace_prefix(s: str, old: str, new: str) -> str:
    return new + s[len(old):] if s.startswith(old) else s


def natural_sort(items):
    def key(text):
        return [int(tok) if tok.isdigit() else tok.lower()
                for tok in re.split(r'(\d+)', str(text))]
    return sorted(items, key=key)


def is_url(s: str) -> bool:
    return bool(re.match(r'^https?://', s))


def get_digest(path: str) -> str:
    import hashlib
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for blk in iter(lambda: f.read(1 << 20), b''):
            h.update(blk)
    return h.hexdigest()


def rgb2hex(r, g, b) -> str:
    return "#{:02x}{:02x}{:02x}".format(int(r), int(g), int(b))


def hex2rgb(h: str):
    h = h.lstrip('#')
    return tuple(int(h[i:i + 2], 16) for i in (0, 2, 4))


def color_difference(rgb1, rgb2) -> float:
    """CIE76 delta-E in L*a*b* space (reference utils/generic2.py)."""
    import cv2
    a = np.array([[rgb1]], dtype=np.uint8)
    b = np.array([[rgb2]], dtype=np.uint8)
    lab1 = cv2.cvtColor(a, cv2.COLOR_RGB2LAB).astype(np.float64)[0, 0]
    lab2 = cv2.cvtColor(b, cv2.COLOR_RGB2LAB).astype(np.float64)[0, 0]
    # OpenCV L channel is scaled to [0,255]; rescale to [0,100]
    lab1[0] *= 100.0 / 255.0
    lab2[0] *= 100.0 / 255.0
    return float(np.linalg.norm(lab1 - lab2))


_VALUABLE_RE = re.compile(r'[a-zA-Z0-9぀-ヿ㐀-䶿一-鿿'
                          r'가-힯Ѐ-ӿ]')


def is_valuable_text(text: str) -> bool:
    """True when the string contains at least one letter/digit/CJK/kana/hangul
    character (reference utils/generic2.py:66: punctuation-only OCR results are
    dropped before translation)."""
    return bool(_VALUABLE_RE.search(text))


def repeating_sequence(s: str) -> str:
    """Shortest prefix whose repetition yields the string (reference
    utils/generic.py): 'abcabcabc' -> 'abc'; returns s when non-repeating."""
    for i in range(1, len(s) // 2 + 1):
        seq = s[:i]
        if seq * (len(s) // len(seq)) + seq[:len(s) % len(seq)] == s:
            return seq
    return s


def findNextPowerOf2(n: int) -> int:
    i = 0
    while n != 0:
        i += 1
        n >>= 1
    return 1 << i
