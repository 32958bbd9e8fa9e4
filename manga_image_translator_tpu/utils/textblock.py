"""TextBlock: a merged multi-line text region.

Behavioral contract from reference ``manga_translator/utils/textblock.py:39-466``
(fields, derived geometry, direction/alignment resolution, render-text
post-processing). Re-implemented with numpy + cv2 only.
"""
from __future__ import annotations

import copy
import re
import unicodedata
from functools import cached_property
from typing import List, Optional, Tuple

import cv2
import numpy as np

from .generic import color_difference
from .geometry import convex_area

# Render direction by target language (reference textblock.py:14-36).
LANGUAGE_ORIENTATION_PRESETS = {
    'CHS': 'auto', 'CHT': 'auto', 'CSY': 'h', 'NLD': 'h', 'ENG': 'h',
    'FRA': 'h', 'DEU': 'h', 'HUN': 'h', 'ITA': 'h', 'JPN': 'auto',
    'KOR': 'h', 'POL': 'h', 'PTB': 'h', 'ROM': 'h', 'RUS': 'h', 'ESP': 'h',
    'TRK': 'h', 'UKR': 'h', 'VIN': 'h', 'ARA': 'hr', 'FIL': 'h',
}


def is_right_to_left_char(ch: str) -> bool:
    return unicodedata.bidirectional(ch) in ('R', 'AL', 'AN')


def is_valuable_char(ch: str) -> bool:
    return ch.isalnum()


def rotate_polygons(center, polygons, rotation, new_center=None, to_int=True):
    """Rotate flat (N,8) polygons about ``center`` by ``rotation`` degrees."""
    if rotation == 0:
        return polygons
    if new_center is None:
        new_center = center
    rot = np.deg2rad(rotation)
    s, c = np.sin(rot), np.cos(rot)
    polygons = polygons.astype(np.float32).copy()
    polygons[:, 1::2] -= center[1]
    polygons[:, ::2] -= center[0]
    rotated = polygons.copy()
    rotated[:, 1::2] = polygons[:, 1::2] * c - polygons[:, ::2] * s
    rotated[:, ::2] = polygons[:, 1::2] * s + polygons[:, ::2] * c
    rotated[:, 1::2] += new_center[1]
    rotated[:, ::2] += new_center[0]
    return rotated.astype(np.int64) if to_int else rotated


def _simple_langid(text: str) -> str:
    """Heuristic source-language guess from unicode script composition.

    Stands in for py3langid (not available in this environment); only needs
    to be good enough for skip-lang / orientation decisions.
    """
    counts = {'ja': 0, 'ko': 0, 'zh': 0, 'ru': 0, 'ar': 0, 'en': 0}
    for ch in text:
        o = ord(ch)
        if 0x3040 <= o <= 0x30FF:
            counts['ja'] += 1
        elif 0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF:
            counts['ko'] += 1
        elif 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
            counts['zh'] += 1
        elif 0x0400 <= o <= 0x04FF:
            counts['ru'] += 1
        elif 0x0600 <= o <= 0x06FF:
            counts['ar'] += 1
        elif ch.isascii() and ch.isalpha():
            counts['en'] += 1
    # kana implies Japanese even with many kanji
    if counts['ja'] > 0:
        return 'ja'
    best = max(counts, key=counts.get)
    return best if counts[best] > 0 else 'en'


class TextBlock:
    """A block of text made up of textlines."""

    def __init__(self, lines, texts: Optional[List[str]] = None,
                 language: str = 'unknown', font_size: float = -1,
                 angle: float = 0, translation: str = "",
                 fg_color: Tuple[float, ...] = (0, 0, 0),
                 bg_color: Tuple[float, ...] = (0, 0, 0),
                 line_spacing=1., letter_spacing=1., font_family: str = "",
                 bold: bool = False, underline: bool = False,
                 italic: bool = False, direction: str = 'auto',
                 alignment: str = 'auto', rich_text: str = "",
                 _bounding_rect: Optional[List] = None,
                 default_stroke_width=0.2, font_weight=50,
                 source_lang: str = "", target_lang: str = "",
                 opacity: float = 1., shadow_radius: float = 0.,
                 shadow_strength: float = 1., shadow_color: Tuple = (0, 0, 0),
                 shadow_offset: Optional[List] = None, prob: float = 1,
                 **kwargs) -> None:
        self.lines = np.array(lines, dtype=np.int32)
        self.language = language
        self.font_size = round(font_size)
        self.angle = angle
        self._direction = direction

        self.texts = texts if texts is not None else []
        # Join line texts: no space between CJK boundaries (reference
        # textblock.py:80-89).
        self.text = self.texts[0] if self.texts else ''
        if self.text and len(self.texts) > 1:
            for txt in self.texts[1:]:
                first_cjk = '　' <= self.text[-1] <= '鿿'
                second_cjk = bool(txt) and ('　' <= txt[0] <= '鿿')
                self.text += txt if (first_cjk or second_cjk) else ' ' + txt
        self.prob = prob
        self.translation = translation

        self.fg_colors = np.array(fg_color, dtype=np.float64)
        self.bg_colors = np.array(bg_color, dtype=np.float64)

        self.font_family = font_family
        self.bold = bold
        self.underline = underline
        self.italic = italic
        self.rich_text = rich_text
        self.line_spacing = line_spacing
        self.letter_spacing = letter_spacing
        self._alignment = alignment
        self._source_lang = source_lang
        self.target_lang = target_lang
        self._bounding_rect = _bounding_rect
        self.default_stroke_width = default_stroke_width
        self.font_weight = font_weight
        self.adjust_bg_color = True
        self.opacity = opacity
        self.shadow_radius = shadow_radius
        self.shadow_strength = shadow_strength
        self.shadow_color = shadow_color
        self.shadow_offset = shadow_offset if shadow_offset is not None else [0, 0]

    # -- geometry ------------------------------------------------------------
    @cached_property
    def xyxy(self) -> np.ndarray:
        return np.array([self.lines[..., 0].min(), self.lines[..., 1].min(),
                         self.lines[..., 0].max(), self.lines[..., 1].max()],
                        dtype=np.int32)

    @cached_property
    def xywh(self) -> np.ndarray:
        x1, y1, x2, y2 = self.xyxy
        return np.array([x1, y1, x2 - x1, y2 - y1], dtype=np.int32)

    @cached_property
    def center(self) -> np.ndarray:
        xyxy = np.asarray(self.xyxy, dtype=np.float64)
        return (xyxy[:2] + xyxy[2:]) / 2

    @cached_property
    def unrotated_polygons(self) -> np.ndarray:
        polygons = self.lines.reshape(-1, 8)
        if self.angle != 0:
            polygons = rotate_polygons(self.center, polygons, self.angle)
        return polygons

    @cached_property
    def unrotated_min_rect(self) -> np.ndarray:
        polygons = self.unrotated_polygons
        min_x, min_y = polygons[:, ::2].min(), polygons[:, 1::2].min()
        max_x, max_y = polygons[:, ::2].max(), polygons[:, 1::2].max()
        box = np.array([[min_x, min_y, max_x, min_y, max_x, max_y,
                         min_x, max_y]])
        return box.reshape(-1, 4, 2).astype(np.int64)

    @cached_property
    def min_rect(self) -> np.ndarray:
        polygons = self.unrotated_polygons
        min_x, min_y = polygons[:, ::2].min(), polygons[:, 1::2].min()
        max_x, max_y = polygons[:, ::2].max(), polygons[:, 1::2].max()
        box = np.array([[min_x, min_y, max_x, min_y, max_x, max_y, min_x, max_y]])
        if self.angle != 0:
            box = rotate_polygons(self.center, box, -self.angle)
        return box.clip(0).reshape(-1, 4, 2).astype(np.int64)

    @cached_property
    def unrotated_size(self) -> Tuple[float, float]:
        mid = (self.min_rect[:, [1, 2, 3, 0]] + self.min_rect) / 2
        norm_h = np.linalg.norm(mid[:, 1] - mid[:, 3])
        norm_v = np.linalg.norm(mid[:, 2] - mid[:, 0])
        return norm_h, norm_v

    @cached_property
    def aspect_ratio(self) -> float:
        w, h = self.unrotated_size
        return w / max(h, 1e-9)

    @property
    def area(self) -> float:
        return convex_area(self.min_rect[0])

    @property
    def real_area(self) -> float:
        return convex_area(self.lines.reshape(-1, 2))

    def normalized_width_list(self) -> List[float]:
        polygons = self.unrotated_polygons
        widths = np.array([(p[[2, 4]] - p[[0, 6]]).sum() for p in polygons],
                          dtype=np.float64)
        return (widths / widths.sum()).tolist()

    def __len__(self):
        return len(self.lines)

    def __getitem__(self, idx):
        return self.lines[idx]

    def to_dict(self):
        return copy.deepcopy(vars(self))

    # -- crops ---------------------------------------------------------------
    @property
    def src_is_vertical(self) -> bool:
        return getattr(self, '_src_is_vertical', self.vertical)

    @src_is_vertical.setter
    def src_is_vertical(self, v: bool):
        self._src_is_vertical = v

    def get_transformed_region(self, img: np.ndarray, line_idx: int,
                               textheight: Optional[int],
                               maxwidth: Optional[int] = None) -> np.ndarray:
        """Perspective-rectify one line of this block out of ``img``."""
        im_h, im_w = img.shape[:2]
        line = np.round(np.array(self.lines[line_idx])).astype(np.int64)
        x1 = int(np.clip(line[:, 0].min(), 0, im_w))
        y1 = int(np.clip(line[:, 1].min(), 0, im_h))
        x2 = int(np.clip(line[:, 0].max(), 0, im_w))
        y2 = int(np.clip(line[:, 1].max(), 0, im_h))
        crop = img[y1:y2, x1:x2]

        direction = 'v' if self.src_is_vertical else 'h'
        src_pts = line.copy()
        src_pts[:, 0] -= x1
        src_pts[:, 1] -= y1
        mid = (src_pts[[1, 2, 3, 0]] + src_pts) / 2
        norm_v = np.linalg.norm(mid[2] - mid[0])
        norm_h = np.linalg.norm(mid[1] - mid[3])
        if textheight is None:
            textheight = int(norm_v if direction == 'h' else norm_h)
        if norm_v <= 0 or norm_h <= 0:
            return np.zeros((textheight, textheight, 3), dtype=np.uint8)
        ratio = norm_v / norm_h

        if direction == 'h':
            h = int(textheight)
            w = int(round(textheight / ratio))
        else:
            w = int(textheight)
            h = int(round(textheight * ratio))
        dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                       dtype=np.float32)
        M = cv2.getPerspectiveTransform(src_pts.astype(np.float32), dst)
        region = cv2.warpPerspective(crop, M, (w, h))
        if direction == 'v':
            region = cv2.rotate(region, cv2.ROTATE_90_COUNTERCLOCKWISE)
        if maxwidth is not None and region.shape[1] > maxwidth:
            region = cv2.resize(region, (maxwidth, region.shape[0]))
        return region

    # -- language / rendering ------------------------------------------------
    @property
    def source_lang(self):
        if not self._source_lang:
            self._source_lang = _simple_langid(self.text)
        return self._source_lang

    def get_translation_for_rendering(self) -> str:
        """Reverse embedded LTR runs when rendering right-to-left."""
        text = self.translation
        if not self.direction.endswith('r'):
            return text
        chars = list(text)
        l2r_idx = -1

        def reverse_sublist(lst, i1, i2):
            lst[i1:i2] = lst[i1:i2][::-1]

        i = -1
        for i, c in enumerate(text):
            if not is_right_to_left_char(c) and is_valuable_char(c):
                if l2r_idx < 0:
                    l2r_idx = i
            elif l2r_idx >= 0 and i - l2r_idx > 1:
                reverse_sublist(chars, l2r_idx, i)
                l2r_idx = -1
        if l2r_idx >= 0 and i - l2r_idx > 1:
            reverse_sublist(chars, l2r_idx, len(chars))
        return ''.join(chars)

    @property
    def is_bulleted_list(self) -> bool:
        if len(self.texts) <= 1:
            return False
        bullet_regexes = [r'[^\w\s]', r'[\d]+\.', r'[QA]:']
        bullet_type_idx = -1
        for line_text in self.texts:
            for i, breg in enumerate(bullet_regexes):
                if re.search(r'(?:[\n]|^)((?:' + breg + r')[\s]*)', line_text):
                    if bullet_type_idx >= 0 and bullet_type_idx != i:
                        return False
                    bullet_type_idx = i
        return bullet_type_idx >= 0

    def set_font_colors(self, fg_colors, bg_colors):
        self.fg_colors = np.array(fg_colors, dtype=np.float64)
        self.bg_colors = np.array(bg_colors, dtype=np.float64)

    def update_font_colors(self, fg_colors: np.ndarray, bg_colors: np.ndarray):
        nlines = len(self)
        if nlines > 0:
            self.fg_colors = self.fg_colors + np.asarray(fg_colors) / nlines
            self.bg_colors = self.bg_colors + np.asarray(bg_colors) / nlines

    def get_font_colors(self, bgr: bool = False):
        frgb = np.array(self.fg_colors).astype(np.int32)
        brgb = np.array(self.bg_colors).astype(np.int32)
        if bgr:
            frgb, brgb = frgb[::-1], brgb[::-1]
        if self.adjust_bg_color and color_difference(
                np.clip(frgb, 0, 255), np.clip(brgb, 0, 255)) < 30:
            brgb = (255, 255, 255) if frgb.mean() <= 127 else (0, 0, 0)
        return frgb, brgb

    @property
    def direction(self) -> str:
        """Render direction from explicit setting, language preset, or the
        aspect ratio of the largest line box (reference textblock.py:370-409)."""
        if self._direction in ('h', 'v', 'hr', 'vr'):
            return self._direction
        d = LANGUAGE_ORIENTATION_PRESETS.get(self.target_lang)
        if d in ('h', 'v', 'hr', 'vr'):
            return d
        if len(self.lines) > 0:
            max_area, largest_ar = 0.0, 1.0
            for line in self.lines:
                area = convex_area(line)
                if area > max_area:
                    max_area = area
                    w = line[:, 0].max() - line[:, 0].min()
                    h = line[:, 1].max() - line[:, 1].min()
                    largest_ar = w / h if h > 0 else 1
            return 'v' if largest_ar < 1 else 'h'
        return 'v' if self.aspect_ratio < 1 else 'h'

    @property
    def vertical(self) -> bool:
        return self.direction.startswith('v')

    @property
    def horizontal(self) -> bool:
        return self.direction.startswith('h')

    @property
    def alignment(self) -> str:
        if self._alignment in ('left', 'center', 'right'):
            return self._alignment
        if len(self.lines) == 1:
            return 'center'
        if self.direction == 'h':
            return 'center'
        if self.direction == 'hr':
            return 'right'
        return 'left'

    @property
    def stroke_width(self) -> float:
        if color_difference(*self.get_font_colors()) > 15:
            return self.default_stroke_width
        return 0
