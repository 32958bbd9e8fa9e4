"""Panel detection for reading-order sorting.

Contract: reference ``utils/panel/`` (vendored Kumiko — contour-based panel
segmentation, ~1.5k LoC: ``lib/page.py`` pipeline + ``lib/panel.py``
split/merge). This is a compact re-derivation of the same pipeline:

  sobel-edge contours -> initial panels -> group small panels ->
  recursive gutter splitting -> exclude small -> contains-merge ->
  deoverlap -> expand to neighbours -> reading-order numbering

The reference splits merged contours by finding pinch points on the
approximated polygon and validating the split segment against LSD line
segments (``lib/panel.py:279-461``). We reach the same outcome with a
direct criterion: a split gutter is a low-occupancy row/column band inside
the panel that is flanked by strong border-like edge runs on both sides
(the detected panel borders the reference's segment-coverage test would
match). Consumers only need panel rectangles in reading order
(utils/sort.py), which both formulations provide.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np

Rect = Tuple[int, int, int, int]  # x, y, w, h


def _edge_map(img_rgb: np.ndarray) -> np.ndarray:
    """Sobel-magnitude Otsu threshold + 3x3 close — the reference's
    polarity-free edge binarisation (``lib/page.py:87-137``)."""
    gray = cv2.cvtColor(img_rgb, cv2.COLOR_RGB2GRAY)
    gx = cv2.Sobel(gray, cv2.CV_16S, 1, 0, ksize=3)
    gy = cv2.Sobel(gray, cv2.CV_16S, 0, 1, ksize=3)
    sobel = cv2.addWeighted(cv2.convertScaleAbs(gx), 0.5,
                            cv2.convertScaleAbs(gy), 0.5, 0)
    _, binary = cv2.threshold(sobel, 0, 255,
                              cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    return cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel)


def _is_small(r: Rect, w_img: int, h_img: int, ratio: float,
              extra: float = 1.0) -> bool:
    return r[2] < w_img * ratio * extra or r[3] < h_img * ratio * extra


def _overlap(a: Rect, b: Rect) -> Optional[Rect]:
    x = max(a[0], b[0])
    y = max(a[1], b[1])
    r = min(a[0] + a[2], b[0] + b[2])
    bt = min(a[1] + a[3], b[1] + b[3])
    if r < x or bt < y:
        return None
    return (x, y, r - x, bt - y)


def _overlaps(a: Rect, b: Rect, area_ratio: float = 0.1) -> bool:
    o = _overlap(a, b)
    if o is None:
        return False
    small = min(a[2] * a[3], b[2] * b[3])
    return small == 0 or o[2] * o[3] / small > area_ratio


def _contains(a: Rect, b: Rect) -> bool:
    """a contains b when their overlap covers >50% of b
    (``lib/panel.py:146-152``)."""
    o = _overlap(a, b)
    return o is not None and b[2] * b[3] > 0 and (
        o[2] * o[3] / (b[2] * b[3]) > 0.50)


def _group_small(panels: List[Rect], w_img: int, h_img: int,
                 ratio: float) -> List[Rect]:
    """Union-find small panels whose centers are close
    (``lib/page.py:198-243`` + ``is_close`` ``lib/panel.py:245-256``)."""
    small = [p for p in panels if _is_small(p, w_img, h_img, ratio)]
    big = [p for p in panels if not _is_small(p, w_img, h_img, ratio)]
    parent = list(range(len(small)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(small)):
        for j in range(i + 1, len(small)):
            a, b = small[i], small[j]
            if (abs((a[0] + a[2] / 2) - (b[0] + b[2] / 2))
                    <= (a[2] + b[2]) * 0.75
                    and abs((a[1] + a[3] / 2) - (b[1] + b[3] / 2))
                    <= (a[3] + b[3]) * 0.75):
                parent[find(i)] = find(j)

    groups = {}
    for i, p in enumerate(small):
        groups.setdefault(find(i), []).append(p)
    for members in groups.values():
        if len(members) < 2:
            continue  # lone small panels stay (dropped later if still small)
        x0 = min(p[0] for p in members)
        y0 = min(p[1] for p in members)
        x1 = max(p[0] + p[2] for p in members)
        y1 = max(p[1] + p[3] for p in members)
        big.append((x0, y0, x1 - x0, y1 - y0))
    for members in groups.values():
        if len(members) < 2:
            big.extend(members)
    return big


def _find_gutter(edges: np.ndarray, r: Rect, axis: int,
                 min_sub: float) -> Optional[int]:
    """Find a split coordinate along ``axis`` (0 = split rows / horizontal
    gutter, 1 = split cols / vertical gutter) inside panel ``r``.

    A gutter is a band whose edge-pixel occupancy stays below 5% of the
    cross dimension, flanked on both sides by border-like runs (>=40%
    occupancy) — the analogue of the reference's split-segment coverage
    test (``lib/panel.py:453``). Returns the band center or None."""
    x, y, w, h = r
    sub = edges[y:y + h, x:x + w]
    occ = (sub > 0).sum(axis=1 - axis).astype(np.float64)
    cross = w if axis == 0 else h
    length = h if axis == 0 else w
    lo = occ <= 0.05 * cross
    hi_idx = np.where(occ >= 0.40 * cross)[0]
    if hi_idx.size == 0:
        return None
    min_gap = max(4, int(0.01 * length))
    # maximal low-occupancy runs
    i = 0
    best = None
    while i < length:
        if not lo[i]:
            i += 1
            continue
        j = i
        while j < length and lo[j]:
            j += 1
        run_len = j - i
        # both resulting sub-panels must be non-small and the run must be
        # flanked by border-like rows/cols (a real gutter, not blank art)
        if (run_len >= min_gap
                and i >= min_sub * length and length - j >= min_sub * length
                and hi_idx[(hi_idx < i)].size > 0
                and hi_idx[(hi_idx >= j)].size > 0
                and (i - hi_idx[hi_idx < i].max()) <= min_gap * 2
                and (hi_idx[hi_idx >= j].min() - j) <= min_gap * 2):
            if best is None or run_len > best[1]:
                # split at the gutter START: the first sub-panel keeps its
                # true border and the second stays adjacent, so the page's
                # min actual gutter ~0 — matching the reference's
                # pinch-point split (subpolygons share the pinch dots)
                best = (i, run_len)
        i = j
    return None if best is None else best[0]


def _split_recursive(edges: np.ndarray, r: Rect, w_img: int, h_img: int,
                     ratio: float, depth: int = 0) -> List[Rect]:
    """Recursively split a panel on internal gutters
    (``lib/page.py:246-267`` split loop + ``lib/panel.py:279-461``)."""
    if depth >= 4 or _is_small(r, w_img, h_img, ratio, extra=2.0):
        return [r]
    x, y, w, h = r
    # subpanels must be non-small: min sub-fraction per axis
    min_sub_y = (h_img * ratio) / h if h else 1.0
    min_sub_x = (w_img * ratio) / w if w else 1.0
    cut_y = _find_gutter(edges, r, axis=0, min_sub=min_sub_y)
    cut_x = _find_gutter(edges, r, axis=1, min_sub=min_sub_x)
    if cut_y is not None:
        top = (x, y, w, cut_y)
        bot = (x, y + cut_y, w, h - cut_y)
        return (_split_recursive(edges, top, w_img, h_img, ratio, depth + 1)
                + _split_recursive(edges, bot, w_img, h_img, ratio,
                                   depth + 1))
    if cut_x is not None:
        left = (x, y, cut_x, h)
        right = (x + cut_x, y, w - cut_x, h)
        return (_split_recursive(edges, left, w_img, h_img, ratio, depth + 1)
                + _split_recursive(edges, right, w_img, h_img, ratio,
                                   depth + 1))
    return [r]


def _merge_contained(panels: List[Rect]) -> List[Rect]:
    """Merge panels contained in another (``lib/page.py:298-313``): the
    container absorbs the contained panel's extent when that doesn't bump
    into other panels."""
    panels = list(panels)
    removed = set()
    for i in range(len(panels)):
        for j in range(len(panels)):
            if i == j or j in removed or i in removed:
                continue
            a, b = panels[i], panels[j]
            if _contains(a, b):
                union = (min(a[0], b[0]), min(a[1], b[1]),
                         max(a[0] + a[2], b[0] + b[2]) - min(a[0], b[0]),
                         max(a[1] + a[3], b[1] + b[3]) - min(a[1], b[1]))
                others = [p for k, p in enumerate(panels)
                          if k not in (i, j) and k not in removed]
                if not any(_overlaps(union, o) for o in others):
                    panels[i] = union
                removed.add(j)
    return [p for k, p in enumerate(panels) if k not in removed]


def _deoverlap(panels: List[Rect]) -> List[Rect]:
    """Shave slight overlaps left by splitting (``lib/page.py:275-295``)."""
    ps = [list(p) for p in panels]
    for i in range(len(ps)):
        for j in range(len(ps)):
            if i == j:
                continue
            a, b = ps[i], ps[j]
            o = _overlap((a[0], a[1], a[2], a[3]), (b[0], b[1], b[2], b[3]))
            if o is None or o[2] <= 0 or o[3] <= 0:
                continue
            if o[2] < o[3] and a[0] + a[2] == o[0] + o[2]:
                a[2] = o[0] - a[0]
                b[2] = b[0] + b[2] - (o[0] + o[2])
                b[0] = o[0] + o[2]
            elif o[2] > o[3] and a[1] + a[3] == o[1] + o[3]:
                a[3] = o[1] - a[1]
                b[3] = b[1] + b[3] - (o[1] + o[3])
                b[1] = o[1] + o[3]
    return [tuple(p) for p in ps]


def _same_row(a: Rect, b: Rect) -> bool:
    above, below = sorted([a, b], key=lambda p: p[1])
    if below[1] > above[1] + above[3]:
        return False
    if below[1] + below[3] < above[1] + above[3]:
        return True
    inter = min(above[1] + above[3], below[1] + below[3]) - below[1]
    min_h = min(above[3], below[3])
    return min_h == 0 or inter / min_h >= 1 / 3


def _same_col(a: Rect, b: Rect) -> bool:
    left, right = sorted([a, b], key=lambda p: p[0])
    if right[0] > left[0] + left[2]:
        return False
    if right[0] + right[2] < left[0] + left[2]:
        return True
    inter = min(left[0] + left[2], right[0] + right[2]) - right[0]
    min_w = min(left[2], right[2])
    return min_w == 0 or inter / min_w >= 1 / 3


def _expand(panels: List[Rect], w_img: int, h_img: int) -> List[Rect]:
    """Expand each panel to its neighbour's edge minus the min gutter, or to
    the frame around all panels (``lib/page.py:316-359``). Like the
    reference, expansion is sequential and in-place: earlier panels'
    expanded edges are what later panels expand toward."""
    gx = [p[0] - (q[0] + q[2]) for p in panels for q in panels
          if q is not p and q[0] + q[2] <= p[0] and _same_row(p, q)]
    gy = [p[1] - (q[1] + q[3]) for p in panels for q in panels
          if q is not p and q[1] + q[3] <= p[1] and _same_col(p, q)]
    gut_x = min(gx) if gx else 1
    gut_y = min(gy) if gy else 1
    frame = (min(p[0] for p in panels), min(p[1] for p in panels),
             max(p[0] + p[2] for p in panels),
             max(p[1] + p[3] for p in panels))
    ps = [list(p) for p in panels]
    for a in ps:
        p = tuple(a)
        others = [tuple(q) for q in ps if q is not a]
        lefts = [q[0] + q[2] for q in others
                 if q[0] + q[2] <= p[0] and _same_row(p, q)]
        rights = [q[0] for q in others
                  if q[0] >= p[0] + p[2] and _same_row(p, q)]
        tops = [q[1] + q[3] for q in others
                if q[1] + q[3] <= p[1] and _same_col(p, q)]
        bottoms = [q[1] for q in others
                   if q[1] >= p[1] + p[3] and _same_col(p, q)]
        nx0 = (max(lefts) + gut_x) if lefts else frame[0]
        ny0 = (max(tops) + gut_y) if tops else frame[1]
        nx1 = (min(rights) - gut_x) if rights else frame[2]
        ny1 = (min(bottoms) - gut_y) if bottoms else frame[3]
        x0 = min(nx0, p[0])
        y0 = min(ny0, p[1])
        a[0], a[1] = x0, y0
        a[2] = max(nx1, p[0] + p[2]) - x0
        a[3] = max(ny1, p[1] + p[3]) - y0
    return [tuple(p) for p in ps]


def _reading_order(panels: List[Rect], rtl: bool) -> List[Rect]:
    """Kumiko's numbering fix (``lib/page.py:362-381``): a panel comes after
    its top neighbour and after every panel left (ltr) / right (rtl) of it
    in the same row."""
    panels = list(panels)
    panels.sort(key=lambda p: (p[1], -p[0] if rtl else p[0]))
    changes = 1
    iters = 0
    while changes and iters < 10 * max(1, len(panels)):
        changes = 0
        iters += 1
        for i, p in enumerate(panels):
            before = []
            tops = [q for q in panels
                    if q[1] + q[3] <= p[1] and _same_col(p, q)]
            if tops:
                before.append(max(tops, key=lambda q: q[1] + q[3]))
            if rtl:
                before += [q for q in panels
                           if q[0] >= p[0] + p[2] and _same_row(p, q)]
            else:
                before += [q for q in panels
                           if q[0] + q[2] <= p[0] and _same_row(p, q)]
            moved = False
            for nb in before:
                pos = panels.index(nb)
                if i < pos:
                    panels.insert(pos, panels.pop(i))
                    changes += 1
                    moved = True
                    break
            if moved:
                break
    return panels


def get_panels_from_array(img_rgb: np.ndarray, rtl: bool = True,
                          min_panel_size_ratio: float = 1 / 10
                          ) -> List[Rect]:
    """Returns panel rects as (x, y, w, h) in reading order."""
    h_img, w_img = img_rgb.shape[:2]
    edges = _edge_map(img_rgb)

    contours, _ = cv2.findContours(edges, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    panels: List[Rect] = []
    for cnt in contours:
        r = cv2.boundingRect(cnt)
        if _is_small(r, w_img, h_img, min_panel_size_ratio / 10):
            continue  # is_very_small (lib/panel.py:109-110)
        panels.append(tuple(r))

    panels = _group_small(panels, w_img, h_img, min_panel_size_ratio)

    split: List[Rect] = []
    for p in panels:
        split.extend(_split_recursive(edges, p, w_img, h_img,
                                      min_panel_size_ratio))
    panels = split

    panels = [p for p in panels
              if not _is_small(p, w_img, h_img, min_panel_size_ratio)]
    panels = _merge_contained(panels)
    panels = _deoverlap(panels)
    panels = [p for p in panels
              if not _is_small(p, w_img, h_img, min_panel_size_ratio)]

    if not panels:
        return [(0, 0, w_img, h_img)]

    # reference sorts into reading order BEFORE expanding
    # (``lib/page.py:111-113``) — sequential expansion order matters
    panels = _reading_order(panels, rtl)
    panels = _expand(panels, w_img, h_img)
    return _reading_order(panels, rtl)
