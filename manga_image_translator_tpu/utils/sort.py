"""Reading-order sort of text regions.

Behavioral contract from reference ``utils/sort.py:10-150``: panel-based
grouping when an image is given, else std-dev-based smart xy sorting, with a
``force_simple_sort`` fallback.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .log import get_logger
from .panel import get_panels_from_array
from .textblock import TextBlock

logger = get_logger('sort')


def sort_regions(regions: List[TextBlock], right_to_left: bool = True,
                 img: np.ndarray = None,
                 force_simple_sort: bool = False) -> List[TextBlock]:
    if not regions:
        return []
    if force_simple_sort:
        return _simple_sort(regions, right_to_left)

    if img is not None:
        try:
            panels_raw = get_panels_from_array(img, rtl=right_to_left)
            panels = [(x, y, x + w, y + h) for x, y, w, h in panels_raw]
            panels = _sort_panels_fill(panels, right_to_left)
            for r in regions:
                cx, cy = r.center
                r.panel_index = -1
                for idx, (x1, y1, x2, y2) in enumerate(panels):
                    if x1 <= cx <= x2 and y1 <= cy <= y2:
                        r.panel_index = idx
                        break
                if r.panel_index < 0:
                    dists = [
                        ((max(x1 - cx, 0, cx - x2)) ** 2
                         + (max(y1 - cy, 0, cy - y2)) ** 2, i)
                        for i, (x1, y1, x2, y2) in enumerate(panels)]
                    if dists:
                        r.panel_index = min(dists)[1]
            grouped = {}
            for r in regions:
                grouped.setdefault(r.panel_index, []).append(r)
            out: List[TextBlock] = []
            for pi in sorted(grouped.keys()):
                out += sort_regions(grouped[pi], right_to_left, img=None)
            return out
        except Exception as e:
            logger.warning(f'Panel detection failed '
                           f'({type(e).__name__}: {str(e)[:100]}), '
                           f'using simple text sorting')
            return _simple_sort(regions, right_to_left)

    # smart xy sorting
    xs = [r.center[0] for r in regions]
    ys = [r.center[1] for r in regions]
    if len(regions) > 1:
        is_horizontal = np.std(xs) > np.std(ys)
    else:
        is_horizontal = False

    sorted_regions: List[TextBlock] = []
    if is_horizontal:
        primary = sorted(regions, key=lambda r: -r.center[0]
                         if right_to_left else r.center[0])
        group, prev = [], None
        for r in primary:
            cx = r.center[0]
            if prev is not None and abs(cx - prev) > 20:
                group.sort(key=lambda rr: rr.center[1])
                sorted_regions += group
                group = []
            group.append(r)
            prev = cx
        if group:
            group.sort(key=lambda rr: rr.center[1])
            sorted_regions += group
    else:
        primary = sorted(regions, key=lambda r: r.center[1])
        group, prev = [], None
        for r in primary:
            cy = r.center[1]
            if prev is not None and abs(cy - prev) > 15:
                group.sort(key=lambda rr: -rr.center[0]
                           if right_to_left else rr.center[0])
                sorted_regions += group
                group = []
            group.append(r)
            prev = cy
        if group:
            group.sort(key=lambda rr: -rr.center[0]
                       if right_to_left else rr.center[0])
            sorted_regions += group
    return sorted_regions


def _simple_sort(regions: List[TextBlock],
                 right_to_left: bool) -> List[TextBlock]:
    sorted_regions: List[TextBlock] = []
    for region in sorted(regions, key=lambda r: r.center[1]):
        for i, placed in enumerate(sorted_regions):
            if region.center[1] > placed.xyxy[3]:
                continue
            if region.center[1] < placed.xyxy[1]:
                sorted_regions.insert(i, region)
                break
            if right_to_left and region.center[0] > placed.center[0]:
                sorted_regions.insert(i, region)
                break
            if not right_to_left and region.center[0] < placed.center[0]:
                sorted_regions.insert(i, region)
                break
        else:
            sorted_regions.append(region)
    return sorted_regions


def _sort_panels_fill(panels: List[Tuple[int, int, int, int]],
                      right_to_left: bool) -> List[Tuple[int, int, int, int]]:
    """Row-by-row panel ordering (stacked panels grouped, reference
    _sort_panels_fill)."""
    if not panels:
        return panels
    remaining = sorted(list(panels), key=lambda p: p[1])
    ordered: List[Tuple[int, int, int, int]] = []
    avg_h = np.mean([p[3] - p[1] for p in remaining])
    y_thr = max(10, avg_h * 0.3)
    while remaining:
        base_y = remaining[0][1]
        row = []
        i = 0
        while i < len(remaining):
            if abs(remaining[i][1] - base_y) <= y_thr:
                row.append(remaining.pop(i))
            else:
                i += 1
        row.sort(key=lambda p: (-p[0] if right_to_left else p[0]))
        ordered.extend(row)
    return ordered


def visualize_textblocks(canvas: np.ndarray, blk_list: List[TextBlock],
                         show_panels: bool = False, img_rgb=None,
                         right_to_left: bool = True) -> np.ndarray:
    import cv2
    lw = max(round(sum(canvas.shape) / 2 * 0.003), 2)
    for i, blk in enumerate(blk_list):
        bx1, by1, bx2, by2 = blk.xyxy
        cv2.rectangle(canvas, (bx1, by1), (bx2, by2), (127, 255, 127), lw)
        for j, line in enumerate(blk.lines):
            cv2.putText(canvas, str(j), line[0], cv2.FONT_HERSHEY_SIMPLEX,
                        1, (127, 127, 255), 1)
            cv2.polylines(canvas, [line], True, (0, 127, 255), 2)
        center = [int((bx1 + bx2) / 2), int((by1 + by2) / 2)]
        cv2.putText(canvas, str(i), (center[0] - 10, center[1] + 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 1.3, (127, 127, 255), 3)
    return canvas
