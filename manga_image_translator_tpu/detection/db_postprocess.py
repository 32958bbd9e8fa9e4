"""DB probability-map → quadrilateral boxes postprocess.

Behavioral contract from reference ``detection/default_utils/dbnet_utils.py``
(SegDetectorRepresenter :8-187): binarize → contours → minAreaRect → polygon
unclip → box score. Re-implemented without pyclipper/shapely:

* box path: pyclipper's round-joint offset of a *rectangle* followed by
  minAreaRect is exactly the rectangle grown by the offset distance on every
  side — computed directly on the rotated rect (no polygon clipping library).
* polygon path: round-joint offsetting == Minkowski sum with a disk, done by
  rasterizing the polygon and dilating with a circular structuring element.

The dense part (sigmoid + threshold) runs on device inside the detector jit;
this module only sees the binarized bitmap + probability map.
"""
from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np


class DBPostprocess:
    def __init__(self, thresh: float = 0.6, box_thresh: float = 0.8,
                 max_candidates: int = 1000, unclip_ratio: float = 2.2):
        self.min_size = 3
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio

    def __call__(self, pred: np.ndarray, dest_w: int, dest_h: int,
                 bitmap: np.ndarray = None, output_polygons: bool = False):
        """pred: (H, W) probability map in [0,1]. Returns (boxes, scores)."""
        if bitmap is None:
            bitmap = pred > self.thresh
        if output_polygons:
            return self._polygons_from_bitmap(pred, bitmap, dest_w, dest_h)
        return self._boxes_from_bitmap(pred, bitmap, dest_w, dest_h)

    # -- helpers --------------------------------------------------------------
    @staticmethod
    def _mini_box(contour) -> Tuple[np.ndarray, float, Tuple]:
        """minAreaRect corners in (tl, tr, br, bl)-ish canonical order
        (matches reference get_mini_boxes :155-173)."""
        rect = cv2.minAreaRect(contour)
        points = sorted(cv2.boxPoints(rect), key=lambda x: x[0])
        if points[1][1] > points[0][1]:
            i1, i4 = 0, 1
        else:
            i1, i4 = 1, 0
        if points[3][1] > points[2][1]:
            i2, i3 = 2, 3
        else:
            i2, i3 = 3, 2
        box = np.array([points[i1], points[i2], points[i3], points[i4]])
        return box, min(rect[1]), rect

    @staticmethod
    def _box_score(pred: np.ndarray, pts: np.ndarray) -> float:
        """Mean probability inside the polygon (reference box_score_fast)."""
        h, w = pred.shape[:2]
        box = pts.copy()
        xmin = int(np.clip(np.floor(box[:, 0].min()), 0, w - 1))
        xmax = int(np.clip(np.ceil(box[:, 0].max()), 0, w - 1))
        ymin = int(np.clip(np.floor(box[:, 1].min()), 0, h - 1))
        ymax = int(np.clip(np.ceil(box[:, 1].max()), 0, h - 1))
        mask = np.zeros((ymax - ymin + 1, xmax - xmin + 1), dtype=np.uint8)
        box[:, 0] -= xmin
        box[:, 1] -= ymin
        cv2.fillPoly(mask, box.reshape(1, -1, 2).astype(np.int32), 1)
        return cv2.mean(pred[ymin:ymax + 1, xmin:xmax + 1], mask)[0]

    @staticmethod
    def _unclip_rect(rect, distance: float):
        """Grow a cv2 rotated rect by ``distance`` on every side."""
        (cx, cy), (rw, rh), ang = rect
        return ((cx, cy), (rw + 2 * distance, rh + 2 * distance), ang)

    @staticmethod
    def _unclip_polygon(points: np.ndarray, distance: float) -> np.ndarray:
        """Round-joint polygon offset via raster dilation with a disk."""
        d = max(int(round(distance)), 1)
        x0, y0 = points.min(axis=0) - (d + 2)
        pts = (points - [x0, y0]).astype(np.int32)
        w, h = pts[:, 0].max() + d + 3, pts[:, 1].max() + d + 3
        canvas = np.zeros((h, w), np.uint8)
        cv2.fillPoly(canvas, [pts], 1)
        k = 2 * d + 1
        se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        canvas = cv2.dilate(canvas, se)
        contours, _ = cv2.findContours(canvas, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            return points
        contour = max(contours, key=cv2.contourArea).reshape(-1, 2)
        return contour + [x0, y0]

    # -- main paths ------------------------------------------------------------
    def _boxes_from_bitmap(self, pred, bitmap, dest_w, dest_h):
        height, width = bitmap.shape
        contours, _ = cv2.findContours((bitmap * 255).astype(np.uint8),
                                       cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
        num = min(len(contours), self.max_candidates)
        boxes, scores = [], []
        for index in range(num):
            contour = contours[index].squeeze(1)
            points, sside, rect = self._mini_box(contours[index])
            if sside < self.min_size:
                continue
            score = self._box_score(pred, contour.astype(np.float64))
            if self.box_thresh > score:
                continue
            # unclip distance = area * ratio / perimeter of the rect
            rw, rh = rect[1]
            area, length = rw * rh, 2 * (rw + rh)
            if length == 0:
                continue
            distance = area * self.unclip_ratio / length
            grown = self._unclip_rect(rect, distance)
            box, sside, _ = self._mini_box(cv2.boxPoints(grown))
            if sside < self.min_size + 2:
                continue
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_w), 0, dest_w)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_h), 0, dest_h)
            startidx = box.sum(axis=1).argmin()
            box = np.roll(box, 4 - startidx, 0)
            boxes.append(box.astype(np.int64))
            scores.append(score)
        if not boxes:
            return np.zeros((0, 4, 2), np.int64), np.zeros((0,), np.float32)
        return np.stack(boxes), np.array(scores, np.float32)

    def _polygons_from_bitmap(self, pred, bitmap, dest_w, dest_h):
        height, width = bitmap.shape
        contours, _ = cv2.findContours((bitmap * 255).astype(np.uint8),
                                       cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
        boxes: List[np.ndarray] = []
        scores: List[float] = []
        for contour in contours[:self.max_candidates]:
            epsilon = 0.005 * cv2.arcLength(contour, True)
            approx = cv2.approxPolyDP(contour, epsilon, True)
            points = approx.reshape(-1, 2)
            if points.shape[0] < 4:
                continue
            score = self._box_score(pred, contour.squeeze(1).astype(np.float64))
            if self.box_thresh > score:
                continue
            area = cv2.contourArea(points.astype(np.float32))
            length = cv2.arcLength(points.astype(np.float32), True)
            if length == 0:
                continue
            distance = area * self.unclip_ratio / length
            box = self._unclip_polygon(points, distance)
            _, sside, _ = self._mini_box(box.reshape(-1, 1, 2).astype(np.int32))
            if sside < self.min_size + 2:
                continue
            box = box.astype(np.float64)
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_w), 0, dest_w)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_h), 0, dest_h)
            boxes.append(box.astype(np.int64))
            scores.append(score)
        return boxes, scores
