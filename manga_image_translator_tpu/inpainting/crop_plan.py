"""Mask-driven crop planning for inpainting (TPU-first workload redesign).

The pipeline composite ``inpainted*mask + original*(1-mask)`` (reference
``inpainting/inpainting_lama_mpe.py:117``) discards every pixel computed
outside the mask; text masks cover a small fraction of the page; and the
shipped LaMa checkpoint is 512px-native (reference
``inpainting_lama_mpe.py:123-129`` — ``lama_large_512px.ckpt``). Running the
generator over the full page is therefore mostly wasted FLOPs at an
out-of-distribution scale.

This module plans context-padded crop rectangles around the mask's connected
components, snapped to a small static bucket set so XLA compiles a bounded
family of shapes. Same-bucket crops (possibly from *different pages*) batch
into one device forward; the executor (``common.OfflineInpainter``)
composites each crop's own mask pixels back, so output is byte-identical to
the full-page path outside the mask by construction.

Planning runs on the host but must stay cheap against a ~ms device stage on
a 1-core box: connected components are computed on an ``analysis_scale``-
downscaled mask (INTER_AREA + ``>0`` threshold, so every full-res mask pixel
survives into some downscaled CC — boxes only ever grow), and write-back
ownership uses the merged groups' padded boxes — pairwise disjoint by
construction of the merge fixpoint — instead of a full-res label map.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

# Static bucket set: multiples of 8 (generator stride), spanning one balloon
# (256) to the checkpoint-native scale and beyond (1024). Each distinct
# (bh, bw, batch) triple is one XLA compile.
DEFAULT_BUCKETS: Tuple[int, ...] = (256, 320, 384, 512, 640, 768, 1024)

# Batch sizes crops are padded up to (bounds compile count per bucket).
BATCH_SIZES: Tuple[int, ...] = (1, 2, 4, 8, 16, 32)


@dataclass
class Crop:
    """One planned inpaint crop.

    ``(x0, y0, w, h)`` is the source rect in page coordinates; ``(bh, bw)``
    the device shape it is resized to (equal to ``(h, w)`` in the common
    unscaled case). ``(gx0, gy0, gx1, gy1)`` is the merged-CC group box this
    crop owns for write-back: group boxes are pairwise disjoint and every
    mask pixel lies in exactly one, so compositing only group-box mask
    pixels is complete and conflict-free.
    """
    x0: int
    y0: int
    w: int
    h: int
    bw: int
    bh: int
    gx0: int
    gy0: int
    gx1: int
    gy1: int

    @property
    def scaled(self) -> bool:
        return (self.h, self.w) != (self.bh, self.bw)


def _round8_down(v: int) -> int:
    return max(8, (v // 8) * 8)


def _pick_bucket(buckets: Sequence[int], need: int, limit: int) -> int:
    """Smallest bucket >= need, capped by the image dimension (rounded to
    the generator stride). Falls back to the largest bucket when the group
    is bigger than every bucket — the crop is then resized down."""
    fitting = [b for b in buckets if b >= need]
    b = min(fitting) if fitting else max(buckets)
    if b > limit:
        b = _round8_down(limit)
    return b


def _place(c0: int, c1: int, b: int, limit: int) -> Tuple[int, int]:
    """Position a length-``b`` window covering [c0, c1) inside [0, limit).
    Returns (start, src_len). When the group span exceeds ``b`` the source
    covers the whole span (the executor resizes it down to ``b``)."""
    span = c1 - c0
    if b >= span:
        start = (c0 + c1 - b) // 2
        start = max(0, min(start, limit - b))
        return start, b
    return c0, span


def pad_batch_size(n: int) -> int:
    for s in BATCH_SIZES:
        if s >= n:
            return s
    return -(-n // BATCH_SIZES[-1]) * BATCH_SIZES[-1]


def plan_crops(mask: np.ndarray,
               buckets: Sequence[int] = DEFAULT_BUCKETS,
               pad_frac: float = 0.3,
               min_pad: int = 48,
               max_coverage: float = 0.85,
               full_page_pixels: Optional[int] = None,
               analysis_scale: int = 8,
               ) -> Optional[Tuple[List[Crop], np.ndarray]]:
    """Plan inpaint crops for one page mask.

    mask: (H, W) uint8, >=127 marks pixels to inpaint (the pipeline's
    refined mask at page resolution).

    Returns ``(crops, mask_bin)`` where ``mask_bin`` is the boolean (H, W)
    inpaint mask the executor composites with (restricted per crop to its
    group box). Returns ``([], mask_bin)`` for an empty mask and ``None``
    when the planned device pixels exceed ``max_coverage`` of the
    full-page path's pixels (full-page fallback is then cheaper).
    """
    h_img, w_img = mask.shape[:2]
    mask_bin = mask >= 127
    if not mask_bin.any():
        return [], mask_bin

    # CC analysis on a downscaled mask: INTER_AREA gives every source pixel
    # positive weight in some dest pixel, so `>0` keeps all mask pixels
    # (boxes only grow by up to one analysis cell).
    s = max(1, analysis_scale)
    ws, hs = -(-w_img // s), -(-h_img // s)
    if s > 1:
        small = cv2.resize(mask_bin.astype(np.uint8) * 255, (ws, hs),
                           interpolation=cv2.INTER_AREA) > 0
    else:
        small = mask_bin
    n_cc, _labels, stats, _ = cv2.connectedComponentsWithStats(
        small.astype(np.uint8), connectivity=8)
    if n_cc <= 1:
        return [], mask_bin

    fx, fy = w_img / ws, h_img / hs
    boxes = np.empty((n_cc - 1, 4), np.int64)
    for i in range(1, n_cc):
        x, y, w, h = (int(stats[i, cv2.CC_STAT_LEFT]),
                      int(stats[i, cv2.CC_STAT_TOP]),
                      int(stats[i, cv2.CC_STAT_WIDTH]),
                      int(stats[i, cv2.CC_STAT_HEIGHT]))
        x0 = int(np.floor(x * fx))
        y0 = int(np.floor(y * fy))
        x1 = int(np.ceil((x + w) * fx))
        y1 = int(np.ceil((y + h) * fy))
        pad = max(min_pad, int(round(pad_frac * max(x1 - x0, y1 - y0))))
        boxes[i - 1] = (x0 - pad, y0 - pad, x1 + pad, y1 + pad)

    # merge intersecting padded boxes until stable (merged boxes grow, which
    # can create new intersections — hence the fixpoint loop). Terminal
    # state: group boxes pairwise disjoint.
    gboxes = [tuple(b) for b in boxes]
    merged = True
    while merged:
        merged = False
        out_boxes: List[Tuple[int, int, int, int]] = []
        for b in gboxes:
            hit = -1
            for j, ob in enumerate(out_boxes):
                if (b[0] < ob[2] and ob[0] < b[2]
                        and b[1] < ob[3] and ob[1] < b[3]):
                    hit = j
                    break
            if hit >= 0:
                ob = out_boxes[hit]
                out_boxes[hit] = (min(b[0], ob[0]), min(b[1], ob[1]),
                                  max(b[2], ob[2]), max(b[3], ob[3]))
                merged = True
            else:
                out_boxes.append(b)
        gboxes = out_boxes

    crops: List[Crop] = []
    for (x0, y0, x1, y1) in gboxes:
        x0 = max(0, x0)
        y0 = max(0, y0)
        x1 = min(w_img, x1)
        y1 = min(h_img, y1)
        bw = _pick_bucket(buckets, x1 - x0, w_img)
        bh = _pick_bucket(buckets, y1 - y0, h_img)
        sx, w_src = _place(x0, x1, bw, w_img)
        sy, h_src = _place(y0, y1, bh, h_img)
        crops.append(Crop(x0=int(sx), y0=int(sy), w=int(w_src),
                          h=int(h_src), bw=int(bw), bh=int(bh),
                          gx0=int(x0), gy0=int(y0), gx1=int(x1),
                          gy1=int(y1)))

    device_px = sum(c.bw * c.bh for c in crops)
    if full_page_pixels is None:
        full_page_pixels = h_img * w_img
    if device_px > max_coverage * full_page_pixels:
        return None

    return crops, mask_bin


def full_page_path_pixels(h: int, w: int, inpainting_size: int) -> int:
    """Device pixels the full-page path would process (after its
    aspect-preserving resize to ``inpainting_size`` — see
    ``common.OfflineInpainter.infer_batch`` / reference
    ``inpainting_lama_mpe.py:56-118``)."""
    ratio = min(1.0, inpainting_size / max(h, w))
    return int(round(h * ratio)) * int(round(w * ratio))
