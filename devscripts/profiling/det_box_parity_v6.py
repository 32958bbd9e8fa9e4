#!/usr/bin/env python
"""Box parity of the full detection path under the v6 paired-tap bilateral
vs v5 (VERDICT r4 #3 gate: 'boxes unchanged on the probe pages').

v6 reassociates the f32 tap sums, so the smoothed page may differ by <=1
uint8 gray level — this probe runs DefaultDetector._infer end-to-end
(bilateral + DBNet + DB postprocess) on text-like synthetic pages and
diffs the emitted quadrilaterals. Run once per variant (the kernel choice
is read at trace time):

    MIT_TPU_BILATERAL_KERNEL=v5 python det_box_parity_v6.py > /tmp/v5.json
    MIT_TPU_BILATERAL_KERNEL=v6 python det_box_parity_v6.py > /tmp/v6.json

CALIBRATION: DET_PROBE_DITHER=1 adds one gray level to every pixel — the
same magnitude as v6's worst-case deviation — so v5-vs-v5+dither bounds
the path's OWN sensitivity at that perturbation size.
"""
import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ.setdefault('MIT_TPU_ALLOW_RANDOM_WEIGHTS', '1')

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import cv2

from manga_image_translator_tpu.detection.default import DefaultDetector


def probe_pages():
    pages = []
    for seed in (0, 1):
        rs = np.random.RandomState(seed)
        img = np.full((1536, 1100, 3), 235, np.uint8)
        img += rs.randint(0, 20, img.shape, dtype=np.uint8)  # paper noise
        for _ in range(18):  # text-like strokes in boxes
            x, y = rs.randint(40, 800), rs.randint(40, 1400)
            w, h = rs.randint(120, 280), rs.randint(30, 50)
            cv2.rectangle(img, (x - 8, y - 8), (x + w + 8, y + h + 8),
                          (250, 250, 250), -1)
            for cx in range(x, x + w, 14):
                cv2.putText(img, chr(65 + rs.randint(26)), (cx, y + h),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.1, (20, 20, 20), 2)
        if os.environ.get('DET_PROBE_DITHER') == '1':
            img = np.clip(img.astype(np.int16) + 1, 0, 255).astype(np.uint8)
        pages.append(img)
    return pages


async def main():
    det = DefaultDetector()
    await det.load('tpu')
    out = []
    for img in probe_pages():
        textlines, raw_mask, _ = await det._infer(
            img, 1536, 0.5, 0.7, 2.3, False)
        out.append({
            'boxes': sorted([q.pts.astype(int).tolist() for q in textlines]),
            'mask_sum': int(raw_mask.astype(np.int64).sum()),
        })
    print(json.dumps(out))


if __name__ == '__main__':
    asyncio.run(main())
