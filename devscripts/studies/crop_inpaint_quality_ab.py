#!/usr/bin/env python
"""Inside-mask quality A/B: masked-crop inpainting vs the full-page path.

The r4 crop redesign is byte-identical OUTSIDE the mask by construction
(tests/test_crop_inpaint.py), but the fill INSIDE the mask sees different
context: the full-page path gives LaMa the whole (resized) page, a crop
only its padded window. This study measures that difference with seeded
weights (VERDICT r4 #4): PSNR + SSIM of the two fills inside the mask, a
context-pad sweep, and — for calibration — the full-page path's OWN
sensitivity to its resize scale (the reference's accepted quality noise,
reference inpainting_lama_mpe.py:56-118 resizes pages to inpainting_size).

Run on CPU (quality, not timing): python devscripts/studies/crop_inpaint_quality_ab.py
"""
import asyncio
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ.setdefault('MIT_TPU_ALLOW_RANDOM_WEIGHTS', '1')

import cv2
import numpy as np

import jax

if jax.default_backend() not in ('cpu',):
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-test-cache'))

from manga_image_translator_tpu.config import InpainterConfig
from manga_image_translator_tpu.inpainting import common as common_mod
from manga_image_translator_tpu.inpainting.crop_plan import plan_crops
from manga_image_translator_tpu.inpainting.inpainting_lama import (
    LamaLargeInpainter)

PAGE = 768
INP_SIZE = 512


def make_page(rs):
    """Smooth natural-ish page: gradients + blurred blobs + line art, so
    the fill actually depends on surrounding context."""
    y, x = np.mgrid[0:PAGE, 0:PAGE].astype(np.float32) / PAGE
    base = np.stack([120 + 80 * x, 100 + 60 * y, 140 + 50 * (x + y) / 2],
                    axis=-1)
    blobs = np.zeros((PAGE, PAGE, 3), np.float32)
    for _ in range(12):
        cx, cy = rs.randint(0, PAGE, 2)
        r = rs.randint(40, 160)
        col = rs.randint(0, 255, 3).astype(np.float32)
        cv2.circle(blobs, (cx, cy), r, col.tolist(), -1)
    blobs = cv2.GaussianBlur(blobs, (63, 63), 0)
    img = np.clip(0.6 * base + 0.4 * blobs, 0, 255).astype(np.uint8)
    for _ in range(20):
        p0 = tuple(rs.randint(0, PAGE, 2))
        p1 = tuple(rs.randint(0, PAGE, 2))
        cv2.line(img, p0, p1, rs.randint(0, 255, 3).tolist(), 2)
    return img


def make_mask(rs, n_lines=12):
    mask = np.zeros((PAGE, PAGE), np.uint8)
    for _ in range(n_lines):
        x, y = rs.randint(0, PAGE - 160), rs.randint(0, PAGE - 40)
        mask[y:y + 24, x:x + 150] = 255
    return mask


def ssim_map(a, b):
    """Standard gaussian-window SSIM (11x11, sigma 1.5) on uint8 RGB."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    blur = lambda x: cv2.GaussianBlur(x, (11, 11), 1.5)
    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a * mu_a
    var_b = blur(b * b) - mu_b * mu_b
    cov = blur(a * b) - mu_a * mu_b
    return (((2 * mu_a * mu_b + c1) * (2 * cov + c2))
            / ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)))


def inside_metrics(a, b, mask_bin):
    d = (a.astype(np.float64) - b.astype(np.float64))[mask_bin]
    mse = float((d ** 2).mean()) if d.size else 0.0
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    s = ssim_map(a, b)[mask_bin]
    return psnr, float(s.mean()) if s.size else 1.0


def main():
    rs = np.random.RandomState(5)
    img = make_page(rs)
    mask = make_mask(rs)
    mask_bin = mask >= 127
    cfg = InpainterConfig()

    inp = LamaLargeInpainter()
    asyncio.run(inp.load('cpu'))

    t0 = time.time()
    full = asyncio.run(inp._infer(img, mask, cfg, INP_SIZE))
    print(f'full-page path ({INP_SIZE}): {time.time() - t0:.1f}s',
          flush=True)

    # the full-page path's own scale sensitivity — the reference's accepted
    # quality variation when inpainting_size changes
    full_384 = asyncio.run(inp._infer(img, mask, cfg, 384))
    p, s = inside_metrics(full, full_384, mask_bin)
    print(f'CALIBRATION full@512 vs full@384: PSNR {p:.1f} dB, '
          f'SSIM {s:.4f}', flush=True)

    def crop_run(pad_frac=0.2, min_pad=32, max_pad=64, native=False):
        orig_plan = common_mod.plan_crops
        common_mod.plan_crops = functools.partial(
            plan_crops, pad_frac=pad_frac, min_pad=min_pad, max_pad=max_pad)
        if native:
            os.environ['MIT_TPU_INPAINT_CROP_NATIVE'] = '1'
        try:
            out = inp._inpaint_crops_multi([img], [mask], cfg, INP_SIZE)[0]
        finally:
            common_mod.plan_crops = orig_plan
            os.environ.pop('MIT_TPU_INPAINT_CROP_NATIVE', None)
        return out

    print('\ncontext-pad sweep (crop path vs full-page path, inside mask):',
          flush=True)
    for pad_frac, min_pad, max_pad in ((0.1, 16, 32), (0.2, 32, 64),
                                       (0.4, 64, 128), (0.8, 128, 256)):
        out = crop_run(pad_frac, min_pad, max_pad)
        if out is None:
            # the planner chose the full-page path (pads merged everything)
            # — exact parity by definition
            print(f'  pad_frac={pad_frac:<4} min={min_pad:<4} '
                  f'max={max_pad:<4} -> plan fell back to full page '
                  f'(exact parity)', flush=True)
            continue
        # sanity: byte-identity outside the mask
        assert (out[~mask_bin] == img[~mask_bin]).all()
        p, s = inside_metrics(full, out, mask_bin)
        print(f'  pad_frac={pad_frac:<4} min={min_pad:<4} max={max_pad:<4}'
              f' -> PSNR {p:5.1f} dB, SSIM {s:.4f}', flush=True)

    out_native = crop_run(native=True)
    if out_native is not None:
        p, s = inside_metrics(full, out_native, mask_bin)
        print(f'  native-res crops (default pads) -> PSNR {p:5.1f} dB, '
              f'SSIM {s:.4f}', flush=True)


if __name__ == '__main__':
    main()
