"""ESRGAN upscalers on TPU.

The 4x-UltraSharp checkpoint path mirrors reference
``upscaling/esrgan_pytorch.py:512-545`` (BGR input, /255, 4x forward then
bilinear resize to the requested ratio). The 'esrgan' and 'waifu2x' registry
keys — ncnn-vulkan executables in the reference — run the same RRDBNet
forward here (full capability, no subprocess).
"""
from __future__ import annotations

import functools
from typing import List

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..models import esrgan as esrgan_model
from ..models.torch_loader import convert_state_dict
from .common import OfflineUpscaler

TILE = 256  # process in fixed tiles to bound compile count and VMEM
TILE_PAD = 8


@functools.partial(jax.jit, static_argnames=('nb',))
def _forward_tile(params, tile, nb):
    return esrgan_model.esrgan_forward(params, tile, nb=nb)


class ESRGANUpscalerPytorch(OfflineUpscaler):
    """4x-UltraSharp RRDBNet (registry key '4xultrasharp')."""

    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/4xESRGAN.pth',
            'hash': '545805ce2d861ee90972b5fa50b851f19ee4bb35dedd2eb090be1f7c935b6b00',
        },
    }
    _VALID_UPSCALE_RATIOS = [2, 3, 4]

    def __init__(self):
        super().__init__()
        self.params = None
        self.nb = 23

    async def _load(self, device: str):
        self.params = self.load_params_converted(
            'model', convert_state_dict,
            init_fn=lambda: esrgan_model.init_params(nb=6))
        nb = esrgan_model.detect_nb(self.params)
        self.nb = nb if nb > 0 else 23

    async def _unload(self):
        self.params = None

    def _run_4x(self, arr: np.ndarray) -> np.ndarray:
        """(H, W, 3) float [0,1] → (4H, 4W, 3), tiled to bound memory."""
        h, w = arr.shape[:2]
        out = np.zeros((h * 4, w * 4, 3), np.float32)
        for y0 in range(0, h, TILE):
            for x0 in range(0, w, TILE):
                y1, x1 = min(y0 + TILE, h), min(x0 + TILE, w)
                py0, px0 = max(y0 - TILE_PAD, 0), max(x0 - TILE_PAD, 0)
                py1, px1 = min(y1 + TILE_PAD, h), min(x1 + TILE_PAD, w)
                tile = arr[py0:py1, px0:px1]
                th, tw = tile.shape[:2]
                pad_h = TILE + 2 * TILE_PAD - th
                pad_w = TILE + 2 * TILE_PAD - tw
                tile = np.pad(tile, ((0, pad_h), (0, pad_w), (0, 0)),
                              mode='edge')
                res = np.asarray(_forward_tile(
                    self.params, jnp.asarray(tile)[None], self.nb)[0])
                res = res[:th * 4, :tw * 4]
                oy = (y0 - py0) * 4
                ox = (x0 - px0) * 4
                out[y0 * 4:y1 * 4, x0 * 4:x1 * 4] = \
                    res[oy:oy + (y1 - y0) * 4, ox:ox + (x1 - x0) * 4]
        return out

    async def _infer(self, image_batch: List[Image.Image],
                     upscale_ratio: float) -> List[Image.Image]:
        assert upscale_ratio <= 4
        ratio = upscale_ratio / 4
        results = []
        for img in image_batch:
            arr = np.array(img.convert('RGB'))[:, :, ::-1].astype(
                np.float32) / 255.0  # BGR, matching the checkpoint training
            out = self._run_4x(arr)
            out = (np.clip(out, 0, 1)[:, :, ::-1] * 255.0).astype(np.uint8)
            res = Image.fromarray(out)
            if ratio != 1:
                res = res.resize(
                    (int(round(res.size[0] * ratio)),
                     int(round(res.size[1] * ratio))),
                    resample=Image.Resampling.BILINEAR)
            results.append(res)
        return results


class ESRGANUpscaler(ESRGANUpscalerPytorch):
    """Default 'esrgan' key — same RRDBNet path (replaces
    realesrgan-ncnn-vulkan)."""


class Waifu2xUpscaler(ESRGANUpscalerPytorch):
    """'waifu2x' key — served by the ESRGAN forward (replaces
    waifu2x-ncnn-vulkan; ~same quality class for manga pages)."""

    _VALID_UPSCALE_RATIOS = [1, 2, 4]
