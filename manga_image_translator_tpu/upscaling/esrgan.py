"""ESRGAN upscalers on TPU.

The 4x-UltraSharp checkpoint path mirrors reference
``upscaling/esrgan_pytorch.py:512-545`` (BGR input, /255, 4x forward then
bilinear resize to the requested ratio). The 'esrgan' and 'waifu2x' registry
keys — ncnn-vulkan executables in the reference — run the same RRDBNet
forward here (full capability, no subprocess).
"""
from __future__ import annotations

import functools
import os
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


def convert_realesrgan_state_dict(sd) -> dict:
    """Real-ESRGAN (new-style RRDBNet naming, e.g.
    RealESRGAN_x4plus_anime_6B.pth) → this repo's old-ESRGAN JAX params.

    The computation graphs are identical (conv_first → nb RRDBs → trunk
    conv → 2× nearest+conv upsamples → HR conv → last conv); only the key
    names differ. Ref arch: realesrgan's rrdbnet_arch.RRDBNet, consumed by
    the reference via the realesrgan-ncnn-vulkan executable
    (upscaling/esrgan.py:57-113)."""
    if 'params_ema' in sd:
        sd = sd['params_ema']
    elif 'params' in sd:
        sd = sd['params']
    nb = 0
    while f'body.{nb}.rdb1.conv1.weight' in sd:
        nb += 1
    remap = {'conv_first': 'model.0', 'conv_body': f'model.1.sub.{nb}',
             'conv_up1': 'model.3', 'conv_up2': 'model.6',
             'conv_hr': 'model.8', 'conv_last': 'model.10'}
    out = {}
    for key, val in sd.items():
        parts = key.split('.')
        if parts[0] == 'body':
            i, rdb, conv = parts[1], parts[2], parts[3]
            new = (f'model.1.sub.{i}.RDB{rdb[3:]}.{conv}.0.'
                   + '.'.join(parts[4:]))
        elif parts[0] in remap:
            new = remap[parts[0]] + '.' + '.'.join(parts[1:])
        else:
            continue
        out[new] = val
    return convert_state_dict(out)


class ESRGANUpscaler(ESRGANUpscalerPytorch):
    """Default 'esrgan' key: Real-ESRGAN x4plus-anime-6B (the model the
    reference's realesrgan-ncnn-vulkan executable ships for manga),
    RRDBNet nb=6 with new-style checkpoint naming."""

    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/xinntao/Real-ESRGAN/releases'
                   '/download/v0.2.2.4/RealESRGAN_x4plus_anime_6B.pth',
            # upstream publishes no sha256 next to the artifact; ModelWrapper
            # treats a missing hash as "skip verification"
        },
    }

    async def _load(self, device: str):
        self.params = self.load_params_converted(
            'model', convert_realesrgan_state_dict,
            init_fn=lambda: esrgan_model.init_params(nb=6))
        nb = esrgan_model.detect_nb(self.params)
        self.nb = nb if nb > 0 else 6


_W2X_ARCHIVE_ROOT = 'waifu2x-ncnn-vulkan-20220728-ubuntu'


def _w2x_archive_members():
    """All waifu2x model files worth extracting from the release archive:
    cunet + both upconv_7 families, scale-only and noise0-3 variants
    (the reference executable selects among these via -m/-n/-s,
    upscaling/waifu2x.py:95-105)."""
    from ..utils.ncnn_lite import model_relpath
    members = {}
    for family in ('cunet', 'upconv_7_anime', 'upconv_7_photo'):
        for noise in (-1, 0, 1, 2, 3):
            for ext in ('param', 'bin'):
                rel = f'{model_relpath(family, noise, 2)}.{ext}'
                members[f'{_W2X_ARCHIVE_ROOT}/{rel}'] = rel
        if family == 'cunet':       # cunet also ships 1x denoise models
            for noise in (0, 1, 2, 3):
                for ext in ('param', 'bin'):
                    rel = f'{model_relpath(family, noise, 1)}.{ext}'
                    members[f'{_W2X_ARCHIVE_ROOT}/{rel}'] = rel
    return members


class Waifu2xUpscaler(OfflineUpscaler):
    """'waifu2x' key: the networks inside the reference's
    waifu2x-ncnn-vulkan executable (upscaling/waifu2x.py:52-105), run
    natively in JAX. The reference invokes the executable with
    ``-m models-cunet -n 0``; model family and denoise level select via
    MIT_TPU_WAIFU2X_MODEL (cunet | upconv_7_anime | upconv_7_photo) and
    MIT_TPU_WAIFU2X_NOISE (-1..3). upconv_7 runs the dedicated
    models/waifu2x forward; cunet (and any other graph) runs through the
    from-scratch ncnn reader/evaluator (utils/ncnn_lite)."""

    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/nihui/waifu2x-ncnn-vulkan/releases'
                   '/download/20220728/waifu2x-ncnn-vulkan-20220728-ubuntu'
                   '.zip',
            'archive': _w2x_archive_members(),
        },
    }
    _VALID_UPSCALE_RATIOS = [1, 2, 4]

    def __init__(self):
        super().__init__()
        self.params = None
        self.graph_fn = None
        self.context = 7

    @staticmethod
    def _selected_model():
        family = os.environ.get('MIT_TPU_WAIFU2X_MODEL', 'cunet')
        noise = int(os.environ.get('MIT_TPU_WAIFU2X_NOISE', '0'))
        return family, noise

    async def _load(self, device: str):
        from ..models import waifu2x as w2x_model
        from ..utils.ncnn_lite import load_ncnn, make_forward, model_relpath
        family, noise = self._selected_model()
        rel = model_relpath(family, noise, 2)
        param_path = self.model_dir / f'{rel}.param'
        bin_path = self.model_dir / f'{rel}.bin'
        if not param_path.is_file():
            # archives extracted by older rounds keep the release root dir
            param_path = self.model_dir / _W2X_ARCHIVE_ROOT / f'{rel}.param'
            bin_path = self.model_dir / _W2X_ARCHIVE_ROOT / f'{rel}.bin'
        self.graph_fn = None
        if param_path.is_file() and bin_path.is_file():
            if family.startswith('upconv_7'):
                self.params = w2x_model.load_ncnn_upconv7(param_path,
                                                          bin_path)
                self.context = w2x_model.CONTEXT
            else:
                layers = load_ncnn(param_path, bin_path)
                self.graph_fn = jax.jit(make_forward(layers))
                self.params = layers
                # cunet consumes an 18px context border at scale 2
                self.context = 18
        else:
            from ..utils.inference import (MissingWeightsError,
                                           random_weights_allowed)
            if not random_weights_allowed(self):
                raise MissingWeightsError(
                    f'waifu2x ncnn weights unavailable ({rel}.param/bin) '
                    'and random weights not allowed')
            self.logger.warning('waifu2x weights unavailable — random init '
                                '(upconv_7 fallback)')
            self.using_random_weights = True
            self.params = w2x_model.init_params()
            self.context = w2x_model.CONTEXT

    async def _unload(self):
        self.params = None
        self.graph_fn = None

    def _run_2x(self, arr: np.ndarray) -> np.ndarray:
        c = self.context
        padded = np.pad(arr, ((c, c), (c, c), (0, 0)), mode='edge')
        if self.graph_fn is not None:
            out = np.asarray(self.graph_fn(jnp.asarray(padded)[None]))[0]
            # crop any residual context the graph's VALID convs left
            eh = out.shape[0] - 2 * arr.shape[0]
            ew = out.shape[1] - 2 * arr.shape[1]
            if eh or ew:
                out = out[eh // 2:eh // 2 + 2 * arr.shape[0],
                          ew // 2:ew // 2 + 2 * arr.shape[1]]
            return out
        out = np.asarray(_w2x_forward(self.params, jnp.asarray(padded)[None])
                         )[0]
        return out

    async def _infer(self, image_batch: List[Image.Image],
                     upscale_ratio: float) -> List[Image.Image]:
        results = []
        for img in image_batch:
            arr = np.array(img.convert('RGB')).astype(np.float32) / 255.0
            passes = 1 if upscale_ratio <= 2 else 2
            for _ in range(passes):
                arr = self._run_2x(arr)
            out = (np.clip(arr, 0, 1) * 255.0).astype(np.uint8)
            res = Image.fromarray(out)
            native = 2 ** passes
            if upscale_ratio != native:
                res = res.resize(
                    (int(round(img.size[0] * upscale_ratio)),
                     int(round(img.size[1] * upscale_ratio))),
                    resample=Image.Resampling.BILINEAR)
            results.append(res)
        return results


@jax.jit
def _w2x_forward(params, x):
    from ..models import waifu2x as w2x_model
    return w2x_model.upconv7_forward(params, x)
