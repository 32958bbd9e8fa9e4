"""manga-colorization-v2 (mc2) colorizer on TPU.

Contract from reference ``colorization/manga_colorization_v2.py:14-74``:
FFDNet denoising at ``denoise_sigma``, resize_pad to a multiple of 32
(≤576 sweet spot), grayscale + zero color hint → generator → [-1,1] output
rescaled to an RGB image.
"""
from __future__ import annotations

import functools

import cv2
import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..models import mc2
from ..models.torch_loader import convert_state_dict
from .common import OfflineColorizer


@jax.jit
def _denoise(params, img, sigma):
    return mc2.ffdnet_rgb_forward(params, img, sigma)


@jax.jit
def _colorize(params, sketch):
    fake, _guide = mc2.generator_forward(params, sketch)
    return fake


def resize_pad(img: np.ndarray, size: int = 256):
    """reference utils.resize_pad: fit the short side, pad to multiple of 32
    with 'maximum' padding, return the grayscale first channel."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, 2)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    if img.shape[0] < img.shape[1]:
        height = img.shape[0]
        ratio = height / (size * 1.5)
        width = int(np.ceil(img.shape[1] / ratio))
        img = cv2.resize(img, (width, int(size * 1.5)),
                         interpolation=cv2.INTER_AREA)
        pad = (0, 32 - width % 32)
        img = np.pad(img, ((0, 0), (0, pad[1]), (0, 0)), 'maximum')
    else:
        width = img.shape[1]
        ratio = width / size
        height = int(np.ceil(img.shape[0] / ratio))
        img = cv2.resize(img, (size, height), interpolation=cv2.INTER_AREA)
        pad = (32 - height % 32, 0)
        img = np.pad(img, ((0, pad[0]), (0, 0), (0, 0)), 'maximum')
    if img.dtype == np.float32:
        np.clip(img, 0, 1, out=img)
    return img[:, :, :1], pad


class MangaColorizationV2(OfflineColorizer):
    _MODEL_SUB_DIR = 'colorization/manga-colorization-v2'
    _MODEL_MAPPING = {
        'generator': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/manga-colorization-v2-generator.zip',
            'file': 'generator.zip',
            'hash': '087e6a0bc02770e732a52f33878b71a272a6123c9ac649e9b5bfb75e39e5c1d5',
        },
        'denoiser': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/manga-colorization-v2-net_rgb.pth',
            'file': 'net_rgb.pth',
            'hash': '0fe98bfd2ac870b15f360661b1c4789eecefc6dc2e4462842a0dd15e149a0433',
        },
    }

    def __init__(self):
        super().__init__()
        self.gen_params = None
        self.denoise_params = None

    async def _load(self, device: str):
        def convert_gen(sd):
            sd = {k.removeprefix('generator.'): v for k, v in sd.items()
                  if not k.startswith('discriminator')}
            return convert_state_dict(
                sd,
                transposed_conv_patterns=mc2.GENERATOR_TRANSPOSED_PATTERNS)
        self.gen_params = self.load_params_converted(
            'generator', convert_gen, init_fn=mc2.init_generator_params)

        def convert_den(sd):
            sd = {k.removeprefix('module.'): v for k, v in sd.items()}
            return convert_state_dict(sd)
        self.denoise_params = self.load_params_converted(
            'denoiser', convert_den, init_fn=mc2.init_ffdnet_params)

    async def _unload(self):
        self.gen_params = None
        self.denoise_params = None

    async def _infer(self, image: Image.Image, colorization_size: int,
                     denoise_sigma: int = 25, **kwargs) -> Image.Image:
        img = np.array(image.convert('RGBA'))
        max_size = min(*img.shape[:2])
        max_size -= max_size % 32
        if colorization_size > 0:
            size = min(max_size, colorization_size
                       - (colorization_size % 32))
        else:
            size = min(max_size, 576)  # ≤576 gives best results

        rgb = img[:, :, :3].astype(np.float32) / 255.0
        if 0 <= denoise_sigma <= 255:
            h, w = rgb.shape[:2]
            eh, ew = h + (h % 2), w + (w % 2)
            padded = np.pad(rgb, ((0, eh - h), (0, ew - w), (0, 0)),
                            mode='edge')
            den = _denoise(self.denoise_params, jnp.asarray(padded)[None],
                           jnp.asarray([denoise_sigma / 255.0], jnp.float32))
            rgb = np.clip(padded - np.asarray(den[0]), 0, 1)[:h, :w]

        gray, pad = resize_pad(rgb.astype(np.float32), size)
        h, w = gray.shape[:2]
        hint = np.zeros((h, w, 4), np.float32)
        sketch = np.concatenate([gray, hint], axis=-1)

        fake = np.asarray(_colorize(self.gen_params,
                                    jnp.asarray(sketch)[None])[0])
        result = fake * 0.5 + 0.5
        if pad[0] != 0:
            result = result[:-pad[0]]
        if pad[1] != 0:
            result = result[:, :-pad[1]]
        return Image.fromarray(
            np.clip(result * 255, 0, 255).astype(np.uint8))
