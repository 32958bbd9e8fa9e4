"""AOT-GAN inpainter on TPU (the registry 'default').

Contract from reference ``inpainting/inpainting_aot.py`` + the shared
preprocessing in inpainting_lama_mpe.py:55-118 (/127.5-1 normalization for
the non-LaMa path, resize-to-multiple-of-8).
"""
from __future__ import annotations

import functools

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ..config import InpainterConfig
from ..models import aot
from ..models.torch_loader import convert_state_dict
from .common import OfflineInpainter

PAD_SIZE = 8


def _aot_body(params, img, mask, dtype=jnp.bfloat16):
    img = img.astype(dtype) * (1.0 - mask.astype(dtype))
    out = aot.aot_generator_forward(params, img, mask.astype(dtype))
    out = out.astype(jnp.float32)
    return out * mask + (1.0 - mask) * img.astype(jnp.float32)


_aot_forward = jax.jit(_aot_body, static_argnames=('dtype',))


class AotInpainter(OfflineInpainter):
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/inpainting.ckpt',
            'hash': '878d541c68648969bc1b042a6e997f3a58e49b6c07c5636ad55130736977149f',
            'file': '.',
        },
    }

    def __init__(self):
        super().__init__()
        self.params = None

    async def _load(self, device: str):
        self.params = self.load_params_converted(
            'model',
            lambda sd: convert_state_dict(
                sd, transposed_conv_patterns=aot.TRANSPOSED_CONV_PATTERNS),
            init_fn=aot.init_params)

    async def _unload(self):
        self.params = None

    async def _infer(self, image: np.ndarray, mask: np.ndarray,
                     config: InpainterConfig, inpainting_size: int = 1024,
                     verbose: bool = False) -> np.ndarray:
        img_original = np.copy(image)
        mask_original = np.copy(mask)
        mask_original = (mask_original >= 127).astype(np.uint8)[:, :, None]

        height, width = image.shape[:2]
        if max(image.shape[:2]) > inpainting_size:
            ratio = inpainting_size / max(height, width)
            new_size = (round(width * ratio), round(height * ratio))
            image = cv2.resize(image, new_size, interpolation=cv2.INTER_LINEAR)
            mask = cv2.resize(mask, new_size, interpolation=cv2.INTER_LINEAR)
        h, w = image.shape[:2]
        new_h = h + ((-h) % PAD_SIZE)
        new_w = w + ((-w) % PAD_SIZE)
        if (new_h, new_w) != (h, w):
            image = cv2.resize(image, (new_w, new_h),
                               interpolation=cv2.INTER_LINEAR)
            mask = cv2.resize(mask, (new_w, new_h),
                              interpolation=cv2.INTER_LINEAR)
        self.logger.info(f'Inpainting resolution: {new_w}x{new_h}')

        img_j = jnp.asarray(image, jnp.float32)[None] / 127.5 - 1.0
        mask_j = (jnp.asarray(mask, jnp.float32)[None, :, :, None]
                  / 255.0 >= 0.5).astype(jnp.float32)
        out = _aot_forward(self.params, img_j, mask_j, jnp.bfloat16)
        img_inpainted = np.asarray(jnp.clip(
            jnp.round((out[0] + 1.0) * 127.5), 0, 255).astype(jnp.uint8))
        if (new_h, new_w) != (height, width):
            img_inpainted = cv2.resize(img_inpainted, (width, height),
                                       interpolation=cv2.INTER_LINEAR)
        return (img_inpainted * mask_original
                + img_original * (1 - mask_original)).astype(np.uint8)

    def _batch_forward_dispatch(self, imgs: np.ndarray, masks: np.ndarray,
                                config: InpainterConfig):
        from ..parallel.mesh import sharded_batch
        img_j = jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0
        mask_j = (jnp.asarray(masks, jnp.float32)[..., None]
                  / 255.0 >= 0.5).astype(jnp.float32)
        out = sharded_batch(
            _aot_body, 'aot.batch', self.params, img_j, mask_j,
            jit_fallback=functools.partial(_aot_forward,
                                           dtype=jnp.bfloat16))
        return jnp.clip(
            jnp.round((out + 1.0) * 127.5), 0, 255).astype(jnp.uint8)

    def _batch_forward(self, imgs: np.ndarray, masks: np.ndarray,
                       config: InpainterConfig) -> np.ndarray:
        return np.asarray(self._batch_forward_dispatch(imgs, masks, config))
