"""LaMa inpainters (lama_large / lama_mpe) on TPU.

Contract from reference ``inpainting/inpainting_lama_mpe.py:26-138``:
resize to inpainting_size keeping aspect, stretch-resize to a multiple of 8,
[0,1] normalization, ``img *= (1-mask)``, bf16 autocast with fp32 FFTs, final
composite ``pred*mask + original*(1-mask)``.

TPU: the network forward is one jitted program per canonical shape; bf16 is
the default compute dtype (the reference rejects fp16 for LaMa).
"""
from __future__ import annotations

import functools

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ..config import InpainterConfig, InpaintPrecision
from ..models import lama
from ..models.torch_loader import convert_state_dict
from .common import OfflineInpainter

PAD_SIZE = 8


def _lama_body(params, img, mask, n_blocks, dtype):
    img = img.astype(dtype) * (1.0 - mask.astype(dtype))
    out = lama.lama_generator_forward(params, img, mask.astype(dtype),
                                      n_blocks=n_blocks)
    out = out.astype(jnp.float32)
    return out * mask + (1.0 - mask) * img.astype(jnp.float32)


_lama_forward = jax.jit(_lama_body, static_argnames=('n_blocks', 'dtype'))


def _lama_mpe_body(params, img, mask, rel_emb, dir_emb, n_blocks, dtype):
    img = img.astype(dtype) * (1.0 - mask.astype(dtype))
    out = lama.lama_generator_forward(
        params, img, mask.astype(dtype), n_blocks=n_blocks,
        rel_pos_emb=rel_emb, direct_emb=dir_emb).astype(jnp.float32)
    return out * mask + (1.0 - mask) * img.astype(jnp.float32)


_lama_mpe_forward = jax.jit(_lama_mpe_body,
                            static_argnames=('n_blocks', 'dtype'))


class LamaLargeInpainter(OfflineInpainter):
    """lama_large_512px checkpoint, 18 FFC blocks (recommended)."""

    _MODEL_MAPPING = {
        'model': {
            'url': 'https://huggingface.co/dreMaz/AnimeMangaInpainting/'
                   'resolve/main/lama_large_512px.ckpt',
            'hash': '11d30fbb3000fb2eceae318b75d9ced9229d99ae990a7f8b3ac35c8d31f2c935',
            'file': '.',
        },
    }
    _N_BLOCKS = 18

    def __init__(self):
        super().__init__()
        self.params = None

    async def _load(self, device: str):
        n_blocks = self._N_BLOCKS
        params = self.load_params_converted(
            'model',
            lambda sd: convert_state_dict(
                _pick_gen(sd),
                transposed_conv_patterns=
                lama.TRANSPOSED_CONV_PATTERNS_FOR_BLOCKS[n_blocks]),
            init_fn=lambda: lama.init_params(n_blocks))
        # fold BN into convs once at load (exact; removes ~150 elementwise
        # ops from the 1536px forward)
        self.params = lama.fold_bn(params, n_blocks)

    async def _unload(self):
        self.params = None

    def _compute_dtype(self, config: InpainterConfig):
        if config.inpainting_precision == InpaintPrecision.fp32:
            return jnp.float32
        if config.inpainting_precision == InpaintPrecision.fp16:
            self.logger.warning(
                'Switch to bf16 due to Lama only compatible with bf16 and fp32.')
        return jnp.bfloat16

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

        img_j = jnp.asarray(image, jnp.float32)[None] / 255.0
        mask_j = (jnp.asarray(mask, jnp.float32)[None, :, :, None]
                  / 255.0 >= 0.5).astype(jnp.float32)
        out = _lama_forward(self.params, img_j, mask_j, self._N_BLOCKS,
                            self._compute_dtype(config))
        img_inpainted = np.asarray(
            jnp.clip(jnp.round(out[0] * 255.0), 0, 255).astype(jnp.uint8))
        if (new_h, new_w) != (height, width):
            img_inpainted = cv2.resize(img_inpainted, (width, height),
                                       interpolation=cv2.INTER_LINEAR)
        return (img_inpainted * mask_original
                + img_original * (1 - mask_original)).astype(np.uint8)

    def _batch_forward_dispatch(self, imgs: np.ndarray, masks: np.ndarray,
                                config: InpainterConfig):
        from ..parallel.mesh import sharded_batch
        dtype = self._compute_dtype(config)
        n_blocks = self._N_BLOCKS
        img_j = jnp.asarray(imgs, jnp.float32) / 255.0
        mask_j = (jnp.asarray(masks, jnp.float32)[..., None]
                  / 255.0 >= 0.5).astype(jnp.float32)
        out = sharded_batch(
            functools.partial(_lama_body, n_blocks=n_blocks, dtype=dtype),
            ('lama.batch', n_blocks, dtype.__name__),
            self.params, img_j, mask_j,
            jit_fallback=functools.partial(_lama_forward,
                                           n_blocks=n_blocks, dtype=dtype))
        return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)

    def _batch_forward(self, imgs: np.ndarray, masks: np.ndarray,
                       config: InpainterConfig) -> np.ndarray:
        return np.asarray(self._batch_forward_dispatch(imgs, masks, config))


class LamaMPEInpainter(LamaLargeInpainter):
    """lama_mpe checkpoint, 9 blocks + masked positional encoding."""

    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/inpainting_lama_mpe.ckpt',
            'hash': 'd625aa1b3e0d0408acfd6928aa84f005867aa8dbb9162480346a4e20660786cc',
            'file': '.',
        },
    }
    _N_BLOCKS = 9

    def __init__(self):
        super().__init__()
        self.mpe_params = None

    async def _load(self, device: str):
        await super()._load(device)
        # MPE weights live in the same checkpoint under str_state_dict
        ckpt_path = self._mapping_file_path('model')
        if ckpt_path.is_file():
            from ..models.torch_loader import load_torch_checkpoint
            import torch
            sd = torch.load(str(ckpt_path), map_location='cpu',
                            weights_only=True)
            if 'str_state_dict' in sd:
                self.mpe_params = convert_state_dict(sd['str_state_dict'])
        if self.mpe_params is None:
            self.mpe_params = {
                'rel_pos_emb.weight': jnp.asarray(
                    lama.sinusoidal_embedding_table(128, 64)),
                'direct_emb.weight': jnp.asarray(
                    np.random.RandomState(3).randn(4, 64).astype(np.float32)),
                'alpha5': jnp.zeros(()),
                'alpha6': jnp.zeros(()),
            }

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

        mask_bin = ((mask.astype(np.float32) / 255.0) >= 0.5).astype(
            np.float32)
        rel_pos, direct = lama.masked_position_encoding(mask_bin)
        rel_emb, dir_emb = lama.mpe_embeddings(
            self.mpe_params, jnp.asarray(rel_pos)[None],
            jnp.asarray(direct)[None])

        dtype = self._compute_dtype(config)
        img_j = jnp.asarray(image, jnp.float32)[None] / 255.0
        mask_j = jnp.asarray(mask_bin)[None, :, :, None]
        img_j = img_j.astype(dtype) * (1.0 - mask_j.astype(dtype))
        out = lama.lama_generator_forward(
            self.params, img_j, mask_j.astype(dtype), n_blocks=9,
            rel_pos_emb=rel_emb, direct_emb=dir_emb).astype(jnp.float32)
        out = out * mask_j + (1.0 - mask_j) * img_j.astype(jnp.float32)
        img_inpainted = np.asarray(
            jnp.clip(jnp.round(out[0] * 255.0), 0, 255).astype(jnp.uint8))
        if (new_h, new_w) != (height, width):
            img_inpainted = cv2.resize(img_inpainted, (width, height),
                                       interpolation=cv2.INTER_LINEAR)
        return (img_inpainted * mask_original
                + img_original * (1 - mask_original)).astype(np.uint8)

    def _batch_forward_dispatch(self, imgs: np.ndarray, masks: np.ndarray,
                                config: InpainterConfig):
        from ..parallel.mesh import sharded_batch
        dtype = self._compute_dtype(config)
        mask_bin = ((masks.astype(np.float32) / 255.0) >= 0.5).astype(
            np.float32)
        encs = [lama.masked_position_encoding(m) for m in mask_bin]
        rel_emb, dir_emb = lama.mpe_embeddings(
            self.mpe_params,
            jnp.asarray(np.stack([e[0] for e in encs])),
            jnp.asarray(np.stack([e[1] for e in encs])))
        img_j = jnp.asarray(imgs, jnp.float32) / 255.0
        mask_j = jnp.asarray(mask_bin)[..., None]
        out = sharded_batch(
            functools.partial(_lama_mpe_body, n_blocks=self._N_BLOCKS,
                              dtype=dtype),
            ('lama.mpe.batch', self._N_BLOCKS, dtype.__name__),
            self.params, img_j, mask_j, rel_emb, dir_emb,
            jit_fallback=functools.partial(_lama_mpe_forward,
                                           n_blocks=self._N_BLOCKS,
                                           dtype=dtype))
        return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)

    def _batch_forward(self, imgs: np.ndarray, masks: np.ndarray,
                       config: InpainterConfig) -> np.ndarray:
        return np.asarray(self._batch_forward_dispatch(imgs, masks, config))


def _pick_gen(sd):
    if isinstance(sd, dict) and 'gen_state_dict' in sd:
        return sd['gen_state_dict']
    return sd
