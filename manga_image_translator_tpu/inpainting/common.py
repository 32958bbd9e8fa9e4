"""Inpainter base classes (contract: reference inpainting/common.py).

The batch path (``infer_batch``) has no reference equivalent — the
reference inpaints strictly one page per forward. On TPU the page batch is
the unit of data parallelism: same-config pages letterbox onto one canvas,
run as ONE device forward, and shard over every visible chip via the
serving mesh (parallel/mesh.get_mesh) when one exists (SURVEY §2.15
"Inter-page batching" TPU equivalent).
"""
from __future__ import annotations

from abc import abstractmethod
from typing import List

import cv2
import numpy as np

from ..config import InpainterConfig
from ..utils.inference import InfererModule, ModelWrapper

PAD_SIZE = 8


class CommonInpainter(InfererModule):

    async def inpaint(self, image: np.ndarray, mask: np.ndarray,
                      config: InpainterConfig, inpainting_size: int = 1024,
                      verbose: bool = False) -> np.ndarray:
        return await self._inpaint(image, mask, config, inpainting_size,
                                   verbose)

    @abstractmethod
    async def _inpaint(self, image, mask, config, inpainting_size, verbose):
        ...


class OfflineInpainter(CommonInpainter, ModelWrapper):
    _MODEL_SUB_DIR = 'inpainting'

    def __init__(self):
        ModelWrapper.__init__(self)

    async def _inpaint(self, *args, **kwargs):
        return await self.infer(*args, **kwargs)

    # -- batched page path -------------------------------------------------

    def _batch_forward(self, imgs: np.ndarray, masks: np.ndarray,
                       config: InpainterConfig) -> np.ndarray:
        """(N, H, W, 3) uint8 + (N, H, W) uint8 mask -> (N, H, W, 3) uint8
        inpainted. Overridden by inpainters with a batchable forward."""
        raise NotImplementedError

    @property
    def supports_batch(self) -> bool:
        return (type(self)._batch_forward
                is not OfflineInpainter._batch_forward)

    async def infer_batch(self, images: List[np.ndarray],
                          masks: List[np.ndarray], config: InpainterConfig,
                          inpainting_size: int = 1024,
                          verbose: bool = False) -> List[np.ndarray]:
        """Inpaint N same-config pages in one batched device forward.

        Per-page preprocessing mirrors ``_infer`` (aspect-resize to
        inpainting_size, stretch to a multiple of 8), then every page
        letterboxes top-left onto the batch max canvas with a zero mask in
        the padding — un-masked pixels pass through the final composite
        unchanged, so padding never leaks into the output."""
        n = len(images)
        metas, proc = [], []
        for image, mask in zip(images, masks):
            img_original = np.copy(image)
            mask_original = (np.copy(mask) >= 127).astype(np.uint8)[:, :,
                                                                    None]
            height, width = image.shape[:2]
            if max(image.shape[:2]) > inpainting_size:
                ratio = inpainting_size / max(height, width)
                new_size = (round(width * ratio), round(height * ratio))
                image = cv2.resize(image, new_size,
                                   interpolation=cv2.INTER_LINEAR)
                mask = cv2.resize(mask, new_size,
                                  interpolation=cv2.INTER_LINEAR)
            h, w = image.shape[:2]
            new_h = h + ((-h) % PAD_SIZE)
            new_w = w + ((-w) % PAD_SIZE)
            if (new_h, new_w) != (h, w):
                image = cv2.resize(image, (new_w, new_h),
                                   interpolation=cv2.INTER_LINEAR)
                mask = cv2.resize(mask, (new_w, new_h),
                                  interpolation=cv2.INTER_LINEAR)
            metas.append((height, width, new_h, new_w, img_original,
                          mask_original))
            proc.append((image, mask))

        canvas_h = max(m[2] for m in metas)
        canvas_w = max(m[3] for m in metas)
        canvas = np.zeros((n, canvas_h, canvas_w, 3), np.uint8)
        mcanvas = np.zeros((n, canvas_h, canvas_w), np.uint8)
        for i, (image, mask) in enumerate(proc):
            h, w = image.shape[:2]
            canvas[i, :h, :w] = image
            mcanvas[i, :h, :w] = mask
        self.logger.info(
            f'Batched inpainting: {n} pages at {canvas_w}x{canvas_h}')

        out = self._batch_forward(canvas, mcanvas, config)

        results = []
        for i, (height, width, new_h, new_w, img_original,
                mask_original) in enumerate(metas):
            img = out[i, :new_h, :new_w]
            if (new_h, new_w) != (height, width):
                img = cv2.resize(img, (width, height),
                                 interpolation=cv2.INTER_LINEAR)
            results.append((img * mask_original
                            + img_original * (1 - mask_original)
                            ).astype(np.uint8))
        return results
