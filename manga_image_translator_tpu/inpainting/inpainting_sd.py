"""Stable-Diffusion guided inpainting (reference inpainting_sd.py + the
vendored ldm/ tree).

Status: gated stub. The reference vendors an 11k-LoC latent-diffusion tree;
the TPU build plan (SURVEY.md §7 step 7) schedules this last, preferably via
a flax diffusion implementation rather than a port. Selecting it today raises
a clear error instead of silently degrading.
"""
from __future__ import annotations

import numpy as np

from ..config import InpainterConfig
from .common import OfflineInpainter


class StableDiffusionInpainter(OfflineInpainter):
    _MODEL_MAPPING = {}

    async def _load(self, device: str):
        raise NotImplementedError(
            'StableDiffusionInpainter is not yet available in the TPU build; '
            'use inpainter=lama_large (recommended) or default (AOT).')

    async def _infer(self, image: np.ndarray, mask: np.ndarray,
                     config: InpainterConfig, inpainting_size: int = 1024,
                     verbose: bool = False) -> np.ndarray:
        raise NotImplementedError
