"""Inpainter base classes (contract: reference inpainting/common.py)."""
from __future__ import annotations

from abc import abstractmethod

import numpy as np

from ..config import InpainterConfig
from ..utils.inference import InfererModule, ModelWrapper


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
