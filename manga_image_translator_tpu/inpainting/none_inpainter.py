"""No-op inpainters (reference inpainting/none.py and original.py)."""
from __future__ import annotations

import numpy as np

from ..config import InpainterConfig
from .common import CommonInpainter


class NoneInpainter(CommonInpainter):
    """Fills masked regions with white."""

    async def _inpaint(self, image: np.ndarray, mask: np.ndarray,
                       config: InpainterConfig, inpainting_size: int = 1024,
                       verbose: bool = False) -> np.ndarray:
        img = np.copy(image)
        img[mask > 0] = np.array([255, 255, 255], np.uint8)
        return img


class OriginalInpainter(CommonInpainter):
    """Returns the image untouched (for prep-manual-typesetting workflows)."""

    async def _inpaint(self, image: np.ndarray, mask: np.ndarray,
                       config: InpainterConfig, inpainting_size: int = 1024,
                       verbose: bool = False) -> np.ndarray:
        return np.copy(image)
