"""manga-colorization-v2 (mc2) colorizer.

Contract: reference ``colorization/manga_colorization_v2.py`` (FFDNet
denoiser + extractor/U-Net generator, size multiple of 32, ≤576 sweet spot).

Status: model port pending (SURVEY.md §7 step 7 priority order); selecting
mc2 today raises a clear error. The stage registry/dispatch surface is
complete.
"""
from __future__ import annotations

from PIL import Image

from .common import OfflineColorizer


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

    async def _load(self, device: str):
        raise NotImplementedError(
            'The mc2 colorizer port is not yet available in the TPU build; '
            'run with colorizer=none (the default).')

    async def _infer(self, image: Image.Image, colorization_size: int,
                     **kwargs) -> Image.Image:
        raise NotImplementedError
