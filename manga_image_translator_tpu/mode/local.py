"""Local batch mode (contract: reference mode/local.py:73-571 — path
walking with natural sort, config-file loading, dest naming, --attempts
retry, save formats, --save-text/--load-text)."""
from __future__ import annotations

import asyncio
import json
import os
from typing import List, Optional, Union

from PIL import Image

from ..config import Config
from ..manga_translator import MangaTranslator, logger
from ..save import OUTPUT_FORMATS, save_result
from ..utils.generic import Context, natural_sort

IMG_EXTS = ('.png', '.jpg', '.jpeg', '.bmp', '.webp', '.gif')


def load_config_file(path: Optional[str]) -> Config:
    if not path:
        return Config()
    with open(path, encoding='utf8') as f:
        text = f.read()
    if path.endswith('.toml'):
        import tomllib
        data = tomllib.loads(text)
    else:
        data = json.loads(text)
    return Config(**data)


class MangaTranslatorLocal(MangaTranslator):
    def __init__(self, params: Optional[dict] = None):
        super().__init__(params)
        params = params or {}
        self.attempts = int(params.get('attempts', 0) or 0)
        self.skip_no_text = params.get('skip_no_text', False)
        self.text_output_file = params.get('save_text_file', '')
        self.save_quality = int(params.get('save_quality', 100) or 100)
        self.prep_manual = params.get('prep_manual', False)
        self.overwrite = params.get('overwrite', False)
        self.format = params.get('format')

    def _collect_images(self, paths: List[str]) -> List[str]:
        files = []
        for p in paths:
            if os.path.isfile(p):
                files.append(p)
            else:
                for root, _dirs, names in os.walk(p):
                    for name in names:
                        if os.path.splitext(name)[1].lower() in IMG_EXTS:
                            files.append(os.path.join(root, name))
        return natural_sort(files)

    def _dest_path(self, file_path: str, dest: str) -> str:
        base = os.path.splitext(os.path.basename(file_path))[0]
        ext = self.format or os.path.splitext(file_path)[1][1:]
        if ext not in OUTPUT_FORMATS:
            ext = 'png'
        os.makedirs(dest or 'result-translated', exist_ok=True)
        return os.path.join(dest or 'result-translated', f'{base}.{ext}')

    async def translate_path(self, path: Union[str, List[str]],
                             dest: str = '',
                             params: Optional[dict] = None):
        params = params or {}
        # in-memory Config (studio/profile jobs) wins over a config file
        config = params.get('config') \
            or load_config_file(params.get('config_file'))
        paths = path if isinstance(path, list) else [path]
        files = self._collect_images(paths)
        logger.info(f'Found {len(files)} images')
        translated = 0
        for file_path in files:
            out_path = self._dest_path(file_path, dest)
            if os.path.exists(out_path) and not self.overwrite:
                logger.info(f'Skipping existing: {out_path}')
                continue
            if await self.translate_file(file_path, out_path, config):
                translated += 1
        logger.info(f'Translated {translated}/{len(files)} images')

    async def translate_file(self, file_path: str, output_path: str,
                             config: Config) -> bool:
        attempts = 0
        while True:
            try:
                image = Image.open(file_path)
                ctx = await self.translate(image, config,
                                           image_name=file_path)
                break
            except Exception:
                attempts += 1
                if self.attempts != -1 and attempts > self.attempts:
                    if self.ignore_errors:
                        logger.exception(f'Failed: {file_path}')
                        return False
                    raise
                logger.warning(f'Retrying ({attempts}): {file_path}')

        if ctx.result is None:
            return False
        if self.skip_no_text and not ctx.get('text_regions'):
            return False
        ctx.save_quality = self.save_quality
        save_result(ctx.result, output_path, ctx)

        if self.prep_manual:
            # blank inpainted page + original copy for manual typesetting
            # (reference mode/local.py --prep-manual)
            base, ext = os.path.splitext(output_path)
            if ctx.get('img_inpainted') is not None:
                Image.fromarray(ctx.img_inpainted).save(
                    f'{base}-inpainted{ext}')
            Image.open(file_path).save(f'{base}-original{ext}')

        if self.save_text or self.text_output_file:
            self._save_text(ctx)
        return True

    def _save_text(self, ctx: Context):
        out = self.text_output_file or self._text_save_path(ctx)
        os.makedirs(os.path.dirname(out) or '.', exist_ok=True)
        data = []
        for region in ctx.get('text_regions') or []:
            data.append({'text': region.text,
                         'translation': getattr(region, 'translation', '')})
        with open(out, 'w', encoding='utf8') as f:
            json.dump(data, f, ensure_ascii=False, indent=2)
