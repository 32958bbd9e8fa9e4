"""Local batch mode: path walking, save formats, save/load-text resume."""
import asyncio
import json
import os

import numpy as np
import pytest
from PIL import Image

from manga_image_translator_tpu.config import Config
from manga_image_translator_tpu.mode.local import (
    MangaTranslatorLocal,
    load_config_file,
)


def make_pages(tmp_path, n=2):
    src = tmp_path / 'src'
    src.mkdir()
    for i in range(n):
        img = np.full((120, 100, 3), 255, np.uint8)
        Image.fromarray(img).save(src / f'page{i:02d}.png')
    return src


def base_config_file(tmp_path):
    cfg = {
        'detector': {'detector': 'none'},
        'translator': {'translator': 'none',
                       'enable_post_translation_check': False},
        'inpainter': {'inpainter': 'none'},
    }
    p = tmp_path / 'cfg.json'
    p.write_text(json.dumps(cfg))
    return str(p)


def test_collect_and_natural_sort(tmp_path):
    src = make_pages(tmp_path, 3)
    (src / 'page10.png').touch()
    t = MangaTranslatorLocal({'use_gpu': False})
    files = t._collect_images([str(src)])
    names = [os.path.basename(f) for f in files]
    assert names == ['page00.png', 'page01.png', 'page02.png', 'page10.png']


def test_translate_path_end_to_end(tmp_path):
    src = make_pages(tmp_path, 2)
    dest = tmp_path / 'out'
    t = MangaTranslatorLocal({'use_gpu': False, 'ignore_errors': True})
    asyncio.run(t.translate_path(
        [str(src)], str(dest),
        {'config_file': base_config_file(tmp_path)}))
    outputs = sorted(os.listdir(dest))
    assert outputs == ['page00.png', 'page01.png']


def test_overwrite_skip(tmp_path):
    src = make_pages(tmp_path, 1)
    dest = tmp_path / 'out'
    dest.mkdir()
    existing = dest / 'page00.png'
    Image.new('RGB', (2, 2)).save(existing)
    mtime = existing.stat().st_mtime
    t = MangaTranslatorLocal({'use_gpu': False})
    asyncio.run(t.translate_path(
        [str(src)], str(dest),
        {'config_file': base_config_file(tmp_path)}))
    assert existing.stat().st_mtime == mtime  # untouched without --overwrite


def test_config_file_toml(tmp_path):
    p = tmp_path / 'cfg.toml'
    p.write_text('[detector]\ndetector = "none"\ndetection_size = 1024\n')
    cfg = load_config_file(str(p))
    assert cfg.detector.detection_size == 1024
    assert str(cfg.detector.detector) == 'Detector.none'


def test_jpeg_save_quality(tmp_path):
    from manga_image_translator_tpu.save import save_result
    from manga_image_translator_tpu.utils.generic import Context
    ctx = Context()
    ctx.save_quality = 50
    img = Image.fromarray(
        np.random.randint(0, 255, (64, 64, 3), dtype=np.uint8))
    out = tmp_path / 'x.jpg'
    save_result(img, str(out), ctx)
    assert out.exists()


def test_unsupported_format_raises(tmp_path):
    from manga_image_translator_tpu.save import (
        FormatNotSupportedException, save_result)
    from manga_image_translator_tpu.utils.generic import Context
    with pytest.raises(FormatNotSupportedException):
        save_result(Image.new('RGB', (4, 4)), str(tmp_path / 'x.bogus'),
                    Context())
