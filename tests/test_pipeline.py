"""End-to-end pipeline tests with random model weights (offline CI): the
full translate() flow must run detection → OCR → merge → translate → mask →
inpaint → render and return a Context with a result image."""
import asyncio

import cv2
import numpy as np
import pytest
from PIL import Image

from manga_image_translator_tpu.config import (
    Config,
    Detector,
    Inpainter,
    InpainterConfig,
    Ocr,
    Translator,
)
from manga_image_translator_tpu.manga_translator import (
    MangaTranslator,
    fix_brackets,
    load_dictionary,
    apply_dictionary,
)


def make_page():
    img = np.full((400, 300, 3), 255, np.uint8)
    cv2.putText(img, 'HELLO', (40, 100), cv2.FONT_HERSHEY_SIMPLEX, 1.5,
                (0, 0, 0), 3)
    cv2.putText(img, 'WORLD', (40, 200), cv2.FONT_HERSHEY_SIMPLEX, 1.5,
                (0, 0, 0), 3)
    return Image.fromarray(img)


def base_config(**overrides):
    cfg = {
        'detector': {'detector': 'default', 'detection_size': 256},
        'ocr': {'ocr': '48px'},
        'translator': {'translator': 'none', 'target_lang': 'ENG',
                       'enable_post_translation_check': False},
        'inpainter': {'inpainter': 'none'},
    }
    cfg.update(overrides)
    return Config(**cfg)


class TestPipeline:
    def test_full_translate_returns_context(self):
        translator = MangaTranslator({'use_gpu': False,
                                      'ignore_errors': False})
        ctx = asyncio.run(translator.translate(make_page(), base_config()))
        assert ctx.result is not None
        assert ctx.result.size == (300, 400)

    def test_blank_page_skips(self):
        translator = MangaTranslator({'use_gpu': False})
        blank = Image.fromarray(np.full((300, 300, 3), 255, np.uint8))
        ctx = asyncio.run(translator.translate(blank, base_config()))
        # no text regions -> result is the (un)upscaled input
        assert ctx.result is not None

    def test_progress_hooks_called(self):
        translator = MangaTranslator({'use_gpu': False})
        states = []

        async def hook(state, finished):
            states.append(state)

        translator.add_progress_hook(hook)
        asyncio.run(translator.translate(make_page(), base_config()))
        assert 'detection' in states

    def test_batch_translate(self):
        translator = MangaTranslator({'use_gpu': False})
        pages = [(make_page(), base_config()) for _ in range(2)]
        contexts = asyncio.run(translator.translate_batch(pages))
        assert len(contexts) == 2
        for ctx in contexts:
            assert ctx.result is not None

    def test_batch_predetect_groups_eligible_pages(self):
        # pages >= MINIMUM_IMAGE_SIZE on both sides take the batched
        # single-forward detection path
        translator = MangaTranslator({'use_gpu': False})
        img = np.full((448, 416, 3), 255, np.uint8)
        cv2.putText(img, 'HELLO', (40, 100), cv2.FONT_HERSHEY_SIMPLEX, 1.5,
                    (0, 0, 0), 3)
        page = Image.fromarray(img)
        pages = [(page, base_config()) for _ in range(3)]
        pre = asyncio.run(translator._batch_predetect(pages, batch_size=4))
        assert set(pre.keys()) == {0, 1, 2}
        for lines, raw_mask, _ in pre.values():
            # raw mask comes back at detect resolution, matching the
            # single-page path (ratio 256/448 -> 256x238)
            assert raw_mask.shape == (256, 238)
            assert isinstance(lines, list)
        contexts = asyncio.run(translator.translate_batch(pages))
        assert len(contexts) == 3
        for ctx in contexts:
            assert ctx.result is not None

    def test_batch_predetect_pipelines_chunks(self):
        """Multi-chunk predetect (dispatch chunk j, postprocess chunk j-1)
        must produce the same results as chunk-at-a-time collection."""
        translator = MangaTranslator({'use_gpu': False})
        img = np.full((448, 416, 3), 255, np.uint8)
        cv2.putText(img, 'CHUNK', (40, 100), cv2.FONT_HERSHEY_SIMPLEX, 1.5,
                    (0, 0, 0), 3)
        page = Image.fromarray(img)
        pages = [(page, base_config()) for _ in range(4)]
        pre2 = asyncio.run(translator._batch_predetect(pages, batch_size=2))
        pre4 = asyncio.run(translator._batch_predetect(pages, batch_size=4))
        assert set(pre2.keys()) == set(pre4.keys()) == {0, 1, 2, 3}
        for i in pre2:
            lines2, mask2, _ = pre2[i]
            lines4, mask4, _ = pre4[i]
            assert len(lines2) == len(lines4)
            # batch-size 2 vs 4 convolutions differ at numeric noise level;
            # a chunk-bookkeeping bug would differ wholesale
            assert mask2.shape == mask4.shape
            assert np.mean(np.abs(mask2.astype(int)
                                  - mask4.astype(int))) < 2.0

    def test_batch_predetect_skips_small_and_filtered_pages(self):
        translator = MangaTranslator({'use_gpu': False})
        small = Image.fromarray(np.full((300, 300, 3), 255, np.uint8))
        big = Image.fromarray(np.full((448, 448, 3), 255, np.uint8))
        inverted_cfg = base_config()
        inverted_cfg.detector.det_invert = True
        pages = [(small, base_config()), (big, inverted_cfg),
                 (big, base_config()), (big, base_config())]
        pre = asyncio.run(translator._batch_predetect(pages, batch_size=4))
        # only the two plain big pages batch together
        assert set(pre.keys()) == {2, 3}


class TestHelpers:
    def test_fix_brackets_removes_unpaired(self):
        assert fix_brackets('text)') == 'text'
        assert fix_brackets('(text') == 'text'
        assert fix_brackets('(text)') == '(text)'

    def test_fix_brackets_repairs_mismatch(self):
        assert fix_brackets('(text]') == '(text)'
        assert fix_brackets('「text》') == '「text」'

    def test_dictionary(self, tmp_path):
        p = tmp_path / 'dict.txt'
        p.write_text('foo\tbar\nbaz\n')
        d = load_dictionary(str(p))
        assert apply_dictionary('foo baz qux', d) == 'bar  qux'

    def test_hallucination_check(self):
        check = MangaTranslator._check_repetition_hallucination
        assert check('ab' * 30, 20)
        assert check('x' * 25, 20)
        assert not check('a normal sentence with words', 20)
        assert not check('', 20)
