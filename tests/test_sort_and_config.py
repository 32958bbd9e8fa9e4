"""Region sorting, panel detection, and config-schema contract tests."""
import json

import numpy as np
import pytest

from manga_image_translator_tpu.config import (
    Config,
    Detector,
    Inpainter,
    Translator,
    TranslatorChain,
)
from manga_image_translator_tpu.utils.panel import get_panels_from_array
from manga_image_translator_tpu.utils.sort import sort_regions
from manga_image_translator_tpu.utils.textblock import TextBlock


def region(x, y, w=40, h=20, text='t'):
    return TextBlock([[[x, y], [x + w, y], [x + w, y + h], [x, y + h]]],
                     texts=[text])


class TestSort:
    def test_simple_sort_rtl(self):
        regions = [region(10, 10), region(200, 10), region(100, 300)]
        out = sort_regions(regions, right_to_left=True,
                           force_simple_sort=True)
        # same row: right first; then lower row
        assert out[0].xyxy[0] == 200
        assert out[1].xyxy[0] == 10
        assert out[2].xyxy[1] == 300

    def test_simple_sort_ltr(self):
        regions = [region(200, 10), region(10, 10)]
        out = sort_regions(regions, right_to_left=False,
                           force_simple_sort=True)
        assert out[0].xyxy[0] == 10

    def test_smart_sort_vertical_spread(self):
        regions = [region(50, 300), region(50, 10), region(50, 150)]
        out = sort_regions(regions, right_to_left=True)
        ys = [r.xyxy[1] for r in out]
        assert ys == sorted(ys)

    def test_panel_detection_on_two_panel_page(self):
        img = np.full((400, 300, 3), 255, np.uint8)
        import cv2
        cv2.rectangle(img, (10, 10), (290, 180), (0, 0, 0), -1)
        cv2.rectangle(img, (10, 220), (290, 390), (0, 0, 0), -1)
        panels = get_panels_from_array(img)
        assert len(panels) == 2
        assert panels[0][1] < panels[1][1]  # top panel first

    def test_panel_sort_groups_regions(self):
        img = np.full((400, 300, 3), 255, np.uint8)
        import cv2
        cv2.rectangle(img, (10, 10), (290, 180), (30, 30, 30), -1)
        cv2.rectangle(img, (10, 220), (290, 390), (30, 30, 30), -1)
        bottom = region(100, 300)
        top = region(100, 50)
        out = sort_regions([bottom, top], right_to_left=True, img=img)
        assert out[0].xyxy[1] == 50


class TestConfigContract:
    def test_reference_style_config_parses(self):
        raw = {
            'detector': {'detector': 'ctd', 'detection_size': 1536,
                         'unclip_ratio': 2.0},
            'ocr': {'ocr': '48px_ctc', 'min_text_length': 2},
            'translator': {'translator': 'openai', 'target_lang': 'CHS'},
            'inpainter': {'inpainter': 'lama_mpe',
                          'inpainting_precision': 'fp32'},
            'render': {'renderer': 'manga2eng', 'font_color': 'FF0000'},
            'kernel_size': 5,
        }
        cfg = Config(**raw)
        assert cfg.detector.detector == Detector.ctd
        # 'openai' aliases to chatgpt (reference config.py:144-148)
        assert cfg.translator.translator == Translator.chatgpt
        assert cfg.render.font_color_fg == (255, 0, 0)
        assert cfg.inpainter.inpainter == Inpainter.lama_mpe
        assert cfg.kernel_size == 5

    def test_schema_dumpable(self):
        schema = Config.model_json_schema()
        text = json.dumps(schema)
        assert 'detector' in text and 'translator' in text

    def test_translator_chain_gen(self):
        cfg = Config(**{'translator': {'translator': 'none',
                                       'target_lang': 'ENG'}})
        chain = cfg.translator.translator_gen
        assert isinstance(chain, TranslatorChain)
        assert chain.target_lang == 'ENG'

    def test_default_values_match_reference(self):
        cfg = Config()
        assert cfg.detector.detection_size == 2048
        assert cfg.detector.unclip_ratio == 2.3
        assert cfg.inpainter.inpainting_size == 2048
        assert str(cfg.inpainter.inpainting_precision) == 'bf16'
        assert cfg.mask_dilation_offset == 20
        assert cfg.translator.translator == Translator.sugoi
        assert cfg.ocr.ocr.value == '48px'
