"""Pipeline configuration schema.

This mirrors the *public contract* of the reference implementation
(``manga_translator/config.py:59-352``): same enum names/values, same field
names and defaults, so that JSON/TOML config files written for the reference
validate unchanged against this framework.  The implementation is new.
"""
from __future__ import annotations

import re
from enum import Enum
from typing import Optional

from pydantic import BaseModel, PrivateAttr


def hex2rgb(h: str) -> tuple[int, int, int]:
    h = h.lstrip('#')
    if len(h) != 6:
        raise ValueError(f'Invalid hex color: {h!r}')
    return tuple(int(h[i:i + 2], 16) for i in (0, 2, 4))


# --------------------------------------------------------------------------
# Enums naming every pluggable backend (reference config.py:59-155)
# --------------------------------------------------------------------------

class Renderer(str, Enum):
    default = "default"
    manga2Eng = "manga2eng"
    manga2EngPillow = "manga2eng_pillow"
    none = "none"


class Alignment(str, Enum):
    auto = "auto"
    left = "left"
    center = "center"
    right = "right"


class Direction(str, Enum):
    auto = "auto"
    h = "horizontal"
    v = "vertical"


class InpaintPrecision(str, Enum):
    fp32 = "fp32"
    fp16 = "fp16"
    bf16 = "bf16"

    def __str__(self):
        return self.name


class Detector(str, Enum):
    default = "default"
    dbconvnext = "dbconvnext"
    ctd = "ctd"
    craft = "craft"
    paddle = "paddle"
    none = "none"


class Inpainter(str, Enum):
    default = "default"
    lama_large = "lama_large"
    lama_mpe = "lama_mpe"
    sd = "sd"
    none = "none"
    original = "original"


class Colorizer(str, Enum):
    none = "none"
    mc2 = "mc2"


class Ocr(str, Enum):
    ocr32px = "32px"
    ocr48px = "48px"
    ocr48px_ctc = "48px_ctc"
    mocr = "mocr"


class Translator(str, Enum):
    youdao = "youdao"
    baidu = "baidu"
    deepl = "deepl"
    papago = "papago"
    caiyun = "caiyun"
    chatgpt = "chatgpt"
    chatgpt_2stage = "chatgpt_2stage"
    none = "none"
    original = "original"
    sakura = "sakura"
    deepseek = "deepseek"
    groq = "groq"
    gemini = "gemini"
    gemini_2stage = "gemini_2stage"
    custom_openai = "custom_openai"
    offline = "offline"
    nllb = "nllb"
    nllb_big = "nllb_big"
    sugoi = "sugoi"
    jparacrawl = "jparacrawl"
    jparacrawl_big = "jparacrawl_big"
    m2m100 = "m2m100"
    m2m100_big = "m2m100_big"
    m2m100_hf = "m2m100_hf"
    m2m100_hf_big = "m2m100_hf_big"
    mbart50 = "mbart50"
    qwen2 = "qwen2"
    qwen2_big = "qwen2_big"

    def __str__(self):
        return self.name

    @classmethod
    def _missing_(cls, value):
        # 'openai' / 'gpt*' are accepted aliases for chatgpt (reference
        # config.py:144-148).
        if isinstance(value, str) and (value.startswith('gpt') or value == 'openai'):
            return cls.chatgpt
        raise ValueError(f"{value} is not a valid {cls.__name__}")


class Upscaler(str, Enum):
    waifu2x = "waifu2x"
    esrgan = "esrgan"
    upscler4xultrasharp = "4xultrasharp"


# --------------------------------------------------------------------------
# Translator chains ('trans1:lang1;trans2:lang2', reference config.py:12-52)
# --------------------------------------------------------------------------

class TranslatorChain:
    def __init__(self, string: str):
        from .translators import TRANSLATORS, VALID_LANGUAGES
        if not string:
            raise ValueError('Invalid translator chain')
        self.chain: list[tuple[Translator, str]] = []
        self.target_lang: Optional[str] = None
        for group in string.split(';'):
            trans, lang = group.split(':')
            translator = Translator[trans]
            if translator not in TRANSLATORS:
                raise ValueError(
                    f'Invalid choice: {trans} (choose from {sorted(t.name for t in TRANSLATORS)})')
            if lang not in VALID_LANGUAGES:
                raise ValueError(
                    f'Invalid choice: {lang} (choose from {sorted(VALID_LANGUAGES)})')
            self.chain.append((translator, lang))
        self.translators = [t for t, _ in self.chain]
        self.langs = [l for _, l in self.chain]

    def has_offline(self) -> bool:
        from .translators import OFFLINE_TRANSLATORS
        return any(t in OFFLINE_TRANSLATORS for t in self.translators)

    def __eq__(self, other: object) -> bool:
        if isinstance(other, str):
            return other == self.translators[0]
        return NotImplemented


# --------------------------------------------------------------------------
# Per-stage sub-configs (reference config.py:156-319)
# --------------------------------------------------------------------------

class RenderConfig(BaseModel):
    renderer: Renderer = Renderer.default
    alignment: Alignment = Alignment.auto
    disable_font_border: bool = False
    font_size_offset: int = 0
    font_size_minimum: int = -1
    direction: Direction = Direction.auto
    uppercase: bool = False
    lowercase: bool = False
    gimp_font: str = 'Sans-serif'
    no_hyphenation: bool = False
    font_color: Optional[str] = None
    line_spacing: Optional[int] = None
    font_size: Optional[int] = None
    rtl: bool = True

    _font_color_fg: Optional[tuple] = PrivateAttr(default=None)
    _font_color_bg: Optional[tuple] = PrivateAttr(default=None)

    def _parse_font_color(self):
        parts = self.font_color.split(':')
        try:
            self._font_color_fg = hex2rgb(parts[0]) if parts[0] else None
            self._font_color_bg = (
                hex2rgb(parts[1]) if len(parts) > 1 and parts[1] else None)
        except ValueError:
            raise Exception(
                f'Invalid --font-color value: {self.font_color}. '
                f'Use a hex value such as FF0000')

    @property
    def font_color_fg(self):
        if self.font_color and self._font_color_fg is None:
            self._parse_font_color()
        return self._font_color_fg

    @property
    def font_color_bg(self):
        if self.font_color and self._font_color_bg is None:
            self._parse_font_color()
        return self._font_color_bg


class UpscaleConfig(BaseModel):
    upscaler: Upscaler = Upscaler.esrgan
    revert_upscaling: bool = False
    upscale_ratio: Optional[int] = None


class TranslatorConfig(BaseModel):
    translator: Translator = Translator.sugoi
    target_lang: str = 'ENG'
    no_text_lang_skip: bool = False
    skip_lang: Optional[str] = None
    gpt_config: Optional[str] = None
    translator_chain: Optional[str] = None
    selective_translation: Optional[str] = None
    enable_post_translation_check: bool = True
    post_check_max_retry_attempts: int = 3
    post_check_repetition_threshold: int = 20
    post_check_target_lang_threshold: float = 0.5

    _translator_gen: Optional[TranslatorChain] = PrivateAttr(default=None)
    _gpt_config = PrivateAttr(default=None)

    @property
    def translator_gen(self) -> TranslatorChain:
        if self._translator_gen is None:
            if self.selective_translation is not None:
                chain = TranslatorChain(self.selective_translation)
                chain.target_lang = self.target_lang
            elif self.translator_chain is not None:
                chain = TranslatorChain(self.translator_chain)
                chain.target_lang = chain.langs[0]
            else:
                chain = TranslatorChain(f'{self.translator}:{self.target_lang}')
                chain.target_lang = self.target_lang
            self._translator_gen = chain
        return self._translator_gen

    @property
    def chatgpt_config(self):
        if self.gpt_config is not None and self._gpt_config is None:
            import json
            import pathlib
            text = pathlib.Path(self.gpt_config).read_text()
            try:
                self._gpt_config = json.loads(text)
            except json.JSONDecodeError:
                import yaml  # type: ignore
                self._gpt_config = yaml.safe_load(text)
        return self._gpt_config


class DetectorConfig(BaseModel):
    detector: Detector = Detector.default
    detection_size: int = 2048
    text_threshold: float = 0.5
    det_rotate: bool = False
    det_auto_rotate: bool = False
    det_invert: bool = False
    det_gamma_correct: bool = False
    box_threshold: float = 0.7
    unclip_ratio: float = 2.3


class InpainterConfig(BaseModel):
    inpainter: Inpainter = Inpainter.lama_large
    inpainting_size: int = 2048
    inpainting_precision: InpaintPrecision = InpaintPrecision.bf16


class ColorizerConfig(BaseModel):
    colorization_size: int = 576
    denoise_sigma: int = 30
    colorizer: Colorizer = Colorizer.none


class OcrConfig(BaseModel):
    use_mocr_merge: bool = False
    ocr: Ocr = Ocr.ocr48px
    min_text_length: int = 0
    ignore_bubble: int = 0
    prob: Optional[float] = None


class Config(BaseModel):
    filter_text: Optional[str] = None
    render: RenderConfig = RenderConfig()
    upscale: UpscaleConfig = UpscaleConfig()
    translator: TranslatorConfig = TranslatorConfig()
    detector: DetectorConfig = DetectorConfig()
    colorizer: ColorizerConfig = ColorizerConfig()
    inpainter: InpainterConfig = InpainterConfig()
    ocr: OcrConfig = OcrConfig()
    force_simple_sort: bool = False
    kernel_size: int = 3
    mask_dilation_offset: int = 20

    _re_filter_text = PrivateAttr(default=None)

    @property
    def re_filter_text(self):
        if self._re_filter_text is None:
            self._re_filter_text = re.compile(self.filter_text)
        return self._re_filter_text
