"""CTranslate2-based offline NMT: sugoi / jparacrawl / m2m100.

Contracts from reference ``translators/sugoi.py`` and ``m2m100.py``: the
same released model archives (ct2 converted weights + sentencepiece models).
These engines require the native ``ctranslate2`` + ``sentencepiece``
libraries; when absent, loading raises with a pointer to the HF-backed
equivalents (m2m100_hf / nllb) instead of failing obscurely.
"""
from __future__ import annotations

from typing import List

from .common import OfflineTranslator


def _require_ct2():
    try:
        import ctranslate2  # noqa: F401
        import sentencepiece  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            'This translator needs the native ctranslate2 + sentencepiece '
            'libraries, which are not installed. Use translator=m2m100_hf '
            'or nllb for an offline alternative.') from e


class _CT2Translator(OfflineTranslator):
    _CT2_MODEL_DIR = ''

    def __init__(self):
        super().__init__()
        self.translator = None
        self.sp_source = None
        self.sp_target = None

    async def _load(self, device: str):
        _require_ct2()
        import ctranslate2
        import sentencepiece as spm
        base = self._get_file_path(self._CT2_MODEL_DIR)
        self.translator = ctranslate2.Translator(str(base), device='cpu')
        self.sp_source = spm.SentencePieceProcessor(
            model_file=str(base / 'spm.src.model'))
        self.sp_target = spm.SentencePieceProcessor(
            model_file=str(base / 'spm.tgt.model'))

    async def _unload(self):
        self.translator = None

    async def _infer(self, from_lang: str, to_lang: str,
                     queries: List[str]) -> List[str]:
        tokenized = [self.sp_source.encode(q, out_type=str) for q in queries]
        results = self.translator.translate_batch(tokenized)
        return [self.sp_target.decode(r.hypotheses[0]) for r in results]


class JparacrawlTranslator(_CT2Translator):
    """JParaCrawl ja<->en NMT (reference sugoi.py:9-120)."""

    _LANGUAGE_CODE_MAP = {'JPN': 'ja', 'ENG': 'en'}
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/jparacrawl-base-models.zip',
            'hash': 'e98e0fa35a80d2bc48c16673914639db66da1013ec66cc7b79119cdd3b542ebb',
            'archive-content': '.',
        },
    }
    _CT2_MODEL_DIR = 'jparacrawl'


class JparacrawlBigTranslator(JparacrawlTranslator):
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/jparacrawl-big-models.zip',
            'hash': '5e0c4cea5a5098152f566de3694602ed3db52927d3df22d2a7bfb8dba2bebe33',
            'archive-content': '.',
        },
    }
    _CT2_MODEL_DIR = 'jparacrawl-big'


class SugoiTranslator(JparacrawlTranslator):
    """Sugoi V4 ja->en (reference sugoi.py:121-209) — the config default."""

    _LANGUAGE_CODE_MAP = {'JPN': 'ja', 'ENG': 'en'}
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/sugoi-models.zip',
            'hash': '67e060a62dc16211157a5eaa4fa8f72c86db5999fc69322606a6fcdf57f587f7',
            'archive-content': '.',
        },
    }
    _CT2_MODEL_DIR = 'sugoi'


class M2M100Translator(_CT2Translator):
    """m2m100 ct2-converted (reference m2m100.py)."""

    _LANGUAGE_CODE_MAP = {
        'CHS': '__zh__', 'CHT': '__zh__', 'CSY': '__cs__', 'NLD': '__nl__',
        'ENG': '__en__', 'FRA': '__fr__', 'DEU': '__de__', 'HUN': '__hu__',
        'ITA': '__it__', 'JPN': '__ja__', 'KOR': '__ko__', 'POL': '__pl__',
        'PTB': '__pt__', 'ROM': '__ro__', 'RUS': '__ru__', 'ESP': '__es__',
        'TRK': '__tr__', 'UKR': '__uk__', 'VIN': '__vi__', 'ARA': '__ar__',
        'SRP': '__sr__', 'HRV': '__hr__', 'THA': '__th__', 'IND': '__id__',
        'FIL': '__tl__',
    }
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/m2m100_418m_ct2.zip',
            'hash': '8a9cd0e00505a7879f26e5a1b396b447bc29967783a1e17e8df5eecb0c13d1c3', 'archive-content': '.',
        },
    }
    _CT2_MODEL_DIR = 'm2m100'

    async def _infer(self, from_lang: str, to_lang: str,
                     queries: List[str]) -> List[str]:
        tokenized = [[from_lang] + self.sp_source.encode(q, out_type=str)
                     for q in queries]
        results = self.translator.translate_batch(
            tokenized, target_prefix=[[to_lang]] * len(queries))
        return [self.sp_target.decode(
            [t for t in r.hypotheses[0] if not t.startswith('__')])
            for r in results]


class M2M100BigTranslator(M2M100Translator):
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/m2m100_12b_ct2.zip',
            'hash': '742d5380c2837affd3680339145d37fc78f537ad633958347b76e9be9c577662', 'archive-content': '.',
        },
    }
    _CT2_MODEL_DIR = 'm2m100-big'
