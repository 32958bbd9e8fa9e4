"""Trivial translators (reference translators/none.py, original.py)."""
from __future__ import annotations

from typing import List

from .common import CommonTranslator


class NoneTranslator(CommonTranslator):
    """Erases text: every translation is empty."""

    async def translate(self, from_lang, to_lang, queries, use_mtpe=False):
        return ['' for _ in queries]

    async def _translate(self, from_lang, to_lang, queries) -> List[str]:
        return ['' for _ in queries]


class OriginalTranslator(CommonTranslator):
    """Keeps the original text (re-renders the source)."""

    async def translate(self, from_lang, to_lang, queries, use_mtpe=False):
        return list(queries)

    async def _translate(self, from_lang, to_lang, queries) -> List[str]:
        return list(queries)
