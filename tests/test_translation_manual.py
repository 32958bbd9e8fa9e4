"""Manual translator run (reference test/test_translation_manual.py):

    pytest tests/test_translation_manual.py --translator chatgpt \
        --tgt-lang ENG --text "こんにちは" -s

Skipped automatically for API translators without keys.
"""
import asyncio

import pytest

from manga_image_translator_tpu.config import Translator, TranslatorChain
from manga_image_translator_tpu.translators import (
    MissingAPIKeyException,
    dispatch,
)


def test_manual_translation(request):
    key = request.config.getoption('--translator')
    lang = request.config.getoption('--tgt-lang')
    text = request.config.getoption('--text')
    count = request.config.getoption('--count')
    try:
        chain = TranslatorChain(f'{key}:{lang}')
        out = asyncio.run(dispatch(chain, [text] * count))
    except MissingAPIKeyException as e:
        pytest.skip(str(e))
    except NotImplementedError as e:
        pytest.skip(str(e))
    assert len(out) == count
    for q, t in zip([text] * count, out):
        print(f'{q} => {t}')
