"""Translator tests, modeled on reference test/test_translation.py: every
backend is instantiated (catching MissingAPIKeyException so CI passes
keyless); the trivial/parsing paths are tested concretely."""
import asyncio

import pytest

from manga_image_translator_tpu.config import Translator, TranslatorChain
from manga_image_translator_tpu.translators import (
    MissingAPIKeyException,
    NoneTranslator,
    OriginalTranslator,
    TRANSLATORS,
    VALID_LANGUAGES,
    dispatch,
    dispatch_batch,
    get_translator,
)
from manga_image_translator_tpu.translators.chatgpt import OpenAITranslator
from manga_image_translator_tpu.translators.common import CommonTranslator


def test_valid_languages_count():
    assert len(VALID_LANGUAGES) == 26
    assert VALID_LANGUAGES['ENG'] == 'English'
    assert VALID_LANGUAGES['JPN'] == 'Japanese'


def test_every_enum_value_registered():
    for t in Translator:
        assert t in TRANSLATORS, f'{t} missing from registry'


def test_instantiate_all_translators():
    for key in TRANSLATORS:
        try:
            translator = get_translator(key)
            assert isinstance(translator, CommonTranslator)
        except MissingAPIKeyException:
            pass  # keyless CI


def test_none_translator():
    out = asyncio.run(NoneTranslator().translate('JPN', 'ENG', ['a', 'b']))
    assert out == ['', '']


def test_original_translator():
    out = asyncio.run(OriginalTranslator().translate('JPN', 'ENG',
                                                     ['こん', 'にちは']))
    assert out == ['こん', 'にちは']


def test_chain_dispatch_none():
    chain = TranslatorChain('none:ENG')
    out = asyncio.run(dispatch(chain, ['query one', 'query two']))
    assert out == ['', '']


def test_batch_dispatch_regroups():
    chain = TranslatorChain('original:ENG')
    batches = [['a', 'b'], ['c'], []]
    out = asyncio.run(dispatch_batch(chain, batches))
    assert out == [['a', 'b'], ['c'], []]


def test_chain_parsing():
    chain = TranslatorChain('none:JPN;original:ENG')
    assert chain.langs == ['JPN', 'ENG']
    assert len(chain.translators) == 2


def test_chain_invalid_lang_rejected():
    with pytest.raises(ValueError):
        TranslatorChain('none:XXX')


def test_openai_prompt_assembly_and_parsing():
    t = OpenAITranslator.__new__(OpenAITranslator)
    prompt = t._assemble_prompt('ENG', ['first', 'second'])
    assert prompt == '<|1|>first\n<|2|>second'
    parsed = t._parse_response('<|1|>one\n<|2|>two extra\n', 2)
    assert parsed == ['one', 'two extra']
    # out-of-order and noisy responses
    parsed = t._parse_response('junk <|2|>B <|1|>A', 2)
    assert parsed == ['A', 'B']
    # single answer without prefix
    parsed = t._parse_response('just text', 1)
    assert parsed == ['just text']


def test_clean_translation_output():
    t = NoneTranslator()
    cleaned = t._clean_translation_output('query text here',
                                          'word   word.word', 'ENG')
    assert '  ' not in cleaned
    assert 'word. word' in cleaned


def test_repetition_shrink():
    # shrink only triggers when the translation is shorter than the query
    # (reference common.py:289)
    t = NoneTranslator()
    query = 'a quite long original query string for the test'
    out = t._clean_translation_output(query, 'abab' * 5, 'ENG')
    assert len(out) <= len(query)
    assert out.startswith('ab')


def test_invalid_translation_detection():
    t = NoneTranslator()
    assert t._is_translation_invalid('a real query here', '')
    assert t._is_translation_invalid('many different symbols', 'aaaaaaaaaaaa')
    assert not t._is_translation_invalid('query', 'normal translation')


def test_lang_skip_same_language():
    out = asyncio.run(OriginalTranslator().translate('ENG', 'ENG', ['x']))
    assert out == ['x']


def test_punctuation_only_queries_passthrough():
    class Fail(CommonTranslator):
        async def _translate(self, *a):
            raise AssertionError('should not be called')
    out = asyncio.run(Fail().translate('JPN', 'ENG', ['...', '!!']))
    assert out == ['...', '!!']
