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


# -- glossary formats + fallback rotation (reference chatgpt.py:177-1110) ----

def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text, encoding='utf8')
    return str(p)


def test_glossary_detect_sakura(tmp_path):
    from manga_image_translator_tpu.translators import chatgpt as cg
    p = _write(tmp_path, 'g.txt',
               '// comment\nナルト->Naruto\nサスケ->Sasuke\n')
    assert cg.detect_glossary_type(p) == 'sakura'
    d = cg.load_sakura_glossary(p)
    assert d == {'ナルト': 'Naruto', 'サスケ': 'Sasuke'}


def test_glossary_detect_galtransl(tmp_path):
    from manga_image_translator_tpu.translators import chatgpt as cg
    p = _write(tmp_path, 'g.txt',
               '\\\\ header\nナルト\tNaruto\nサスケ    Sasuke\n')
    assert cg.detect_glossary_type(p) == 'galtransl'
    d = cg.load_galtransl_glossary(p)
    assert d == {'ナルト': 'Naruto', 'サスケ': 'Sasuke'}


def test_glossary_detect_mit(tmp_path):
    from manga_image_translator_tpu.translators import chatgpt as cg
    p = _write(tmp_path, 'g.txt',
               '# header\nナルト[くん]? Naruto  # honorific optional\n'
               'broken[ skipped\n')
    assert cg.detect_glossary_type(p) == 'mit'
    d = cg.load_mit_glossary(p)
    assert 'ナルト[くん]?' in d
    assert d['ナルト[くん]?'].startswith('Naruto')
    assert '# honorific optional' in d['ナルト[くん]?']
    assert len(d) == 1  # invalid regex line dropped


def test_glossary_relevant_terms_regex_and_substring(tmp_path):
    from manga_image_translator_tpu.translators import chatgpt as cg
    t = cg.OpenAITranslator.__new__(cg.OpenAITranslator)
    import logging
    t.logger = logging.getLogger('test')
    # MIT regex matching
    t.glossary_path = _write(tmp_path, 'mit.txt', 'ナルト[くん]? Naruto\n')
    t._glossary = None
    t._glossary_is_regex = False
    rel = t._relevant_glossary(['ナルトくんは'])
    assert list(rel.values()) == ['Naruto']
    assert t._relevant_glossary(['サスケ']) == {}
    # sakura substring matching
    t.glossary_path = _write(tmp_path, 'sak.txt', 'サスケ->Sasuke\n')
    t._glossary = None
    t._glossary_is_regex = False
    assert t._relevant_glossary(['サスケと']) == {'サスケ': 'Sasuke'}
    assert t._relevant_glossary(['ナルト']) == {}


def test_fallback_model_rotation(monkeypatch):
    """Primary model fails -> fallback model is tried (up to 3 requests)
    and its valid output is returned."""
    import asyncio
    from manga_image_translator_tpu.translators import chatgpt as cg
    import logging

    t = cg.OpenAITranslator.__new__(cg.OpenAITranslator)
    t.logger = logging.getLogger('test')
    t.api_key = 'k'
    t.model = 'primary'
    t.fallback_model = 'backup'
    t.chat_system_template = cg._CHAT_SYSTEM_TEMPLATE
    t.glossary_path = None
    t._glossary = {}
    t._glossary_is_regex = False
    t.prev_context = ''
    calls = []

    async def fake_request(messages, model=None):
        calls.append(model or t.model)
        if (model or t.model) == 'primary':
            raise RuntimeError('HTTP 500')
        if len(calls) < 3:
            return ''                      # first fallback reply unusable
        return '<|1|>Hello\n<|2|>World'

    monkeypatch.setattr(t, '_request', fake_request)
    out = asyncio.run(t._translate('JPN', 'ENG', ['こんにちは', '世界']))
    assert out == ['Hello', 'World']
    assert calls == ['primary', 'backup', 'backup']


def test_fallback_not_configured_raises(monkeypatch):
    import asyncio
    from manga_image_translator_tpu.translators import chatgpt as cg
    import logging

    t = cg.OpenAITranslator.__new__(cg.OpenAITranslator)
    t.logger = logging.getLogger('test')
    t.api_key = 'k'
    t.model = 'primary'
    t.fallback_model = None
    t.chat_system_template = cg._CHAT_SYSTEM_TEMPLATE
    t.glossary_path = None
    t._glossary = {}
    t._glossary_is_regex = False
    t.prev_context = ''

    async def fake_request(messages, model=None):
        raise RuntimeError('HTTP 500')

    monkeypatch.setattr(t, '_request', fake_request)
    import pytest
    with pytest.raises(RuntimeError):
        asyncio.run(t._translate('JPN', 'ENG', ['こんにちは']))


def test_chat_sample_injection(monkeypatch):
    """A configured chat_sample pair for the target language is injected
    as a user/assistant few-shot exchange after the system prompt."""
    import asyncio
    from manga_image_translator_tpu.translators import chatgpt as cg
    import logging

    t = cg.OpenAITranslator.__new__(cg.OpenAITranslator)
    t.logger = logging.getLogger('test')
    t.api_key = 'k'
    t.model = 'primary'
    t.fallback_model = None
    t.chat_system_template = cg._CHAT_SYSTEM_TEMPLATE
    t.glossary_path = None
    t._glossary = {}
    t._glossary_is_regex = False
    t.prev_context = ''
    t.chat_sample = {'English': ['<|1|>こんにちは', '<|1|>Hello']}
    seen = {}

    async def fake_request(messages, model=None):
        seen['messages'] = messages
        return '<|1|>Hi'

    monkeypatch.setattr(t, '_request', fake_request)
    out = asyncio.run(t._translate('JPN', 'ENG', ['こんにちは']))
    assert out == ['Hi']
    roles = [m['role'] for m in seen['messages']]
    assert roles == ['system', 'user', 'assistant', 'user']
    assert seen['messages'][1]['content'] == '<|1|>こんにちは'
    assert seen['messages'][2]['content'] == '<|1|>Hello'
