"""The shipped examples/ files must stay loadable through the real config
surface (reference parity: /root/reference/examples/)."""
import json
import os
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
EXAMPLES = ROOT / 'examples'


def test_config_example_json_loads():
    from manga_image_translator_tpu.mode.local import load_config_file
    cfg = load_config_file(str(EXAMPLES / 'config-example.json'))
    assert cfg.detector.detection_size == 2048


def test_config_example_toml_loads():
    from manga_image_translator_tpu.mode.local import load_config_file
    cfg = load_config_file(str(EXAMPLES / 'config-example.toml'))
    assert cfg.inpainter.inpainting_size == 2048
    assert cfg.translator.target_lang == 'ENG'


def test_translator_chain_example_loads():
    from manga_image_translator_tpu.config import Config, TranslatorChain
    data = json.loads(
        (EXAMPLES / 'translator_chain_example.json').read_text())
    data.pop('_comment', None)
    cfg = Config(**data)
    chain = TranslatorChain(cfg.translator.translator_chain)
    assert len(chain.chain) == 2
    assert chain.langs == ['ENG', 'CHS']


def test_gpt_config_example_parses_and_applies(tmp_path):
    import yaml
    from manga_image_translator_tpu.config import TranslatorConfig
    from manga_image_translator_tpu.translators.chatgpt import \
        OpenAITranslator

    path = EXAMPLES / 'gpt_config-example.yaml'
    data = yaml.safe_load(path.read_text())
    assert '{to_lang}' in data['chat_system_template']

    tc = TranslatorConfig(gpt_config=str(path))
    tr = OpenAITranslator()

    class _Args:
        chatgpt_config = tc.chatgpt_config
    tr.parse_args(_Args())
    assert tr.temperature == data['temperature']
    assert tr.chat_system_template == data['chat_system_template']


def test_example_env_names_match_keys_module():
    """Every variable in Example.env must exist in translators/keys.py —
    a renamed key would silently stop being read."""
    from manga_image_translator_tpu.translators import keys
    for line in (EXAMPLES / 'Example.env').read_text().splitlines():
        line = line.strip()
        if not line or line.startswith('#') or '=' not in line:
            continue
        name = line.partition('=')[0].strip()
        assert hasattr(keys, name), f'{name} not read by keys.py'
