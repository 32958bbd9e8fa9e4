"""ct2 model.bin parser + spm_lite + JAX transformer round trip.

Writes a synthetic CTranslate2 TransformerSpec model (binary v6) and a
synthetic unigram sentencepiece model, then drives the sugoi-style
translate path end-to-end without the native libraries.
"""
import json
import struct

import numpy as np
import pytest


def _wstr(s: str) -> bytes:
    raw = s.encode('utf-8') + b'\0'
    return struct.pack('<H', len(raw)) + raw


def build_ct2_model(path, d=32, heads=2, layers=2, vocab=23, ffn=64,
                    quantize_one=False):
    rs = np.random.RandomState(0)
    variables = {}

    def lin(prefix, i, o, bias=True):
        variables[f'{prefix}/weight'] = rs.randn(o, i).astype(
            np.float32) * 0.1
        if bias:
            variables[f'{prefix}/bias'] = rs.randn(o).astype(
                np.float32) * 0.01

    def ln(prefix):
        variables[f'{prefix}/gamma'] = np.ones(d, np.float32)
        variables[f'{prefix}/beta'] = np.zeros(d, np.float32)

    variables['encoder/embeddings/weight'] = rs.randn(vocab, d).astype(
        np.float32) * 0.1
    variables['decoder/embeddings/weight'] = rs.randn(vocab, d).astype(
        np.float32) * 0.1
    for i in range(layers):
        lin(f'encoder/layer_{i}/self_attention/linear_0', d, 3 * d)
        lin(f'encoder/layer_{i}/self_attention/linear_1', d, d)
        ln(f'encoder/layer_{i}/self_attention/layer_norm')
        lin(f'encoder/layer_{i}/ffn/linear_0', d, ffn)
        lin(f'encoder/layer_{i}/ffn/linear_1', ffn, d)
        ln(f'encoder/layer_{i}/ffn/layer_norm')
        lin(f'decoder/layer_{i}/self_attention/linear_0', d, 3 * d)
        lin(f'decoder/layer_{i}/self_attention/linear_1', d, d)
        ln(f'decoder/layer_{i}/self_attention/layer_norm')
        lin(f'decoder/layer_{i}/attention/linear_0', d, d)
        lin(f'decoder/layer_{i}/attention/linear_1', d, 2 * d)
        lin(f'decoder/layer_{i}/attention/linear_2', d, d)
        ln(f'decoder/layer_{i}/attention/layer_norm')
        lin(f'decoder/layer_{i}/ffn/linear_0', d, ffn)
        lin(f'decoder/layer_{i}/ffn/linear_1', ffn, d)
        ln(f'decoder/layer_{i}/ffn/layer_norm')
    lin('decoder/projection', d, vocab)

    blob = struct.pack('<I', 6)
    blob += _wstr('TransformerSpec')
    blob += struct.pack('<I', 7)
    extra_scale = 1 if quantize_one else 0
    blob += struct.pack('<I', len(variables) + extra_scale)
    for name, arr in variables.items():
        if quantize_one and name == 'decoder/projection/weight':
            # ct2 convention: scale = 127/amax, q = round(w*scale),
            # dequant = q / scale
            scale = 127.0 / np.maximum(np.abs(arr).max(axis=1), 1e-9)
            q = np.clip(np.round(arr * scale[:, None]), -127,
                        127).astype(np.int8)
            blob += _wstr(name) + struct.pack('<B', q.ndim)
            blob += struct.pack(f'<{q.ndim}I', *q.shape)
            blob += _wstr('int8') + struct.pack('<I', q.nbytes)
            blob += q.tobytes()
            blob += _wstr(name + '_scale') + struct.pack('<B', 1)
            blob += struct.pack('<I', scale.shape[0])
            blob += _wstr('float32')
            s32 = scale.astype(np.float32)
            blob += struct.pack('<I', s32.nbytes) + s32.tobytes()
            continue
        blob += _wstr(name) + struct.pack('<B', arr.ndim)
        blob += struct.pack(f'<{arr.ndim}I', *arr.shape)
        blob += _wstr('float32') + struct.pack('<I', arr.nbytes)
        blob += arr.tobytes()
    blob += struct.pack('<I', 0)    # aliases
    (path / 'model.bin').write_bytes(blob)
    pieces = (['<unk>', '<s>', '</s>']
              + [f'▁w{i}' for i in range(vocab - 3)])
    (path / 'shared_vocabulary.json').write_text(json.dumps(pieces))
    (path / 'config.json').write_text(json.dumps({'num_heads': heads}))
    return variables


def build_spm_model(path, words):
    """Minimal unigram sentencepiece .model protobuf."""
    def varint(v):
        out = b''
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def field(num, wire, payload):
        return varint((num << 3) | wire) + payload

    def ld(num, data):
        return field(num, 2, varint(len(data)) + data)

    def piece(text, score, typ):
        body = ld(1, text.encode('utf-8'))
        body += field(2, 5, struct.pack('<f', score))
        body += field(3, 0, varint(typ))
        return ld(1, body)

    blob = piece('<unk>', 0.0, 2) + piece('<s>', 0.0, 3) \
        + piece('</s>', 0.0, 3)
    for i, w in enumerate(words):
        blob += piece('▁' + w, -float(i + 1) * 0.1, 1)
    # single chars as fallback pieces
    seen = set()
    for w in words:
        for ch in w:
            if ch not in seen:
                seen.add(ch)
                blob += piece(ch, -20.0, 1)
    blob += piece('▁', -15.0, 1)
    path.write_bytes(blob)


def test_spm_roundtrip(tmp_path):
    from manga_image_translator_tpu.utils.spm_lite import SentencePieceModel
    p = tmp_path / 'spm.model'
    build_spm_model(p, ['hello', 'world', 'test'])
    sp = SentencePieceModel.load(str(p))
    toks = sp.encode('hello world', out_type=str)
    assert toks == ['▁hello', '▁world']
    assert sp.decode(toks) == 'hello world'
    # unseen words decompose into known chars
    toks2 = sp.encode('held', out_type=str)
    assert ''.join(toks2).replace('▁', '') == 'held'


def test_ct2_reader_and_decode(tmp_path):
    from manga_image_translator_tpu.translators.ct2_model import (
        Ct2Transformer, load_vocabulary, read_config, read_ct2_model)
    variables_ref = build_ct2_model(tmp_path)
    variables = read_ct2_model(str(tmp_path / 'model.bin'))
    assert set(variables) == set(variables_ref)
    for k in variables_ref:
        np.testing.assert_allclose(variables[k], variables_ref[k])
    src, tgt = load_vocabulary(str(tmp_path))
    assert tgt is None and len(src) == 23
    model = Ct2Transformer(variables, read_config(str(tmp_path)), src, tgt)
    assert model.n_enc == 2 and model.n_dec == 2 and model.num_heads == 2
    out = model.translate_batch([['▁w0', '▁w1'], ['▁w2']],
                                max_len=8)
    assert len(out) == 2
    for toks in out:
        assert all(t in src for t in toks)


def test_ct2_int8_dequant(tmp_path):
    from manga_image_translator_tpu.translators.ct2_model import \
        read_ct2_model
    ref = build_ct2_model(tmp_path, quantize_one=True)
    variables = read_ct2_model(str(tmp_path / 'model.bin'))
    w = variables['decoder/projection/weight']
    assert w.dtype == np.float32
    # dequantized within int8 quantization error
    err = np.abs(w - ref['decoder/projection/weight']).max()
    assert err < np.abs(ref['decoder/projection/weight']).max() / 100


def test_beam_target_prefix_and_start_token(tmp_path):
    """target_prefix forces the first emitted token (m2m100 contract) and
    config decoder_start_token overrides the decode start."""
    from manga_image_translator_tpu.translators.ct2_model import (
        Ct2Transformer, load_vocabulary, read_config, read_ct2_model)
    build_ct2_model(tmp_path)
    (tmp_path / 'config.json').write_text(json.dumps(
        {'num_heads': 2, 'decoder_start_token': '</s>'}))
    variables = read_ct2_model(str(tmp_path / 'model.bin'))
    src, tgt = load_vocabulary(str(tmp_path))
    model = Ct2Transformer(variables, read_config(str(tmp_path)), src, tgt)
    assert model.start_id == model.eos_id    # '</s>' convention honored
    out = model.translate_batch([['▁w0', '▁w1'], ['▁w2', '▁w3']],
                                beam_size=3, max_len=8,
                                target_prefix=[['▁w7'], ['▁w9']])
    assert out[0][0] == '▁w7'
    assert out[1][0] == '▁w9'


def test_beam_sizes_agree_on_greedy_path(tmp_path):
    """beam_size=1 reduces to greedy; larger beams return >= scoring
    hypotheses (here: just must run and produce valid tokens)."""
    from manga_image_translator_tpu.translators.ct2_model import (
        Ct2Transformer, load_vocabulary, read_config, read_ct2_model)
    build_ct2_model(tmp_path)
    variables = read_ct2_model(str(tmp_path / 'model.bin'))
    src, tgt = load_vocabulary(str(tmp_path))
    model = Ct2Transformer(variables, read_config(str(tmp_path)), src, tgt)
    g = model.translate_batch([['▁w0', '▁w1']], beam_size=1, max_len=8)
    b5 = model.translate_batch([['▁w0', '▁w1']], beam_size=5, max_len=8)
    assert len(g) == 1 and len(b5) == 1
    for toks in g + b5:
        assert all(t in src for t in toks)


def _make_zip(path, entries):
    import zipfile
    with zipfile.ZipFile(path, 'w') as zf:
        for name, payload in entries.items():
            zf.writestr(name, payload)


def test_archive_mappings_resolve_real_zip_layouts(tmp_path, monkeypatch):
    """The sugoi/jparacrawl/m2m100 archive dicts must name members that
    exist in the released zip layouts (root-level spm.*.nopretok.model +
    ct2 model dirs — reference sugoi.py:18-29,134-145,155-166,
    m2m100.py:46-52) and extraction must produce the directory layout
    _load_pair reads (ADVICE r2 high #1)."""
    from manga_image_translator_tpu.translators import ct2_offline
    from manga_image_translator_tpu.utils import inference
    monkeypatch.setattr(inference, 'MODULE_DIR', tmp_path)

    layouts = {
        ct2_offline.JparacrawlTranslator: {
            'spm.ja.nopretok.model': b'ja', 'spm.en.nopretok.model': b'en',
            'base-ja-en/model.bin': b'm', 'base-ja-en/config.json': b'{}',
            'base-ja-en/shared_vocabulary.txt': b'v',
            'base-en-ja/model.bin': b'm', 'base-en-ja/config.json': b'{}',
            'base-en-ja/shared_vocabulary.txt': b'v',
        },
        ct2_offline.JparacrawlBigTranslator: {
            'spm.ja.nopretok.model': b'ja', 'spm.en.nopretok.model': b'en',
            'big-ja-en/model.bin': b'm', 'big-en-ja/model.bin': b'm',
        },
        ct2_offline.M2M100Translator: {
            'm2m100_418m/model.bin': b'm',
            'm2m100_418m/sentencepiece.model': b's',
            'm2m100_418m/shared_vocabulary.txt': b'v',
        },
    }
    for cls, zip_entries in layouts.items():
        t = cls()
        t.model_dir.mkdir(parents=True, exist_ok=True)
        for key, mapping in cls._MODEL_MAPPING.items():
            if key == 'model-sugoi':
                continue
            zp = t.model_dir / 'dl.zip'
            _make_zip(zp, zip_entries)
            t._extract_archive(zp, mapping['archive'])
            assert t.is_downloaded(), cls.__name__

    # the produced layout matches what _load_pair opens
    jp = ct2_offline.JparacrawlTranslator()
    assert jp._get_file_path('jparacrawl/spm.ja.nopretok.model').is_file()
    assert jp._get_file_path('jparacrawl/base-ja-en/model.bin').is_file()
    m2m = ct2_offline.M2M100Translator()
    assert (m2m._get_file_path(m2m._CT2_MODEL_DIR) /
            'sentencepiece.model').is_file()

    # sugoi key: both its zips
    sg = ct2_offline.SugoiTranslator()
    zp = sg.model_dir / 'dl.zip'
    _make_zip(zp, {'spm.ja.nopretok.model': b'j',
                   'spm.en.nopretok.model': b'e',
                   'big-ja-en/model.bin': b'm'})
    sg._extract_archive(zp, sg._MODEL_MAPPING['model-sugoi']['archive'])
    assert sg._get_file_path('sugoi/spm.ja.nopretok.model').is_file()
    assert sg._get_file_path('sugoi/big-ja-en/model.bin').is_file()

    # missing members are a HARD error, not a silent skip
    from manga_image_translator_tpu.utils.inference import ModelDownloadError
    _make_zip(zp, {'unrelated.txt': b'x'})
    with pytest.raises(ModelDownloadError):
        sg._extract_archive(zp, sg._MODEL_MAPPING['model-sugoi']['archive'])


def test_sugoi_sentence_chunking():
    from manga_image_translator_tpu.translators.ct2_offline import \
        SugoiTranslator
    t = SugoiTranslator.__new__(SugoiTranslator)
    t.query_split_sizes = []
    t.sp = {}

    class FakeSp:
        def encode(self, q, out_type=str):
            return q.split()

        def decode(self, toks):
            return ' '.join(toks)

    t.sp['ja'] = FakeSp()
    t.sp['en'] = FakeSp()
    toks = t.tokenize(['foo. bar! baz. qux.'], 'ja')
    assert t.query_split_sizes == [len(toks)]
    out = t.detokenize(toks, 'en')
    assert len(out) == 1
    assert '@' not in out[0]
