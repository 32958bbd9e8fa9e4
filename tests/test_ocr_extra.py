"""Tests for the CTC and 32px OCR backends (random weights)."""
import asyncio

import numpy as np
import pytest

import jax.numpy as jnp

DICT = 64


class TestCTCModel:
    def test_forward_shapes(self):
        from manga_image_translator_tpu.models import ocr48_ctc
        params = ocr48_ctc.init_params(DICT)
        x = jnp.zeros((2, 48, 128, 3))
        logprobs, colors = ocr48_ctc.ctc_forward(params, x)
        assert logprobs.shape[0] == 2
        assert logprobs.shape[2] == DICT
        assert colors.shape[2] == 6
        # log-softmax normalized
        s = np.exp(np.asarray(logprobs[0, 0])).sum()
        assert s == pytest.approx(1.0, abs=1e-3)

    def test_ctc_greedy_decode(self):
        from manga_image_translator_tpu.ocr.model_48px_ctc import Model48pxCTCOCR
        ocr = Model48pxCTCOCR.__new__(Model48pxCTCOCR)
        T, V = 6, 5
        logprobs = np.full((1, T, V), -10.0, np.float32)
        # sequence: blank, a, a, blank, b, b  -> "ab" after collapse
        path = [0, 2, 2, 0, 3, 3]
        for t, ch in enumerate(path):
            logprobs[0, t, ch] = -0.1
        colors = np.zeros((1, T, 6), np.float32)
        out = ocr._decode_ctc(logprobs, colors)
        assert [c[0] for c in out[0]] == [2, 3]

    def test_positional_encoding_matches_torch_formula(self):
        import math
        from manga_image_translator_tpu.models.ocr48_ctc import _sinusoidal_pe
        pe = _sinusoidal_pe(16, 320)
        assert pe[0, 0] == 0
        assert pe[1, 0] == pytest.approx(math.sin(1.0))
        assert pe[1, 1] == pytest.approx(math.cos(1.0))


class TestOCR32Model:
    def test_beam_decode_shapes(self):
        from manga_image_translator_tpu.models import ocr32
        params = ocr32.init_params(DICT)
        imgs = jnp.zeros((2, 32, 64, 3))
        ret = ocr32.beam_decode(params, imgs, jnp.asarray([40, 64]),
                                beams_k=2, max_len=8)
        assert ret['sequences'].shape == (2, 8)
        assert ret['probs'].shape == (2,)
        assert ret['colors'].shape == (2, 8, 6)
        assert float(np.max(np.asarray(ret['colors']))) <= 1.0


@pytest.mark.parametrize('key', ['48px_ctc', '32px'])
def test_ocr_dispatch_smoke(key):
    from manga_image_translator_tpu.config import Ocr
    from manga_image_translator_tpu.ocr import dispatch
    from manga_image_translator_tpu.utils.geometry import Quadrilateral

    img = np.random.randint(0, 255, (150, 250, 3), dtype=np.uint8)
    quads = [Quadrilateral(np.array([[20, 20], [150, 20], [150, 50],
                                     [20, 50]]), '', 1.0)]
    result = asyncio.run(dispatch(Ocr(key), img, quads, device='cpu'))
    assert isinstance(result, list)


def test_infer_memory_split_matches_monolithic(monkeypatch):
    """The grouped backbone path (_infer with MEM_GROUP_CHUNKS=2) must
    produce the same texts/probs as the monolithic per-chunk decode
    (MIT_TPU_OCR_SPLIT_MEMORY=0). Chunk sizes are shrunk so the test
    builds 3 chunks (two grouped + one solo) on CPU cheaply."""
    from manga_image_translator_tpu.config import OcrConfig
    from manga_image_translator_tpu.models import ocr48
    from manga_image_translator_tpu.ocr import model_48px as mod
    from manga_image_translator_tpu.utils.geometry import Quadrilateral

    monkeypatch.setenv('MIT_TPU_MESH', '0')
    monkeypatch.setattr(mod, 'MAX_CHUNK', 2)
    monkeypatch.setattr(mod, 'BIG_CHUNK', 3)
    monkeypatch.setattr(mod, 'MAX_SEQ_LEN', 10)
    monkeypatch.setattr(mod, 'FAST_SEQ_LEN', 6)

    m = mod.Model48pxOCR.__new__(mod.Model48pxOCR)
    import logging
    m.logger = logging.getLogger('test')
    m.params = ocr48.fuse_qkv_params(ocr48.init_params(64))
    m.dictionary = (['<PAD>', '<S>', '</S>', '<SP>']
                    + [chr(97 + i) for i in range(60)])

    rs = np.random.RandomState(11)
    img = rs.randint(0, 255, (400, 500, 3), np.uint8)
    quads = []
    for i in range(7):
        y = 10 + i * 50
        quads.append(Quadrilateral(
            np.array([[20, y], [200 + 10 * i, y], [200 + 10 * i, y + 30],
                      [20, y + 30]]), '', 1.0))

    def run():
        qs = [Quadrilateral(q.pts.copy(), '', 1.0) for q in quads]
        out = asyncio.run(m._infer(img, qs, OcrConfig(prob=0.0)))
        return [(r.text, round(float(r.prob), 5)) for r in out]

    monkeypatch.setenv('MIT_TPU_OCR_SPLIT_MEMORY', '0')
    ref = run()
    monkeypatch.setenv('MIT_TPU_OCR_SPLIT_MEMORY', '1')
    got = run()
    assert got == ref
    assert len(ref) > 0


class TestTwoTierDecode:
    """_two_tier_decode merges full-length re-decodes into the fast pass."""

    def _model(self):
        from manga_image_translator_tpu.ocr.model_48px import Model48pxOCR
        m = Model48pxOCR.__new__(Model48pxOCR)
        m.params = {}
        import logging
        m.logger = logging.getLogger('test')
        return m

    def test_all_finished_returns_fast(self, monkeypatch):
        from manga_image_translator_tpu.ocr import model_48px as mod
        from manga_image_translator_tpu.models import ocr48
        calls = []

        def fake_beam(params, images, widths, beams_k, max_len, **kw):
            calls.append(max_len)
            seqs = np.full((2, max_len), ocr48.END_TOK)
            return {'sequences': seqs, 'probs': np.ones((2,)),
                    'fg': np.zeros((2, max_len, 3)),
                    'bg': np.zeros((2, max_len, 3)),
                    'fg_ind': np.zeros((2, max_len, 2)),
                    'bg_ind': np.zeros((2, max_len, 2))}

        monkeypatch.setenv('MIT_TPU_MESH', '0')
        monkeypatch.setattr(ocr48, 'beam_decode', fake_beam)
        monkeypatch.setattr(mod, 'MAX_SEQ_LEN', 255)
        monkeypatch.setattr(mod, 'FAST_SEQ_LEN', 8)
        m = self._model()
        ret = m._two_tier_decode(np.zeros((2, 48, 64, 3)),
                                 np.array([64, 64]))
        assert calls == [8]
        assert np.asarray(ret['sequences']).shape[1] == 8

    def test_unfinished_rows_take_full_decode(self, monkeypatch):
        from manga_image_translator_tpu.ocr import model_48px as mod
        from manga_image_translator_tpu.models import ocr48
        calls = []

        def fake_beam(params, images, widths, beams_k, max_len, **kw):
            calls.append(max_len)
            n = 2
            seqs = np.full((n, max_len), 7)       # no END anywhere
            if max_len == 8:
                seqs[0, 3] = ocr48.END_TOK        # row 0 finishes fast
            else:
                seqs[:, 20] = ocr48.END_TOK
            # jnp arrays: np.asarray() views of device buffers are
            # READ-ONLY — the merge must copy (measured crash on v5e)
            import jax.numpy as jnp
            return {'sequences': jnp.asarray(seqs),
                    'probs': jnp.full((n,), 0.5 if max_len == 8 else 0.9),
                    'fg': jnp.full((n, max_len, 3), float(max_len)),
                    'bg': jnp.zeros((n, max_len, 3)),
                    'fg_ind': jnp.zeros((n, max_len, 2)),
                    'bg_ind': jnp.zeros((n, max_len, 2))}

        monkeypatch.setenv('MIT_TPU_MESH', '0')
        monkeypatch.setattr(ocr48, 'beam_decode', fake_beam)
        monkeypatch.setattr(mod, 'MAX_SEQ_LEN', 255)
        monkeypatch.setattr(mod, 'FAST_SEQ_LEN', 8)
        m = self._model()
        ret = m._two_tier_decode(np.zeros((2, 48, 64, 3)),
                                 np.array([64, 64]))
        assert calls == [8, 255]
        seqs = np.asarray(ret['sequences'])
        assert seqs.shape == (2, 255)
        # row 0 keeps the fast result (padded with END)
        assert seqs[0, 3] == ocr48.END_TOK and seqs[0, 10] == ocr48.END_TOK
        # row 1 replaced by the full decode
        assert seqs[1, 20] == ocr48.END_TOK and seqs[1, 0] == 7
        assert float(ret['probs'][0]) == 0.5
        assert abs(float(ret['probs'][1]) - 0.9) < 1e-6
        assert float(np.asarray(ret['fg'])[0, 0, 0]) == 8
        assert float(np.asarray(ret['fg'])[1, 0, 0]) == 255

    def test_long_tier_compacts_into_small_bucket(self, monkeypatch):
        """A 32-crop chunk with ≤16 unfinished rows re-decodes ONLY those
        rows, compacted into the MAX_CHUNK=16 bucket (pad rows width 0)."""
        from manga_image_translator_tpu.ocr import model_48px as mod
        from manga_image_translator_tpu.models import ocr48
        calls = []

        def fake_beam(params, images, widths, beams_k, max_len, **kw):
            n = np.asarray(images).shape[0]
            calls.append((max_len, n))
            seqs = np.full((n, max_len), 7)
            if max_len == 8:
                seqs[:, 3] = ocr48.END_TOK
                seqs[5, 3] = 7                    # rows 5, 9 never finish
                seqs[9, 3] = 7
            else:
                # the sub-chunk: row payload = its source width so the
                # merge can be checked; pad rows must have width 0
                assert n == 16
                w = np.asarray(widths)
                assert list(w[:2]) != [0, 0] and (w[2:] == 0).all()
                seqs[:, 30] = ocr48.END_TOK
            import jax.numpy as jnp
            return {'sequences': jnp.asarray(seqs),
                    'probs': jnp.asarray(np.asarray(widths)[:n],
                                         jnp.float32),
                    'fg': jnp.zeros((n, max_len, 3)),
                    'bg': jnp.zeros((n, max_len, 3)),
                    'fg_ind': jnp.zeros((n, max_len, 2)),
                    'bg_ind': jnp.zeros((n, max_len, 2))}

        monkeypatch.setenv('MIT_TPU_MESH', '0')
        monkeypatch.setattr(ocr48, 'beam_decode', fake_beam)
        monkeypatch.setattr(mod, 'MAX_SEQ_LEN', 255)
        monkeypatch.setattr(mod, 'FAST_SEQ_LEN', 8)
        m = self._model()
        widths = np.arange(1, 33, dtype=np.int32) * 8
        ret = m._two_tier_decode(np.zeros((32, 48, 64, 3)), widths)
        assert calls == [(8, 32), (255, 16)]
        seqs = np.asarray(ret['sequences'])
        assert seqs.shape == (32, 255)
        # finished rows keep the fast result
        assert seqs[0, 3] == ocr48.END_TOK
        # unfinished rows 5 and 9 got the long decode, mapped back by row
        assert seqs[5, 30] == ocr48.END_TOK and seqs[5, 3] == 7
        assert seqs[9, 30] == ocr48.END_TOK
        # probs echo the widths the long pass saw: source rows, in order
        assert float(ret['probs'][5]) == widths[5]
        assert float(ret['probs'][9]) == widths[9]


def test_infer_pooled_matches_per_page(monkeypatch):
    """Pooled cross-page OCR (infer_pooled) must produce the same texts and
    probs as per-page _infer (host crops, padded widths are masked so
    chunk/bucket regrouping cannot change results)."""
    from manga_image_translator_tpu.config import OcrConfig
    from manga_image_translator_tpu.models import ocr48
    from manga_image_translator_tpu.ocr import model_48px as mod
    from manga_image_translator_tpu.utils.geometry import Quadrilateral

    monkeypatch.setenv('MIT_TPU_MESH', '0')
    monkeypatch.setenv('MIT_TPU_DEVICE_CROPS', '0')
    monkeypatch.setattr(mod, 'MAX_CHUNK', 3)
    monkeypatch.setattr(mod, 'BIG_CHUNK', 4)
    monkeypatch.setattr(mod, 'MAX_SEQ_LEN', 8)
    monkeypatch.setattr(mod, 'FAST_SEQ_LEN', 8)

    m = mod.Model48pxOCR.__new__(mod.Model48pxOCR)
    import logging
    m.logger = logging.getLogger('test')
    m.params = ocr48.fuse_qkv_params(ocr48.init_params(64))
    m.dictionary = (['<PAD>', '<S>', '</S>', '<SP>']
                    + [chr(97 + i) for i in range(60)])

    rs = np.random.RandomState(13)
    pages, tls = [], []
    for p in range(2):
        img = rs.randint(0, 255, (300, 400, 3), np.uint8)
        quads = [Quadrilateral(np.array(
            [[20, 10 + i * 60], [180 + 15 * i, 10 + i * 60],
             [180 + 15 * i, 40 + i * 60], [20, 40 + i * 60]]), '', 1.0)
            for i in range(3)]
        pages.append(img)
        tls.append(quads)

    def clone():
        return [[Quadrilateral(q.pts.copy(), '', 1.0) for q in page]
                for page in tls]

    ref_tls = clone()
    ref = []
    for img, quads in zip(pages, ref_tls):
        got = asyncio.run(m._infer(img, quads, OcrConfig(prob=0.0)))
        ref.append(sorted((r.text, round(float(r.prob), 5)) for r in got))

    pooled_tls = clone()
    pooled = asyncio.run(m.infer_pooled(pages, pooled_tls,
                                        OcrConfig(prob=0.0)))
    got = [sorted((r.text, round(float(r.prob), 5)) for r in page)
           for page in pooled]
    assert got == ref
    assert all(len(p) > 0 for p in got)
