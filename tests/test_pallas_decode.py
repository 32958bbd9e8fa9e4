"""Fused Pallas decoder step vs the reference-shaped decode_step
(interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_image_translator_tpu.models import ocr48
from manga_image_translator_tpu.ops import pallas_decode as pd


@pytest.mark.parametrize('M', [16, 48])
def test_pallas_decode_matches_reference(M):
    """M=16 exercises the legacy CH-row cross chunks; M=48 (a CHX
    multiple) exercises the wide chx-row cross-chunk path."""
    n, S = 8, 32
    params = ocr48.init_params(dict_size=64)
    rs = np.random.RandomState(3)
    memory = jnp.asarray(rs.randn(n, M, ocr48.EMBD_DIM)
                         .astype(np.float32) * 0.5)
    memory_mask = jnp.asarray(
        np.arange(M)[None, :] >= np.array([M - 2] * n)[:, None])

    # reference path
    ref_caches = ocr48.init_caches(params, memory, n, S)
    xpos_tables = ocr48.xpos_step_tables(S)

    # pallas path
    weights = pd.prepare_decode_weights(params)
    rots = pd.prepare_rots(xpos_tables, ocr48.N_HEADS)
    self_k = jnp.zeros((pd.L, S, n, pd.EP), jnp.bfloat16)
    self_v = jnp.zeros((pd.L, S, n, pd.EP), jnp.bfloat16)
    mem_k, mem_v = pd.prepare_mem(ref_caches.mem_k, ref_caches.mem_v,
                                  memory_mask)

    toks = rs.randint(3, 60, (3, n))
    caches = ref_caches
    embd = params['embd.weight']
    for step, tok in enumerate(toks):
        tok = jnp.asarray(tok)
        out_ref, caches = ocr48.decode_step(params, caches, tok,
                                            jnp.int32(step), memory_mask,
                                            xpos_tables)
        tgt = pd.pad_e(embd[tok].astype(jnp.bfloat16))
        vp = -(-params['embd.weight'].shape[0] // 128) * 128
        out_pal, k_new, v_new, logits, _, _ = pd.decode_step_pallas(
            jnp.int32(step), tgt, rots[step], weights, self_k, self_v,
            mem_k, mem_v, n=n, s_len=S, m_len=M, vp=vp, interpret=True)
        self_k = jax.lax.dynamic_update_slice(
            self_k, k_new[:, None], (0, step, 0, 0))
        self_v = jax.lax.dynamic_update_slice(
            self_v, v_new[:, None], (0, step, 0, 0))
        err = float(jnp.max(jnp.abs(
            out_ref.astype(jnp.float32)
            - out_pal[:, :pd.E].astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(out_ref.astype(jnp.float32)))) + 1e-6
        assert err / scale < 0.05, f'step {step}: rel err {err/scale}'
        # pad lanes must stay zero (downstream masked-LN relies on it)
        assert float(jnp.max(jnp.abs(
            out_pal[:, pd.E:].astype(jnp.float32)))) == 0.0
        # in-kernel char-head logits match the XLA char head closely
        ref_lp = ocr48.char_logprobs(params, out_ref)
        pal_lp = jax.nn.log_softmax(logits, axis=-1)[:, :ref_lp.shape[1]]
        assert float(jnp.max(jnp.abs(ref_lp - pal_lp))) < 0.05
        # vocab pad entries can never win top-k
        assert float(jnp.max(logits[:, ref_lp.shape[1]:])) < -1e8


def test_char_topk_fused_matches_xla():
    """ops/pallas_charhead.char_topk_fused (interpret) vs the XLA
    char_topk: same top-k indices and logprobs on random weights."""
    from manga_image_translator_tpu.ops.pallas_charhead import (
        char_topk_fused, prepare_charhead)
    params = ocr48.init_params(dict_size=300)
    rs = np.random.RandomState(11)
    nk, e, ep = 16, ocr48.EMBD_DIM, 384
    dec = rs.randn(nk, ep).astype(np.float32) * 0.5
    dec[:, e:] = 0.0
    dec_b = jnp.asarray(dec, jnp.bfloat16)

    ref_v, ref_i = ocr48.char_topk(params, dec_b[:, :e], 5,
                                   params['embd.weight'].T)
    w1p, b1p, wvp, bvp = prepare_charhead(params, ep=ep)
    got_v, got_i = char_topk_fused(dec_b, w1p, b1p, wvp, bvp, k=5,
                                   interpret=True)
    assert np.array_equal(np.asarray(ref_i), np.asarray(got_i)), (
        ref_i, got_i)
    np.testing.assert_allclose(np.asarray(ref_v), np.asarray(got_v),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize('fused_gather', ['0', '1'])
@pytest.mark.parametrize('mode', ['xla-head', 'in-kernel-head',
                                  'fused-topk'])
def test_beam_decode_pallas_harness_matches_xla(monkeypatch, mode,
                                                fused_gather):
    """Full beam_decode through the Pallas harness (interpret) must yield
    the same sequences/probs as the XLA decode path on a tiny model —
    with the char head in XLA, fused into the decode kernel, and as the
    separate fused top-k launch; with the beam cache gather in XLA and
    fused into the kernel (in-place permute + write-back)."""
    monkeypatch.setenv('MIT_TPU_OCR_KERNEL_CHARHEAD',
                       '1' if mode == 'in-kernel-head' else '0')
    monkeypatch.setenv('MIT_TPU_OCR_KERNEL_TOPK',
                       '1' if mode == 'fused-topk' else '0')
    monkeypatch.setenv('MIT_TPU_OCR_FUSED_GATHER', fused_gather)
    n = 2
    params = ocr48.init_params(dict_size=48)
    rs = np.random.RandomState(7)
    images = jnp.asarray(rs.rand(n, 48, 32, 3).astype(np.float32) * 2 - 1)
    widths = jnp.asarray([32, 20], np.int32)

    monkeypatch.setenv('MIT_TPU_OCR_PALLAS', '0')
    ref = ocr48.beam_decode(params, images, widths, beams_k=2, max_len=12)
    ocr48.beam_decode._clear_cache()

    monkeypatch.setenv('MIT_TPU_OCR_PALLAS', 'interpret')
    pal = ocr48.beam_decode(params, images, widths, beams_k=2, max_len=12)
    ocr48.beam_decode._clear_cache()

    assert np.array_equal(np.asarray(ref['sequences']),
                          np.asarray(pal['sequences'])), (
        ref['sequences'], pal['sequences'])
    np.testing.assert_allclose(np.asarray(ref['probs']),
                               np.asarray(pal['probs']), rtol=2e-2,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(ref['fg']),
                               np.asarray(pal['fg']), rtol=5e-2,
                               atol=2e-2)
