"""48px OCR tests.

The key test validates the TPU beam decoder's K/V-cache math against an
oracle that replicates the reference's per-step full recomputation with the
exact XPOS centering (reference ocr/model_48px.py:473-504 next_token_batch +
xpos_relative_position.py) — proving the cached formulation is numerically
equivalent, including the cross-attention center mismatch it must reproduce.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_image_translator_tpu.models import ocr48
from manga_image_translator_tpu.models.functional import P, layer_norm, linear, relu

DICT = 64


@pytest.fixture(scope='module')
def params():
    return ocr48.init_params(DICT)


# ---------------------------------------------------------------------------
# Oracle: reference-style per-step recomputation with exact centering
# ---------------------------------------------------------------------------

def _oracle_xpos(x, offset, downscale):
    """Reference XPOS.forward (xpos_relative_position.py:44-72), numpy."""
    x = np.asarray(x, np.float64)  # (B, L, hd)
    length = x.shape[1]
    hd = ocr48.HEAD_DIM
    s = ((np.arange(0, hd, 2) + 0.4 * hd) / (1.4 * hd))
    min_pos = -(length + offset) // 2
    max_pos = length + offset + min_pos
    scale = s[None, :] ** (np.arange(min_pos, max_pos)[:, None]
                           / ocr48.XPOS_SCALE_BASE)
    seq_len, dim = scale.shape
    inv_freq = 1.0 / (10000 ** (np.arange(dim) / dim))
    sinusoid = np.arange(seq_len)[:, None] * inv_freq[None, :]
    sin, cos = np.sin(sinusoid), np.cos(sinusoid)
    if scale.shape[0] > length:
        scale, sin, cos = scale[-length:], sin[-length:], cos[-length:]
    if downscale:
        scale = 1 / scale
    sin2 = np.repeat(sin * scale, 2, axis=-1)
    cos2 = np.repeat(cos * scale, 2, axis=-1)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    rot = np.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos2 + rot * sin2


def _np_dense(params, key, x):
    w = np.asarray(params[key + '.weight'], np.float64)
    b = np.asarray(params[key + '.bias'], np.float64)
    return x @ w + b


def _np_ln(params, key, x):
    w = np.asarray(params[key + '.weight'], np.float64)
    b = np.asarray(params[key + '.bias'], np.float64)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * w + b


def _oracle_attention(params, scope, q_in, kv_in, q_offset, mask=None):
    """XposMultiheadAttention.forward with batch=1 (model_48px.py:327-395)."""
    H, hd = ocr48.N_HEADS, ocr48.HEAD_DIM
    q = _np_dense(params, scope + '.q_proj', q_in) * hd ** -0.5
    k = _np_dense(params, scope + '.k_proj', kv_in)
    v = _np_dense(params, scope + '.v_proj', kv_in)

    def split(x):
        b, l, e = x.shape
        return x.reshape(b, l, H, hd).transpose(0, 2, 1, 3).reshape(b * H, l, hd)

    q, k, v = split(q), split(k), split(v)
    k = _oracle_xpos(k, 0, True)
    q = _oracle_xpos(q, q_offset, False)
    scores = q @ k.transpose(0, 2, 1)
    if mask is not None:
        scores = np.where(mask[None, None, :], -np.inf, scores)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    attn = w @ v  # (H, Lq, hd)
    b_h, lq, _ = attn.shape
    attn = attn.reshape(1, H, lq, hd).transpose(0, 2, 1, 3).reshape(1, lq, H * hd)
    return _np_dense(params, scope + '.out_proj', attn)


def oracle_decode_steps(params, memory, memory_mask, tokens):
    """Run reference-style decode for the given token sequence; returns the
    final-layer output at every step. memory: (1, M, E) numpy."""
    np_params = {k: np.asarray(v) for k, v in params.items()}
    embd = np.asarray(params['embd.weight'], np.float64)
    caches = [np.zeros((1, 0, ocr48.EMBD_DIM))] * ocr48.N_DECODERS
    outputs = []
    for step, tok in enumerate(tokens):
        tgt = embd[tok][None, None, :]
        for l in range(ocr48.N_DECODERS):
            pre = f'decoders.{l}'
            combined = np.concatenate([caches[l], tgt], axis=1)
            caches[l] = combined
            tgt = tgt + _oracle_attention(
                np_params, pre + '.self_attn',
                _np_ln(np_params, pre + '.norm1', tgt),
                _np_ln(np_params, pre + '.norm1', combined), q_offset=step)
            tgt = tgt + _oracle_attention(
                np_params, pre + '.multihead_attn',
                _np_ln(np_params, pre + '.norm2', tgt), memory,
                q_offset=step, mask=memory_mask)
            h = _np_dense(np_params, pre + '.linear1',
                          _np_ln(np_params, pre + '.norm3', tgt))
            tgt = tgt + _np_dense(np_params, pre + '.linear2',
                                  np.maximum(h, 0))
        outputs.append(tgt[0, 0])
    return np.stack(outputs)


def test_cached_decode_matches_reference_recompute(params):
    rng = np.random.RandomState(0)
    M = 12
    memory = rng.randn(1, M, ocr48.EMBD_DIM).astype(np.float32) * 0.5
    memory_mask = np.zeros((M,), bool)
    memory_mask[9:] = True  # mask the padded tail
    tokens = [1, 5, 9, 3, 20, 7]

    ref_outs = oracle_decode_steps(params, memory.astype(np.float64),
                                   memory_mask, tokens)

    caches = ocr48.init_caches(params, jnp.asarray(memory), 1, 16)
    mem_mask = jnp.asarray(memory_mask)[None, :]
    got = []
    for step, tok in enumerate(tokens):
        out, caches = ocr48.decode_step(
            params, caches, jnp.asarray([tok]), jnp.int32(step), mem_mask)
        got.append(np.asarray(out[0]))
    got = np.stack(got)
    np.testing.assert_allclose(got, ref_outs, atol=2e-4, rtol=1e-3)


def test_encoder_matches_oracle(params):
    rng = np.random.RandomState(1)
    M = 10
    x = rng.randn(1, M, ocr48.EMBD_DIM).astype(np.float32) * 0.5
    mask = np.zeros((M,), bool)
    mask[8:] = True

    np_params = {k: np.asarray(v) for k, v in params.items()}
    ref = x.astype(np.float64)
    for i in range(ocr48.N_ENCODERS):
        pre = f'encoders.{i}'
        normed = _np_ln(np_params, pre + '.norm1', ref)
        ref = ref + _oracle_attention(np_params, pre + '.self_attn', normed,
                                      normed, q_offset=0, mask=mask)
        h = _np_dense(np_params, pre + '.linear1',
                      _np_ln(np_params, pre + '.norm2', ref))
        ref = ref + _np_dense(np_params, pre + '.linear2', np.maximum(h, 0))

    got = ocr48.encoder_forward(params, jnp.asarray(x),
                                jnp.asarray(mask)[None, :])
    np.testing.assert_allclose(np.asarray(got)[0], ref[0], atol=2e-4,
                               rtol=1e-3)


def test_backbone_shape(params):
    x = jnp.zeros((2, 48, 128, 3))
    feats = ocr48.convnext_features(P(params).scope('backbone'), x)
    assert feats.shape == (2, 32, 320)


def test_beam_decode_shapes(params):
    imgs = jnp.zeros((2, 48, 64, 3))
    ret = ocr48.beam_decode(params, imgs, jnp.asarray([40, 64]),
                            beams_k=2, max_len=8)
    assert ret['sequences'].shape == (2, 8)
    assert ret['probs'].shape == (2,)
    assert ret['fg'].shape == (2, 8, 3)
    assert ret['fg_ind'].shape == (2, 8, 2)
    assert np.all(np.asarray(ret['probs']) <= 1.0 + 1e-5)


def test_fold_bn_matches_unfolded(params):
    """fold_bn folds every backbone BatchNorm into its conv exactly (f32
    fold — differences are float re-association only), and the forward
    skips the removed BN ops."""
    rs = np.random.RandomState(3)
    # make BN stats non-trivial so the fold actually does something
    p2 = dict(params)
    for k in list(p2):
        if k.endswith('.running_mean'):
            p2[k] = jnp.asarray(rs.randn(*p2[k].shape).astype(np.float32)
                                * 0.1)
        elif k.endswith('.running_var'):
            p2[k] = jnp.asarray(
                1.0 + 0.5 * rs.rand(*p2[k].shape).astype(np.float32))
    x = jnp.asarray(rs.rand(2, 48, 64, 3).astype(np.float32) * 2 - 1)
    ref = ocr48.convnext_features(P(p2).scope('backbone'), x)
    folded = ocr48.fold_bn(p2)
    assert not any(k.endswith('.running_mean') and k.startswith('backbone')
                   for k in folded)
    got = ocr48.convnext_features(P(folded).scope('backbone'), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_memory_split_matches_monolithic(params):
    """compute_memory + beam_decode_from_memory == beam_decode, including
    when two chunks share one backbone forward and slice its memory (the
    backbone batch-amortization path)."""
    rs = np.random.RandomState(7)
    imgs = jnp.asarray(rs.rand(4, 48, 64, 3).astype(np.float32) * 2 - 1)
    widths = jnp.asarray([40, 64, 52, 36])
    ref = ocr48.beam_decode(params, imgs, widths, beams_k=2, max_len=8)
    mem, msk = ocr48.compute_memory(params, imgs, widths)
    for sl in (slice(None), slice(0, 2), slice(2, 4)):
        got = ocr48.beam_decode_from_memory(params, mem[sl], msk[sl],
                                            beams_k=2, max_len=8)
        np.testing.assert_array_equal(np.asarray(got['sequences']),
                                      np.asarray(ref['sequences'])[sl])
        np.testing.assert_allclose(np.asarray(got['probs']),
                                   np.asarray(ref['probs'])[sl],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got['fg']),
                                   np.asarray(ref['fg'])[sl],
                                   rtol=1e-4, atol=1e-5)


def test_ocr_pipeline_smoke():
    import asyncio
    from manga_image_translator_tpu.ocr import Ocr, dispatch
    from manga_image_translator_tpu.utils.geometry import Quadrilateral

    img = np.random.randint(0, 255, (200, 300, 3), dtype=np.uint8)
    quads = [Quadrilateral(np.array([[20, 20], [150, 20], [150, 50], [20, 50]]),
                           '', 1.0)]
    result = asyncio.run(dispatch(Ocr.ocr48px, img, quads, device='cpu'))
    assert isinstance(result, list)


def test_stacked_decode_matches_reference_step():
    """The fused stacked decode path (weight-side XPOS rotation, combined
    KV cache) must reproduce the reference-shaped decode_step exactly."""
    import jax
    import jax.numpy as jnp
    from manga_image_translator_tpu.models import ocr48

    params = ocr48.init_params(dict_size=64)
    rs = np.random.RandomState(5)
    n, m, S = 3, 12, 10
    memory = jnp.asarray(rs.randn(n, m, ocr48.EMBD_DIM).astype(np.float32))
    mask = jnp.zeros((n, m), bool)

    old = ocr48.init_caches(params, memory, n, S)
    sp = ocr48.stack_decoder_params(params)
    wtab = ocr48.xpos_weight_tables(S)
    new = ocr48.init_stacked_caches(params, memory, n, S)

    toks = rs.randint(3, 60, (4, n))
    for step, tok in enumerate(toks):
        tok = jnp.asarray(tok)
        out_old, old = ocr48.decode_step(params, old, tok,
                                         jnp.int32(step), mask)
        out_new, new = ocr48.decode_step_stacked(params, sp, new, tok,
                                                 jnp.int32(step), mask, wtab)
        np.testing.assert_allclose(np.asarray(out_old), np.asarray(out_new),
                                   rtol=2e-4, atol=2e-4)

    # char_topk == top_k(log_softmax)
    logp = ocr48.char_logprobs(params, out_new)
    v0, i0 = jax.lax.top_k(logp, 5)
    v1, i1 = ocr48.char_topk(params, out_new, 5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-5, atol=1e-5)


def test_deferred_colors_matches_eager(params, monkeypatch):
    """MIT_TPU_OCR_DEFER_COLORS (row_src parent-chain reconstruction after
    the loop) must be bit-identical to the legacy per-step color-cache
    gather — sequences, probs AND color rows."""
    rs = np.random.RandomState(11)
    imgs = jnp.asarray(rs.rand(3, 48, 64, 3).astype(np.float32) * 2 - 1)
    widths = jnp.asarray([40, 64, 52])

    rets = {}
    for mode in ('0', '1'):
        monkeypatch.setenv('MIT_TPU_OCR_DEFER_COLORS', mode)
        # bypass the module-level jit cache: env is read at trace time
        rets[mode] = ocr48.beam_decode.__wrapped__(
            params, imgs, widths, beams_k=3, max_len=10)
    for key in ('sequences', 'probs', 'fg', 'bg', 'fg_ind', 'bg_ind'):
        np.testing.assert_array_equal(np.asarray(rets['0'][key]),
                                      np.asarray(rets['1'][key]),
                                      err_msg=key)


def test_bf16_backbone_sequences_match_f32(params, monkeypatch):
    """MIT_TPU_OCR_BF16_BACKBONE (default on): the bf16-activation
    backbone/encoder must keep the decoded sequences of the f32 path on
    the seeded probe workload, and the memory drift must stay small
    relative to the f32 magnitudes (accumulation is f32 either way —
    only storage/elementwise precision changes)."""
    rs = np.random.RandomState(13)
    imgs = jnp.asarray(rs.rand(4, 48, 64, 3).astype(np.float32) * 2 - 1)
    widths = jnp.asarray([40, 64, 52, 36])

    mems, rets = {}, {}
    for mode in ('0', '1'):
        monkeypatch.setenv('MIT_TPU_OCR_BF16_BACKBONE', mode)
        mems[mode] = np.asarray(
            ocr48.compute_memory.__wrapped__(params, imgs, widths)[0]
            if hasattr(ocr48.compute_memory, '__wrapped__')
            else ocr48.compute_memory(params, imgs, widths)[0],
            np.float32)
        rets[mode] = ocr48.beam_decode.__wrapped__(
            params, imgs, widths, beams_k=3, max_len=10)
    scale = np.abs(mems['0']).mean()
    drift = np.abs(mems['0'] - mems['1']).max()
    assert drift < 0.15 * max(scale, 1e-3), (drift, scale)
    np.testing.assert_array_equal(np.asarray(rets['0']['sequences']),
                                  np.asarray(rets['1']['sequences']))
