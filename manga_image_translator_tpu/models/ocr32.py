"""32px seq2seq OCR — TPU-native.

Architecture contract (checkpoint ``ocr.ckpt`` in ocr.zip): reference
``ocr/model_32px.py`` — FAN ResNet [3,6,7,5] → 320-d tokens, sinusoidal PE,
3 post-LN transformer encoder layers + 2 post-LN decoder layers (torch
defaults: 4 heads, FF 2048, ReLU), weight-tied char head, six scalar color
heads.

Decode: K/V-cached ``lax.while_loop`` beam search (the reference caches
pre-layer activations and recomputes K/V per step — standard attention has
no length-dependent scaling, so caching projections is exact).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, linear, relu
from .ocr48_ctc import _sinusoidal_pe

EMBD_DIM = 320
N_HEADS = 4
HEAD_DIM = EMBD_DIM // N_HEADS
N_ENCODERS = 3
N_DECODERS = 2
FF_DIM = 2048
START_TOK, END_TOK, PAD_TOK = 1, 2, 0


def _split(x):
    n, l, _ = x.shape
    return x.reshape(n, l, N_HEADS, HEAD_DIM).transpose(0, 2, 1, 3)


def _merge(x):
    n, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(n, l, h * hd)


def _attn(q, k, v, key_mask=None, causal_limit=None):
    scores = jnp.einsum('nhqd,nhkd->nhqk', q, k,
                        preferred_element_type=jnp.float32)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], -jnp.inf, scores)
    if causal_limit is not None:
        idx = jnp.arange(k.shape[2])
        scores = jnp.where(idx[None, None, None, :] > causal_limit,
                           -jnp.inf, scores)
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum('nhqk,nhkd->nhqd', w, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _mha(p: P, q_in, k_in, v_in, key_mask=None):
    w = p['in_proj_weight']
    b = p['in_proj_bias']
    e = EMBD_DIM
    q = _split(linear(q_in, w[:, :e], b[:e]) * (HEAD_DIM ** -0.5))
    k = _split(linear(k_in, w[:, e:2 * e], b[e:2 * e]))
    v = _split(linear(v_in, w[:, 2 * e:], b[2 * e:]))
    return p.dense('out_proj', _merge(_attn(q, k, v, key_mask)))


def _ff(p: P, x):
    return p.dense('linear2', relu(p.dense('linear1', x)))


def resnet_features(p: P, x: jax.Array) -> jax.Array:
    """(N, 32, W, 3) → (N, W', 320). Same FAN layout as the CTC model but
    [3,6,7,5] blocks and k2 tail convs."""
    from .ocr48_ctc import _basic_block
    from .functional import avg_pool2d

    def layer(scope, h, blocks):
        for i in range(blocks):
            h = _basic_block(scope.scope(str(i)), h)
        return h

    x = relu(p.bn('bn0_1', p.conv('conv0_1', x, padding=1)))
    x = p.conv('conv0_2', x, padding=1)
    x = avg_pool2d(x, 2, 2)
    x = layer(p.scope('layer1'), x, 3)
    x = p.conv('conv1', relu(p.bn('bn1', x)), padding=1)
    x = avg_pool2d(x, 2, 2)
    x = layer(p.scope('layer2'), x, 6)
    x = p.conv('conv2', relu(p.bn('bn2', x)), padding=1)
    x = avg_pool2d(x, 2, (2, 1), (0, 1))
    x = layer(p.scope('layer3'), x, 7)
    x = p.conv('conv3', relu(p.bn('bn3', x)), padding=1)
    x = layer(p.scope('layer4'), x, 5)
    x = relu(p.bn('bn4_1', x))
    w = p['conv4_1.weight']
    x = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 1), [(0, 0), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)
    x = relu(p.bn('bn4_2', x))
    x = p.conv('conv4_2', x)  # k2 p0: 2 rows -> 1
    x = p.bn('bn4_3', x)
    return x[:, 0, :, :]


def encoder_forward(params: Dict, memory: jax.Array,
                    key_mask: jax.Array) -> jax.Array:
    p = P(params)
    pe = jnp.asarray(_sinusoidal_pe(2048, EMBD_DIM))[:memory.shape[1]]
    x = memory + pe.astype(memory.dtype)
    for i in range(N_ENCODERS):
        lp = p.scope(f'encoders.layers.{i}')
        x = lp.ln('norm1', x + _mha(lp.scope('self_attn'), x, x, x,
                                    key_mask))
        x = lp.ln('norm2', x + _ff(lp, x))
    return x


class Caches(NamedTuple):
    self_k: jax.Array    # (L, N, H, S, hd)
    self_v: jax.Array
    mem_k: jax.Array     # (L, N, H, M, hd)
    mem_v: jax.Array
    out: jax.Array       # (N, S, E)


def init_caches(params: Dict, memory: jax.Array, n: int,
                max_len: int) -> Caches:
    p = P(params)
    e = EMBD_DIM
    mem_ks, mem_vs = [], []
    for l in range(N_DECODERS):
        lp = p.scope(f'decoders.layers.{l}.multihead_attn')
        w, b = lp['in_proj_weight'], lp['in_proj_bias']
        mem_ks.append(_split(linear(memory, w[:, e:2 * e], b[e:2 * e])))
        mem_vs.append(_split(linear(memory, w[:, 2 * e:], b[2 * e:])))
    dt = memory.dtype
    return Caches(
        jnp.zeros((N_DECODERS, n, N_HEADS, max_len, HEAD_DIM), dt),
        jnp.zeros((N_DECODERS, n, N_HEADS, max_len, HEAD_DIM), dt),
        jnp.stack(mem_ks), jnp.stack(mem_vs),
        jnp.zeros((n, max_len, EMBD_DIM), dt))


def decode_step(params: Dict, caches: Caches, token: jax.Array,
                step: jax.Array, memory_mask: jax.Array
                ) -> Tuple[jax.Array, Caches]:
    p = P(params)
    e = EMBD_DIM
    pe = jnp.asarray(_sinusoidal_pe(2048, EMBD_DIM))
    embd = p['embd.weight']
    tgt = (embd[token] + pe[step]).astype(caches.mem_k.dtype)[:, None, :]

    self_k, self_v = caches.self_k, caches.self_v
    for l in range(N_DECODERS):
        lp = p.scope(f'decoders.layers.{l}')
        ap = lp.scope('self_attn')
        w, b = ap['in_proj_weight'], ap['in_proj_bias']
        q = _split(linear(tgt, w[:, :e], b[:e]) * (HEAD_DIM ** -0.5))
        k_new = _split(linear(tgt, w[:, e:2 * e], b[e:2 * e]))
        v_new = _split(linear(tgt, w[:, 2 * e:], b[2 * e:]))
        self_k = jax.lax.dynamic_update_slice(self_k, k_new[None],
                                              (l, 0, 0, step, 0))
        self_v = jax.lax.dynamic_update_slice(self_v, v_new[None],
                                              (l, 0, 0, step, 0))
        attn = _attn(q, self_k[l], self_v[l], causal_limit=step)
        tgt = lp.ln('norm1', tgt + ap.dense('out_proj', _merge(attn)))

        cp = lp.scope('multihead_attn')
        w2, b2 = cp['in_proj_weight'], cp['in_proj_bias']
        q2 = _split(linear(tgt, w2[:, :e], b2[:e]) * (HEAD_DIM ** -0.5))
        attn2 = _attn(q2, caches.mem_k[l], caches.mem_v[l],
                      key_mask=memory_mask)
        tgt = lp.ln('norm2', tgt + cp.dense('out_proj', _merge(attn2)))
        tgt = lp.ln('norm3', tgt + _ff(lp, tgt))

    out = jax.lax.dynamic_update_slice(caches.out, tgt, (0, step, 0))
    return tgt[:, 0, :], Caches(self_k, self_v, caches.mem_k, caches.mem_v,
                                out)


def char_logprobs(params: Dict, decoded: jax.Array) -> jax.Array:
    p = P(params)
    h = relu(p.dense('pred1.0', decoded))
    logits = linear(h, p['embd.weight'].T.astype(h.dtype), p['pred.bias'])
    return jax.nn.log_softmax(logits.astype(jnp.float32), -1)


def color_predictions(params: Dict, decoded: jax.Array):
    p = P(params)
    feats = relu(p.dense('color_pred1.0', decoded))
    cols = [p.dense(f'{c}_pred', feats)[..., 0]
            for c in ('fg_r', 'fg_g', 'fg_b', 'bg_r', 'bg_g', 'bg_b')]
    return jnp.stack(cols, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=('beams_k', 'max_len',
                                    'max_finished_hypos'))
def beam_decode(params: Dict, images: jax.Array, valid_widths: jax.Array,
                beams_k: int = 5, max_len: int = 255,
                max_finished_hypos: int = 2):
    """Same fixed-shape beam search harness as models.ocr48.beam_decode,
    instantiated for the 32px decoder."""
    from . import ocr48

    n = images.shape[0]
    memory = resnet_features(P(params).scope('backbone.ConvNet'), images)
    mem_len = memory.shape[1]
    valid_feats = (valid_widths + 3) // 4 + 2
    memory_mask = (jnp.arange(mem_len)[None, :]
                   >= jnp.minimum(valid_feats, mem_len)[:, None])
    memory = encoder_forward(params, memory, memory_mask)

    harness = ocr48.BeamHarness(
        init_caches=lambda mem, nk, mask_b: init_caches(params, mem, nk,
                                                        max_len),
        decode_step=lambda caches, tok, step, mask: decode_step(
            params, caches, tok, step, mask),
        char_logprobs=lambda dec: char_logprobs(params, dec),
        cache_gather=lambda caches, idx: Caches(
            caches.self_k[:, idx], caches.self_v[:, idx],
            caches.mem_k, caches.mem_v,
            (caches.out if ocr48._defer_colors() else caches.out[idx])),
        cache_out=lambda caches: caches.out,
        embd_dim=EMBD_DIM)
    state = ocr48.run_beam(harness, memory, memory_mask, n, beams_k,
                           max_len, max_finished_hypos)
    colors = jnp.clip(color_predictions(params, state.best_colors), 0, 1)
    return {
        'sequences': state.best_seq[:, 1:],
        'probs': jnp.exp(state.best_logprob),
        'colors': colors,
    }


def init_params(dict_size: int, dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(37)
    params: Dict = {}

    def conv(key, kh, kw, ci, co, bias=False):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(kh, kw, ci, co).astype(np.float32)
            * np.sqrt(2.0 / (kh * kw * ci)), dtype)
        if bias:
            params[key + '.bias'] = jnp.zeros((co,), dtype)

    def bn(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)
        params[key + '.running_mean'] = jnp.zeros((c,), jnp.float32)
        params[key + '.running_var'] = jnp.ones((c,), jnp.float32)

    def dense(key, i, o):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(i, o).astype(np.float32) / np.sqrt(i), dtype)
        params[key + '.bias'] = jnp.zeros((o,), dtype)

    def ln(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)

    bb = 'backbone.ConvNet'
    conv(f'{bb}.conv0_1', 3, 3, 3, 40)
    bn(f'{bb}.bn0_1', 40)
    conv(f'{bb}.conv0_2', 3, 3, 40, 40)
    inplanes = 40
    for li, (blocks, planes) in enumerate(
            zip((3, 6, 7, 5), (80, 160, 320, 320)), start=1):
        for b in range(blocks):
            pre = f'{bb}.layer{li}.{b}'
            cin = inplanes if b == 0 else planes
            bn(f'{pre}.bn1', cin)
            conv(f'{pre}.conv1', 3, 3, cin, planes)
            bn(f'{pre}.bn2', planes)
            conv(f'{pre}.conv2', 3, 3, planes, planes)
            if b == 0 and inplanes != planes:
                bn(f'{pre}.downsample.0', inplanes)
                conv(f'{pre}.downsample.1', 1, 1, inplanes, planes)
        inplanes = planes
    bn(f'{bb}.bn1', 80)
    conv(f'{bb}.conv1', 3, 3, 80, 80)
    bn(f'{bb}.bn2', 160)
    conv(f'{bb}.conv2', 3, 3, 160, 160)
    bn(f'{bb}.bn3', 320)
    conv(f'{bb}.conv3', 3, 3, 320, 320)
    bn(f'{bb}.bn4_1', 320)
    conv(f'{bb}.conv4_1', 2, 2, 320, 320)
    bn(f'{bb}.bn4_2', 320)
    conv(f'{bb}.conv4_2', 2, 2, 320, 320)
    bn(f'{bb}.bn4_3', 320)

    for group, count in (('encoders', N_ENCODERS), ('decoders', N_DECODERS)):
        for i in range(count):
            pre = f'{group}.layers.{i}'
            attns = ['self_attn'] if group == 'encoders' else \
                ['self_attn', 'multihead_attn']
            for att in attns:
                params[f'{pre}.{att}.in_proj_weight'] = jnp.asarray(
                    rs.randn(EMBD_DIM, 3 * EMBD_DIM).astype(np.float32)
                    / np.sqrt(EMBD_DIM), dtype)
                params[f'{pre}.{att}.in_proj_bias'] = jnp.zeros(
                    (3 * EMBD_DIM,), dtype)
                dense(f'{pre}.{att}.out_proj', EMBD_DIM, EMBD_DIM)
            dense(f'{pre}.linear1', EMBD_DIM, FF_DIM)
            dense(f'{pre}.linear2', FF_DIM, EMBD_DIM)
            norms = ['norm1', 'norm2'] if group == 'encoders' else \
                ['norm1', 'norm2', 'norm3']
            for nrm in norms:
                ln(f'{pre}.{nrm}', EMBD_DIM)

    params['embd.weight'] = jnp.asarray(
        rs.randn(dict_size, EMBD_DIM).astype(np.float32) * 0.02, dtype)
    dense('pred1.0', EMBD_DIM, EMBD_DIM)
    params['pred.bias'] = jnp.zeros((dict_size,), dtype)
    dense('color_pred1.0', EMBD_DIM, 64)
    for c in ('fg_r', 'fg_g', 'fg_b', 'bg_r', 'bg_g', 'bg_b'):
        dense(f'{c}_pred', 64, 1)
    return params


EMBEDDING_PATTERNS = (r'^embd\.weight$', r'^pred\.weight$')
