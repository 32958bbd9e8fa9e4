"""48px CTC OCR model — TPU-native.

Architecture contract (checkpoint ``ocr-ctc.ckpt``): reference
``ocr/model_48px_ctc.py:163-455`` — FAN-style ResNet feature extractor
(pre-activation BasicBlocks, layers [4,6,8,6,3], output 320ch at 1 row),
3 pre-LN transformer encoder layers (torch MultiheadAttention with packed
in_proj, sinusoidal PE added to q/k only), LN+GELU char head (CTC) and a
6-channel color head.

Fully feed-forward — one jitted program per width bucket, greedy CTC decode
on device.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, avg_pool2d, gelu, layer_norm, linear, relu

EMBD_DIM = 320
N_HEADS = 8
HEAD_DIM = EMBD_DIM // N_HEADS
N_LAYERS = 3
FF_DIM = EMBD_DIM * 4
LAYERS = (4, 6, 8, 6, 3)  # note: reference passes 5 entries; only 4 used
BLANK = 0


# --------------------------------------------------------------------------
# ResNet feature extractor
# --------------------------------------------------------------------------

def _basic_block(p: P, x: jax.Array) -> jax.Array:
    """Pre-activation BasicBlock (model_48px_ctc.py:372-403)."""
    residual = x
    out = relu(p.bn('bn1', x))
    out = p.conv('conv1', out, padding=1)
    out = relu(p.bn('bn2', out))
    out = p.conv('conv2', out, padding=1)
    if 'downsample.0.weight' in p:
        residual = p.bn('downsample.0', x)
        residual = p.conv('downsample.1', residual)
    return out + residual


def _layer(p: P, x: jax.Array, blocks: int) -> jax.Array:
    for i in range(blocks):
        x = _basic_block(p.scope(str(i)), x)
    return x


def resnet_features(p: P, x: jax.Array) -> jax.Array:
    """(N, 48, W, 3) → (N, W', 320)."""
    x = relu(p.bn('bn0_1', p.conv('conv0_1', x, padding=1)))
    x = p.conv('conv0_2', x, padding=1)
    x = avg_pool2d(x, 2, 2)
    x = _layer(p.scope('layer1'), x, LAYERS[0])
    x = p.conv('conv1', relu(p.bn('bn1', x)), padding=1)
    x = avg_pool2d(x, 2, 2)
    x = _layer(p.scope('layer2'), x, LAYERS[1])
    x = p.conv('conv2', relu(p.bn('bn2', x)), padding=1)
    x = avg_pool2d(x, 2, (2, 1), (0, 1))
    x = _layer(p.scope('layer3'), x, LAYERS[2])
    x = p.conv('conv3', relu(p.bn('bn3', x)), padding=1)
    x = _layer(p.scope('layer4'), x, LAYERS[3])
    x = relu(p.bn('bn4_1', x))
    # conv4_1: stride (2,1), pad (1,1)
    w = p['conv4_1.weight']
    x = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)
    x = relu(p.bn('bn4_2', x))
    x = p.conv('conv4_2', x)  # k3 pad 0: 3 rows -> 1
    x = p.bn('bn4_3', x)
    return x[:, 0, :, :]


# --------------------------------------------------------------------------
# Transformer encoder (torch MultiheadAttention + sinusoidal PE on q/k)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=2)
def _sinusoidal_pe(length: int, dim: int = EMBD_DIM) -> np.ndarray:
    pe = np.zeros((length, dim), np.float32)
    position = np.arange(length, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                      * (-np.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def _mha(p: P, q_in, kv_in, v_in):
    """torch nn.MultiheadAttention with packed in_proj (batch_first)."""
    w = p['in_proj_weight']            # (E, 3E) post conversion
    b = p['in_proj_bias']              # (3E,)
    e = EMBD_DIM
    q = linear(q_in, w[:, :e], b[:e]) * (HEAD_DIM ** -0.5)
    k = linear(kv_in, w[:, e:2 * e], b[e:2 * e])
    v = linear(v_in, w[:, 2 * e:], b[2 * e:])

    def split(x):
        n, l, _ = x.shape
        return x.reshape(n, l, N_HEADS, HEAD_DIM).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum('nhqd,nhkd->nhqk', q, k,
                        preferred_element_type=jnp.float32)
    wts = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum('nhqk,nhkd->nhqd', wts, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    n, h, l, hd = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(n, l, h * hd)
    return p.dense('out_proj', out)


def encoder_forward(params: Dict, x: jax.Array) -> jax.Array:
    p = P(params)
    pe = jnp.asarray(_sinusoidal_pe(2048))[:x.shape[1]]
    for i in range(N_LAYERS):
        lp = p.scope(f'encoders.layers.{i}')
        normed = lp.ln('norm1', x)
        pe_normed = normed + pe.astype(x.dtype)
        x = x + _mha(lp.scope('self_attn'), pe_normed, pe_normed, normed)
        h = lp.dense('linear1', lp.ln('norm2', x))
        x = x + lp.dense('linear2', gelu(h))
    return x


@jax.jit
def ctc_forward(params: Dict, images: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """(N, 48, W, 3) in [-1,1] → (char logprobs (N, T, V),
    color values (N, T, 6) clamped [0,1])."""
    p = P(params)
    feats = resnet_features(p.scope('backbone.ConvNet'), images)
    feats = encoder_forward(params, feats)
    h = gelu(p.ln('char_pred_norm.0', feats))
    logits = p.dense('char_pred', h)
    colors = jnp.clip(p.dense('color_pred1.0', feats), 0, 1)
    return jax.nn.log_softmax(logits.astype(jnp.float32), -1), colors


def init_params(dict_size: int, dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(31)
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
    out_blocks = [80, 160, 320, 320]
    conv(f'{bb}.conv0_1', 3, 3, 3, 40)
    bn(f'{bb}.bn0_1', 40)
    conv(f'{bb}.conv0_2', 3, 3, 40, 40)

    inplanes = 40
    for li, (blocks, planes) in enumerate(zip(LAYERS, out_blocks), start=1):
        for b in range(blocks):
            pre = f'{bb}.layer{li}.{b}'
            bn(f'{pre}.bn1', inplanes if b == 0 else planes)
            cin = inplanes if b == 0 else planes
            conv(f'{pre}.conv1', 3, 3, cin, planes)
            bn(f'{pre}.bn2', planes)
            conv(f'{pre}.conv2', 3, 3, planes, planes)
            if b == 0 and inplanes != planes:
                bn(f'{pre}.downsample.0', inplanes)
                conv(f'{pre}.downsample.1', 1, 1, inplanes, planes)
        inplanes = planes
        if li == 4:
            break
    bn(f'{bb}.bn1', 80)
    conv(f'{bb}.conv1', 3, 3, 80, 80)
    bn(f'{bb}.bn2', 160)
    conv(f'{bb}.conv2', 3, 3, 160, 160)
    bn(f'{bb}.bn3', 320)
    conv(f'{bb}.conv3', 3, 3, 320, 320)
    bn(f'{bb}.bn4_1', 320)
    conv(f'{bb}.conv4_1', 3, 3, 320, 320)
    bn(f'{bb}.bn4_2', 320)
    conv(f'{bb}.conv4_2', 3, 3, 320, 320)
    bn(f'{bb}.bn4_3', 320)

    for i in range(N_LAYERS):
        pre = f'encoders.layers.{i}'
        params[f'{pre}.self_attn.in_proj_weight'] = jnp.asarray(
            rs.randn(EMBD_DIM, 3 * EMBD_DIM).astype(np.float32)
            / np.sqrt(EMBD_DIM), dtype)
        params[f'{pre}.self_attn.in_proj_bias'] = jnp.zeros(
            (3 * EMBD_DIM,), dtype)
        dense(f'{pre}.self_attn.out_proj', EMBD_DIM, EMBD_DIM)
        dense(f'{pre}.linear1', EMBD_DIM, FF_DIM)
        dense(f'{pre}.linear2', FF_DIM, EMBD_DIM)
        ln(f'{pre}.norm1', EMBD_DIM)
        ln(f'{pre}.norm2', EMBD_DIM)

    ln('char_pred_norm.0', EMBD_DIM)
    dense('char_pred', EMBD_DIM, dict_size)
    dense('color_pred1.0', EMBD_DIM, 6)
    return params
