"""AOT-GAN inpainting generator (the 'default' inpainter) — TPU-native.

Architecture contract (checkpoint ``inpainting.ckpt``): reference
``inpainting/inpainting_aot.py`` — gated weight-standardized convolutions
(GatedWSConvPadded :120, ScaledWSConv2d :54), NF-style scaled activations
(:36-43), 10 AOTBlocks with dilation rates 2/4/8/16 (:170-196), transpose-
conv upsampling tail, output clipped to [-1, 1].

Weight standardization is folded at call time (cheap; XLA hoists it out of
the conv loop), keeping the stored params byte-identical to the converted
checkpoint.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, conv2d, conv_transpose2d, sigmoid

RELU_NF_GAIN = 1.7139588594436646
GATE_GAIN = 1.8
WS_EPS = 1e-4
CH = 32
N_BLOCKS = 10
RATES = (2, 4, 8, 16)


def relu_nf(x):
    return jnp.maximum(x, 0) * jnp.asarray(RELU_NF_GAIN, x.dtype)


def _ws_weight(w: jax.Array, gain: jax.Array, transpose: bool) -> jax.Array:
    """Scaled weight standardization on an HWIO kernel.

    Regular convs standardize per output channel; transpose convs per input
    channel (torch layouts OIHW / IOHW respectively; both have the stat axes
    = all but the first torch dim).
    """
    wf = w.astype(jnp.float32)
    if transpose:
        axes = (0, 1, 3)     # (kh, kw, out) per input channel
        g = gain.reshape(1, 1, -1, 1)
        keep = 2
    else:
        axes = (0, 1, 2)     # (kh, kw, in) per output channel
        g = gain.reshape(1, 1, 1, -1)
        keep = 3
    fan_in = int(np.prod([wf.shape[a] for a in axes]))
    mean = wf.mean(axis=axes, keepdims=True)
    # torch var_mean default: unbiased
    var = wf.var(axis=axes, keepdims=True, ddof=1)
    scale = jax.lax.rsqrt(jnp.maximum(var * fan_in, WS_EPS)) \
        * g.astype(jnp.float32)
    return (wf * scale - mean * scale).astype(w.dtype)


def _gated_conv(p: P, x: jax.Array, ks: int, stride: int = 1,
                dilation: int = 1) -> jax.Array:
    pad = ((ks - 1) * dilation) // 2
    w_s = _ws_weight(p['conv.weight'], p['conv.gain'], False)
    w_g = _ws_weight(p['conv_gate.weight'], p['conv_gate.gain'], False)
    signal = conv2d(x, w_s, p['conv.bias'], stride=stride, padding=pad,
                    dilation=dilation, pad_mode='reflect')
    gate = conv2d(x, w_g, p['conv_gate.bias'], stride=stride, padding=pad,
                  dilation=dilation, pad_mode='reflect')
    return signal * sigmoid(gate) * jnp.asarray(GATE_GAIN, x.dtype)


def _gated_conv_t(p: P, x: jax.Array, ks: int, stride: int) -> jax.Array:
    w_s = _ws_weight(p['conv.weight'], p['conv.gain'], True)
    w_g = _ws_weight(p['conv_gate.weight'], p['conv_gate.gain'], True)
    pad = (ks - 1) // 2
    signal = conv_transpose2d(x, w_s, p['conv.bias'], stride=stride,
                              padding=pad, kernel_size=ks)
    gate = conv_transpose2d(x, w_g, p['conv_gate.bias'], stride=stride,
                            padding=pad, kernel_size=ks)
    return signal * sigmoid(gate) * jnp.asarray(GATE_GAIN, x.dtype)


def _my_layer_norm(x: jax.Array) -> jax.Array:
    """reference my_layer_norm (:164-169): spatial mean/std per channel,
    scaled to ±5."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    n = xf.shape[1] * xf.shape[2]
    var = xf.var(axis=(1, 2), keepdims=True) * (n / max(n - 1, 1))
    std = jnp.sqrt(var) + 1e-9
    return (5.0 * (2.0 * (xf - mean) / std - 1.0)).astype(x.dtype)


def _aot_block(p: P, x: jax.Array) -> jax.Array:
    outs = []
    for i, rate in enumerate(RATES):
        b = p.scope(f'block{i:02d}')
        h = b.conv('1', x, padding=rate, dilation=rate, pad_mode='reflect')
        outs.append(jnp.maximum(h, 0))
    out = jnp.concatenate(outs, axis=-1)
    out = p.conv('fuse.1', out, padding=1, pad_mode='reflect')
    g = p.conv('gate.1', x, padding=1, pad_mode='reflect')
    mask = sigmoid(_my_layer_norm(g))
    return x * (1 - mask) + out * mask


def aot_generator_forward(params: Dict, img: jax.Array, mask: jax.Array
                          ) -> jax.Array:
    """img: (N, H, W, 3) in [-1, 1] (pre-masked), mask: (N, H, W, 1).

    Returns (N, H, W, 3) in [-1, 1].
    """
    p = P(params)
    x = jnp.concatenate([mask, img], axis=-1)
    x = _gated_conv(p.scope('head.0'), x, 3)
    x = relu_nf(x)
    x = _gated_conv(p.scope('head.2'), x, 4, stride=2)
    x = relu_nf(x)
    x = _gated_conv(p.scope('head.4'), x, 4, stride=2)
    for i in range(N_BLOCKS):
        x = _aot_block(p.scope(f'body_conv.{i}'), x)
    x = _gated_conv(p.scope('tail.0'), x, 3)
    x = relu_nf(x)
    x = _gated_conv(p.scope('tail.2'), x, 3)
    x = relu_nf(x)
    x = _gated_conv_t(p.scope('tail.4'), x, 4, 2)
    x = relu_nf(x)
    x = _gated_conv_t(p.scope('tail.6'), x, 4, 2)
    x = relu_nf(x)
    x = _gated_conv(p.scope('tail.8'), x, 3)
    return jnp.clip(x, -1, 1)


TRANSPOSED_CONV_PATTERNS = (r'tail\.[46]\.conv(_gate)?\.weight',)


def init_params(dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(11)
    params: Dict = {}

    def gated(key, ks, ci, co, transpose=False):
        for part in ('conv', 'conv_gate'):
            params[f'{key}.{part}.weight'] = jnp.asarray(
                rs.randn(ks, ks, ci, co).astype(np.float32)
                * np.sqrt(1.0 / (ks * ks * ci)), dtype)
            params[f'{key}.{part}.bias'] = jnp.zeros((co,), dtype)
            params[f'{key}.{part}.gain'] = jnp.ones(
                (ci if transpose else co, 1, 1, 1), dtype)

    def conv(key, ks, ci, co):
        params[f'{key}.weight'] = jnp.asarray(
            rs.randn(ks, ks, ci, co).astype(np.float32)
            * np.sqrt(2.0 / (ks * ks * ci)), dtype)
        params[f'{key}.bias'] = jnp.zeros((co,), dtype)

    gated('head.0', 3, 4, CH)
    gated('head.2', 4, CH, CH * 2)
    gated('head.4', 4, CH * 2, CH * 4)
    dim = CH * 4
    for i in range(N_BLOCKS):
        for j in range(len(RATES)):
            conv(f'body_conv.{i}.block{j:02d}.1', 3, dim, dim // 4)
        conv(f'body_conv.{i}.fuse.1', 3, dim, dim)
        conv(f'body_conv.{i}.gate.1', 3, dim, dim)
    gated('tail.0', 3, dim, dim)
    gated('tail.2', 3, dim, dim)
    gated('tail.4', 4, dim, CH * 2, transpose=True)
    gated('tail.6', 4, CH * 2, CH, transpose=True)
    gated('tail.8', 3, CH, 3)
    return params
