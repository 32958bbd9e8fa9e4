"""PaddleOCR-style DB text detector — TPU-native.

The reference's ``Detector.paddle`` delegates to the external Rust wheel
``rusty-manga-image-translator`` which runs a PaddleOCR detection model under
ONNX Runtime (reference detection/common_rust.py:14-63 — interface contract:
``detect(img, preproc_opts, det_opts) -> (quads+scores, raw_mask)``).

This is the TPU-native replacement: the PP-OCR detection architecture
(MobileNetV3-large ×0.5 backbone → DB-FPN feature fusion → DB head) in JAX.
Weight conversion from the ONNX artifact requires the ``onnx`` package (not
present in this image) and is gated; random init keeps the backend
exercisable.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, interpolate_nearest, relu


def _hswish(x):
    return x * jnp.clip(x + 3, 0, 6) / 6


def _hsigmoid(x):
    return jnp.clip(x + 3, 0, 6) / 6


def _conv_bn(p: P, x, stride=1, padding=0, groups=1, act=None):
    x = p.conv('conv', x, stride=stride, padding=padding, groups=groups)
    x = p.bn('bn', x)
    if act == 'relu':
        return relu(x)
    if act == 'hswish':
        return _hswish(x)
    return x


def _se(p: P, x):
    s = x.mean(axis=(1, 2), keepdims=True)
    s = relu(p.conv('conv1', s))
    s = _hsigmoid(p.conv('conv2', s))
    return x * s


# MobileNetV3-large ×0.5 residual config:
# (kernel, expand, out, use_se, act, stride)
_MNV3_CFG = [
    (3, 8, 8, False, 'relu', 1),
    (3, 32, 12, False, 'relu', 2),
    (3, 40, 12, False, 'relu', 1),
    (5, 40, 20, True, 'relu', 2),       # -> c2 (1/8 after this stage)
    (5, 60, 20, True, 'relu', 1),
    (5, 60, 20, True, 'relu', 1),
    (3, 120, 40, False, 'hswish', 2),   # -> c3
    (3, 100, 40, False, 'hswish', 1),
    (3, 92, 40, False, 'hswish', 1),
    (3, 92, 40, False, 'hswish', 1),
    (3, 240, 56, True, 'hswish', 1),
    (3, 336, 56, True, 'hswish', 1),
    (5, 336, 80, True, 'hswish', 2),    # -> c4
    (5, 480, 80, True, 'hswish', 1),
    (5, 480, 80, True, 'hswish', 1),
]


def _residual_unit(p: P, x, kernel, use_se, act, stride):
    inp = x
    y = _conv_bn(p.scope('expand'), x, act=act)
    y = _conv_bn(p.scope('depthwise'), y, stride=stride,
                 padding=kernel // 2, groups=y.shape[-1], act=act)
    if use_se:
        y = _se(p.scope('se'), y)
    y = _conv_bn(p.scope('linear'), y)
    if stride == 1 and inp.shape[-1] == y.shape[-1]:
        y = y + inp
    return y


def backbone_forward(p: P, x: jax.Array) -> List[jax.Array]:
    """(N, H, W, 3) → [c1 (1/4), c2 (1/8), c3 (1/16), c4 (1/32)]."""
    x = _conv_bn(p.scope('conv0'), x, stride=2, padding=1, act='hswish')
    feats = []
    for i, (k, e, o, se, act, s) in enumerate(_MNV3_CFG):
        if s == 2:
            feats.append(x)
        x = _residual_unit(p.scope(f'block{i}'), x, k, se, act, s)
    x = _conv_bn(p.scope('conv_last'), x, act='hswish')
    feats.append(x)
    return feats[1:]  # drop the 1/2 feature


def _db_fpn(p: P, feats: List[jax.Array], out_ch: int = 96) -> jax.Array:
    """DB-FPN: 1x1 laterals, top-down nearest upsampling, 3x3 smooth convs,
    concat at 1/4 scale."""
    c1, c2, c3, c4 = feats
    in5 = p.conv('in5', c4)
    in4 = p.conv('in4', c3)
    in3 = p.conv('in3', c2)
    in2 = p.conv('in2', c1)
    out4 = in4 + interpolate_nearest(in5, 2)
    out3 = in3 + interpolate_nearest(out4, 2)
    out2 = in2 + interpolate_nearest(out3, 2)
    p5 = interpolate_nearest(p.conv('p5', in5, padding=1), 8)
    p4 = interpolate_nearest(p.conv('p4', out4, padding=1), 4)
    p3 = interpolate_nearest(p.conv('p3', out3, padding=1), 2)
    p2 = p.conv('p2', out2, padding=1)
    return jnp.concatenate([p5, p4, p3, p2], axis=-1)


def _db_head(p: P, x: jax.Array) -> jax.Array:
    def branch(scope: P):
        h = relu(scope.bn('bn1', scope.conv('conv1', x, padding=1)))
        h = relu(scope.bn('bn2', scope.conv_t('conv2', h, stride=2,
                                              padding=0, kernel_size=2)))
        return jax.nn.sigmoid(scope.conv_t('conv3', h, stride=2, padding=0,
                                           kernel_size=2))
    shrink = branch(p.scope('binarize'))
    thresh = branch(p.scope('thresh'))
    return jnp.concatenate([shrink, thresh], axis=-1)


def paddle_det_forward(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, H, W, 3) imagenet-normalized → (N, H, W, 2) shrink+thresh."""
    p = P(params)
    feats = backbone_forward(p.scope('backbone'), x)
    fuse = _db_fpn(p.scope('neck'), feats)
    return _db_head(p.scope('head'), fuse)


def init_params(dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(47)
    params: Dict = {}

    def conv(key, kh, kw, ci, co, groups=1, bias=False):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(kh, kw, ci // groups, co).astype(np.float32)
            * np.sqrt(2.0 / (kh * kw * max(ci // groups, 1))), dtype)
        if bias:
            params[key + '.bias'] = jnp.zeros((co,), dtype)

    def bn(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)
        params[key + '.running_mean'] = jnp.zeros((c,), jnp.float32)
        params[key + '.running_var'] = jnp.ones((c,), jnp.float32)

    def conv_bn(key, kh, ci, co, groups=1):
        conv(f'{key}.conv', kh, kh, ci, co, groups=groups)
        bn(f'{key}.bn', co)

    conv_bn('backbone.conv0', 3, 3, 8)
    cin = 8
    for i, (k, e, o, se, act, s) in enumerate(_MNV3_CFG):
        pre = f'backbone.block{i}'
        conv_bn(f'{pre}.expand', 1, cin, e)
        conv_bn(f'{pre}.depthwise', k, e, e, groups=e)
        if se:
            conv(f'{pre}.se.conv1', 1, 1, e, e // 4, bias=True)
            conv(f'{pre}.se.conv2', 1, 1, e // 4, e, bias=True)
        conv_bn(f'{pre}.linear', 1, e, o)
        cin = o
    conv_bn('backbone.conv_last', 1, cin, 480)

    chans = [12, 20, 56, 480]
    for name, c in zip(('in2', 'in3', 'in4', 'in5'), chans):
        conv(f'neck.{name}', 1, 1, c, 96, bias=True)
    for name in ('p2', 'p3', 'p4', 'p5'):
        conv(f'neck.{name}', 3, 3, 96, 24, bias=True)

    for head in ('binarize', 'thresh'):
        conv(f'head.{head}.conv1', 3, 3, 96, 24)
        bn(f'head.{head}.bn1', 24)
        conv(f'head.{head}.conv2', 2, 2, 24, 24, bias=True)
        bn(f'head.{head}.bn2', 24)
        conv(f'head.{head}.conv3', 2, 2, 24, 1, bias=True)
    return params
