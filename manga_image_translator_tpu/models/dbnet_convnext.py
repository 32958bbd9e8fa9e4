"""DBNet-ConvNeXt text detector.

Architecture contract: reference ``detection/dbnet_convnext.py`` — timm-style
ConvNeXt backbone (depths 3/3/27/3, dims 128/256/512/1024, patch-4 stem,
LN-normed downsample convs), two extra ConvNeXt down stages, six
UpconvSkip blocks (ConvNeXt block + 2×2 transposed conv), a BN-free SiLU
DBHead (k=50) and a SiLU mask head.

Note: the reference registers this detector with an EMPTY checkpoint URL
(dbnet_convnext.py:513-517) — no weights were ever released — so conversion
support here is structural; random init is the only usable mode upstream
too.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, avg_pool2d, conv2d, gelu, layer_norm, linear, relu

DEPTHS = (3, 3, 27, 3)
DIMS = (128, 256, 512, 1024)


def silu(x):
    return x * jax.nn.sigmoid(x)


def _convnext_block(p: P, x: jax.Array, ks: int = 7) -> jax.Array:
    """timm ConvNeXtBlock with channels-last LN + Linear MLP."""
    shortcut = x
    # timm uses depthwise conv_dw only when out_chs >= in_chs; a converted
    # depthwise kernel has shape (k, k, 1, co)
    w_dw = p['conv_dw.weight']
    x = p.conv('conv_dw', x, padding=ks // 2,
               groups=w_dw.shape[-1] if w_dw.shape[2] == 1 else 1)
    x = p.ln('norm', x, eps=1e-6)
    x = p.dense('mlp.fc1', x)
    x = gelu(x)
    x = p.dense('mlp.fc2', x)
    if 'gamma' in p:
        x = x * p['gamma'].astype(x.dtype)
    if 'shortcut.conv.weight' in p:
        shortcut = conv2d(shortcut, p['shortcut.conv.weight'],
                          p['shortcut.conv.bias']
                          if 'shortcut.conv.bias' in p else None)
    return x + shortcut


def _stage(p: P, x: jax.Array, depth: int, downsample: bool,
           ks: int = 7) -> jax.Array:
    if downsample:
        x = p.ln('downsample.0', x, eps=1e-6)
        x = p.conv('downsample.1', x, stride=2)
    for i in range(depth):
        x = _convnext_block(p.scope(f'blocks.{i}'), x, ks)
    return x


def _upconv_skip(p: P, x: jax.Array) -> jax.Array:
    x = _convnext_block(p.scope('conv'), x)
    return p.conv_t('upconv', x, stride=2, padding=0, kernel_size=2)


def _db_head(p: P, x: jax.Array) -> jax.Array:
    b = p.scope('binarize')
    s = silu(b.conv('0', x, padding=1))
    s = silu(b.conv_t('2', s, stride=2, padding=1, kernel_size=4))
    shrink = b.conv_t('4', s, stride=2, padding=1, kernel_size=4)
    t = p.scope('thresh')
    v = silu(t.conv('0', x, padding=1))
    v = silu(t.conv_t('2', v, stride=2, padding=1, kernel_size=4))
    thresh = jax.nn.sigmoid(t.conv_t('4', v, stride=2, padding=1,
                                     kernel_size=4))
    return jnp.concatenate([shrink, thresh], axis=-1)


def dbnet_convnext_forward(params: Dict, x: jax.Array
                           ) -> Tuple[jax.Array, jax.Array]:
    """x: (N, H, W, 3) in [-1, 1]. Returns (db (N,H,W,2), mask (N,H/4,W/4,1))."""
    p = P(params)
    bb = p.scope('backbone')
    h = bb.conv('stem.0', x, stride=4)
    h = bb.ln('stem.1', h, eps=1e-6)
    h4 = _stage(bb.scope('stages.0'), h, DEPTHS[0], downsample=False)
    h8 = _stage(bb.scope('stages.1'), h4, DEPTHS[1], downsample=True)
    h16 = _stage(bb.scope('stages.2'), h8, DEPTHS[2], downsample=True)
    h32 = _stage(bb.scope('stages.3'), h16, DEPTHS[3], downsample=True)
    h64 = _stage(p.scope('down_conv1'), h32, 2, downsample=True)
    h128 = _stage(p.scope('down_conv2'), h64, 2, downsample=True)

    up128 = _upconv_skip(p.scope('upconv1'), h128)
    up64 = _upconv_skip(p.scope('upconv2'),
                        jnp.concatenate([up128, h64], axis=-1))
    up32 = _upconv_skip(p.scope('upconv3'),
                        jnp.concatenate([up64, h32], axis=-1))
    up16 = _upconv_skip(p.scope('upconv4'),
                        jnp.concatenate([up32, h16], axis=-1))
    up8 = _upconv_skip(p.scope('upconv5'),
                       jnp.concatenate([up16, h8], axis=-1))
    up4 = _upconv_skip(p.scope('upconv6'),
                       jnp.concatenate([up8, h4], axis=-1))

    db = _db_head(p.scope('conv_db'), up8)
    m = p.scope('conv_mask')
    mm = silu(m.conv('0', up4, padding=1))
    mm = silu(m.conv('2', mm, padding=1))
    mask = jax.nn.sigmoid(m.conv('4', mm))
    return db, mask


TRANSPOSED_CONV_PATTERNS = (
    r'upconv\d\.upconv\.weight',
    r'conv_db\.(binarize|thresh)\.[24]\.weight',
)


def init_params(dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(23)
    params: Dict = {}

    def conv(key, kh, kw, ci, co, groups=1, bias=True):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(kh, kw, ci // groups, co).astype(np.float32) * 0.02,
            dtype)
        if bias:
            params[key + '.bias'] = jnp.zeros((co,), dtype)

    def dense(key, i, o):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(i, o).astype(np.float32) * 0.02, dtype)
        params[key + '.bias'] = jnp.zeros((o,), dtype)

    def ln(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)

    def block(key, ci, co, ks=7):
        if co >= ci:
            conv(f'{key}.conv_dw', ks, ks, co, co, groups=co)
        else:  # timm: full conv when out_chs < in_chs
            conv(f'{key}.conv_dw', ks, ks, ci, co)
        ln(f'{key}.norm', co)
        dense(f'{key}.mlp.fc1', co, co * 4)
        dense(f'{key}.mlp.fc2', co * 4, co)
        params[f'{key}.gamma'] = jnp.full((co,), 1e-6, dtype)
        if ci != co:
            conv(f'{key}.shortcut.conv', 1, 1, ci, co)

    conv('backbone.stem.0', 4, 4, 3, DIMS[0])
    ln('backbone.stem.1', DIMS[0])
    prev = DIMS[0]
    for si, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        pre = f'backbone.stages.{si}'
        if si > 0:
            ln(f'{pre}.downsample.0', prev)
            conv(f'{pre}.downsample.1', 2, 2, prev, dim)
        for b in range(depth):
            block(f'{pre}.blocks.{b}', dim, dim)
        prev = dim
    for name in ('down_conv1', 'down_conv2'):
        ln(f'{name}.downsample.0', 1024)
        conv(f'{name}.downsample.1', 2, 2, 1024, 1024)
        for b in range(2):
            block(f'{name}.blocks.{b}', 1024, 1024)

    ups = [('upconv1', 1024, 128), ('upconv2', 128 + 1024, 128),
           ('upconv3', 128 + 1024, 128), ('upconv4', 128 + 512, 128),
           ('upconv5', 128 + 256, 128), ('upconv6', 128 + 128, 64)]
    for name, ci, co in ups:
        block(f'{name}.conv', ci, co)
        conv(f'{name}.upconv', 2, 2, co, co)

    for head, bias in (('binarize', True), ('thresh', False)):
        conv(f'conv_db.{head}.0', 3, 3, 128, 32, bias=bias)
        conv(f'conv_db.{head}.2', 4, 4, 32, 32, bias=True)
        conv(f'conv_db.{head}.4', 4, 4, 32, 1, bias=True)
    conv('conv_mask.0', 3, 3, 64, 64)
    conv('conv_mask.2', 3, 3, 64, 32)
    conv('conv_mask.4', 1, 1, 32, 1)
    return params
