"""ComicTextDetector (ctd) network — TPU-native.

Architecture contract (checkpoint ``comictextdetector.pt``): reference
``detection/ctd_utils/basemodel.py`` + ``ctd_utils/yolov5/common.py`` —
YOLOv5s backbone (Focus stem, Conv/C3/SPP blocks), UnetHead (C3 up blocks +
transposed convs → text pixel mask), and a C3-based DBHead (shrink+threshold
line maps). The YOLO Detect head exists in the checkpoint but its block
boxes are unused at inference (reference ctd.py:169-176), so it is not
ported.

Checkpoint layout: {'blk_det': yolo sd, 'text_seg': UnetHead sd,
'text_det': DBHead sd}; converted keys are prefixed accordingly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, avg_pool2d, max_pool2d


def _act(x, kind: str):
    if kind == 'silu':
        return x * jax.nn.sigmoid(x)
    return jnp.where(x >= 0, x, 0.1 * x)  # leaky 0.1


def _conv_bn_act(p: P, x, k: int, stride: int = 1, act: str = 'silu'):
    x = p.conv('conv', x, stride=stride, padding=k // 2)
    x = p.bn('bn', x)
    return _act(x, act)


def _bottleneck(p: P, x, shortcut: bool, act: str):
    y = _conv_bn_act(p.scope('cv1'), x, 1, act=act)
    y = _conv_bn_act(p.scope('cv2'), y, 3, act=act)
    if shortcut and x.shape[-1] == y.shape[-1]:
        return x + y
    return y


def _c3(p: P, x, n: int, shortcut: bool = True, act: str = 'silu'):
    y1 = _conv_bn_act(p.scope('cv1'), x, 1, act=act)
    for i in range(n):
        y1 = _bottleneck(p.scope(f'm.{i}'), y1, shortcut, act)
    y2 = _conv_bn_act(p.scope('cv2'), x, 1, act=act)
    return _conv_bn_act(p.scope('cv3'), jnp.concatenate([y1, y2], -1), 1,
                        act=act)


def _focus(p: P, x, act: str):
    """Space-to-depth slice + conv (yolov5 Focus)."""
    patches = jnp.concatenate([
        x[:, ::2, ::2, :], x[:, 1::2, ::2, :],
        x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1)
    return _conv_bn_act(p.scope('conv'), patches, 3, act=act)


def _spp(p: P, x, act: str):
    y = _conv_bn_act(p.scope('cv1'), x, 1, act=act)
    pools = [y] + [max_pool2d(y, k, 1, k // 2) for k in (5, 9, 13)]
    return _conv_bn_act(p.scope('cv2'), jnp.concatenate(pools, -1), 1,
                        act=act)


# yolov5s backbone (depth 0.33, width 0.5): (kind, n, extra)
_BACKBONE = [
    ('focus', 0),      # 0: 3→32, /2
    ('conv', 0),       # 1: 32→64, /4        <- f160
    ('c3', 1),         # 2
    ('conv', 0),       # 3: 64→128, /8       <- f80
    ('c3', 3),         # 4
    ('conv', 0),       # 5: 128→256, /16     <- f40
    ('c3', 3),         # 6
    ('conv', 0),       # 7: 256→512, /32     <- f20
    ('spp', 0),        # 8
    ('c3', 1),         # 9 (no shortcut)     <- f3
]


def backbone_features(p: P, x: jax.Array, act: str = 'silu'):
    """(N, H, W, 3) in [0,1] → (f160, f80, f40, f20, f3)."""
    feats = {}
    for i, (kind, n) in enumerate(_BACKBONE):
        lp = p.scope(f'model.{i}')
        if kind == 'focus':
            x = _focus(lp, x, act)
        elif kind == 'conv':
            x = _conv_bn_act(lp, x, 3, stride=2, act=act)
        elif kind == 'c3':
            x = _c3(lp, x, n, shortcut=(i != 9), act=act)
        elif kind == 'spp':
            x = _spp(lp, x, act)
        feats[i] = x
    return feats[1], feats[3], feats[5], feats[7], feats[9]


def _double_conv_up_c3(p: P, x, n_mid: int, act: str):
    """C3 + 4×4 s2 transposed conv + BN + ReLU (basemodel.py:15-26)."""
    x = _c3(p.scope('conv.0'), x, 1, act=act)
    x = p.conv_t('conv.1', x, stride=2, padding=1, kernel_size=4)
    x = p.bn('conv.2', x)
    return jnp.maximum(x, 0)


def unet_head_forward(p: P, f160, f80, f40, f20, f3, act: str = 'leaky'):
    """UnetHead inference path → (mask, (f80, f40, u40))."""
    d10 = avg_pool2d(f3, 2, 2)
    d10 = _c3(p.scope('down_conv1.conv'), d10, 1, act=act)
    u20 = _double_conv_up_c3(p.scope('upconv0'), d10, 512, act)
    u40 = _double_conv_up_c3(p.scope('upconv2'),
                             jnp.concatenate([f20, u20], -1), 512, act)
    u80 = _double_conv_up_c3(p.scope('upconv3'),
                             jnp.concatenate([f40, u40], -1), 512, act)
    u160 = _double_conv_up_c3(p.scope('upconv4'),
                              jnp.concatenate([f80, u80], -1), 256, act)
    u320 = _double_conv_up_c3(p.scope('upconv5'),
                              jnp.concatenate([f160, u160], -1), 128, act)
    mask = jax.nn.sigmoid(
        p.conv_t('upconv6.0', u320, stride=2, padding=1, kernel_size=4))
    return mask, (f80, f40, u40)


def db_head_forward(p: P, f80, f40, u40, act: str = 'leaky'):
    """ctd DBHead inference: concat(sigmoid(shrink), thresh) at 1/4 input."""
    u80 = _double_conv_up_c3(p.scope('upconv3'),
                             jnp.concatenate([f40, u40], -1), 512, act)
    x = _double_conv_up_c3(p.scope('upconv4'),
                           jnp.concatenate([f80, u80], -1), 256, act)
    x = p.conv('conv.0', x)
    x = p.bn('conv.1', x)
    x = jnp.maximum(x, 0)

    b = p.scope('binarize')
    s = jnp.maximum(b.bn('1', b.conv('0', x, padding=1)), 0)
    s = jnp.maximum(b.bn('4', b.conv_t('3', s, stride=2, padding=0,
                                       kernel_size=2)), 0)
    shrink = jax.nn.sigmoid(b.conv_t('6', s, stride=2, padding=0,
                                     kernel_size=2))
    t = p.scope('thresh')
    v = jnp.maximum(t.bn('1', t.conv('0', x, padding=1)), 0)
    v = jnp.maximum(t.bn('4', t.conv_t('3', v, stride=2, padding=0,
                                       kernel_size=2)), 0)
    thresh = jax.nn.sigmoid(t.conv_t('6', v, stride=2, padding=0,
                                     kernel_size=2))
    return jnp.concatenate([shrink, thresh], axis=-1)


def ctd_forward(params: Dict, x: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """x: (N, H, W, 3) in [0, 1]. Returns (mask (N,H/2? → H,W,1 at input/1),
    lines (N, H/4·4 … see heads))."""
    p = P(params)
    feats = backbone_features(p.scope('blk_det'), x, act='silu')
    mask, (f80, f40, u40) = unet_head_forward(p.scope('text_seg'), *feats,
                                              act='leaky')
    lines = db_head_forward(p.scope('text_det'), f80, f40, u40, act='leaky')
    return mask, lines


TRANSPOSED_CONV_PATTERNS = (
    r'text_seg\.upconv\d\.conv\.1\.weight',
    r'text_seg\.upconv6\.0\.weight',
    r'text_det\.upconv\d\.conv\.1\.weight',
    r'text_det\.(binarize|thresh)\.[36]\.weight',
)


def init_params(dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(29)
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

    def cba(key, ci, co, k):
        conv(f'{key}.conv', k, k, ci, co)
        bn(f'{key}.bn', co)

    def c3(key, ci, co, n, e=0.5):
        cm = int(co * e)
        cba(f'{key}.cv1', ci, cm, 1)
        cba(f'{key}.cv2', ci, cm, 1)
        cba(f'{key}.cv3', 2 * cm, co, 1)
        for i in range(n):
            cba(f'{key}.m.{i}.cv1', cm, cm, 1)
            cba(f'{key}.m.{i}.cv2', cm, cm, 3)

    # backbone (yolov5s widths)
    bb = 'blk_det'
    cba(f'{bb}.model.0.conv', 12, 32, 3)
    cba(f'{bb}.model.1', 32, 64, 3)
    c3(f'{bb}.model.2', 64, 64, 1)
    cba(f'{bb}.model.3', 64, 128, 3)
    c3(f'{bb}.model.4', 128, 128, 3)
    cba(f'{bb}.model.5', 128, 256, 3)
    c3(f'{bb}.model.6', 256, 256, 3)
    cba(f'{bb}.model.7', 256, 512, 3)
    cba(f'{bb}.model.8.cv1', 512, 256, 1)
    cba(f'{bb}.model.8.cv2', 256 * 4, 512, 1)
    c3(f'{bb}.model.9', 512, 512, 1)

    def up_c3(key, cin, mid, out):
        c3(f'{key}.conv.0', cin + mid, mid, 1)
        conv(f'{key}.conv.1', 4, 4, mid, out)
        bn(f'{key}.conv.2', out)

    seg = 'text_seg'
    c3(f'{seg}.down_conv1.conv', 512, 512, 1)
    up_c3(f'{seg}.upconv0', 0, 512, 256)
    up_c3(f'{seg}.upconv2', 256, 512, 256)
    up_c3(f'{seg}.upconv3', 0, 512, 256)
    up_c3(f'{seg}.upconv4', 128, 256, 128)
    up_c3(f'{seg}.upconv5', 64, 128, 64)
    conv(f'{seg}.upconv6.0', 4, 4, 64, 1)

    det = 'text_det'
    up_c3(f'{det}.upconv3', 0, 512, 256)
    up_c3(f'{det}.upconv4', 128, 256, 128)
    conv(f'{det}.conv.0', 1, 1, 128, 64, bias=True)
    bn(f'{det}.conv.1', 64)
    for head in ('binarize', 'thresh'):
        bias = head == 'binarize'
        conv(f'{det}.{head}.0', 3, 3, 64, 16, bias=bias)
        bn(f'{det}.{head}.1', 16)
        conv(f'{det}.{head}.3', 2, 2, 16, 16, bias=True)
        bn(f'{det}.{head}.4', 16)
        conv(f'{det}.{head}.6', 2, 2, 16, 1, bias=True)
    return params
