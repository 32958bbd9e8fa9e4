"""ESRGAN RRDBNet 4x super-resolution — TPU-native.

Architecture contract (old-format ESRGAN checkpoints, e.g. 4xESRGAN.pth /
4x-UltraSharp): reference ``upscaling/esrgan_pytorch.py:28-160`` — fea conv,
nb RRDB blocks (3 dense blocks of 5 convs each, LeakyReLU 0.2, 0.2-scaled
residuals), trunk conv with long skip, 2× nearest-upsample+conv stages,
HR convs. Flat key layout matches the torch checkpoints
('model.0', 'model.1.sub.{i}.RDB{j}.conv{k}.0', 'model.3', 'model.6',
'model.8', 'model.10').
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _conv(p: P, key: str, x, padding=1):
    return p.conv(key, x, padding=padding)


def _rdb(p: P, x):
    """ResidualDenseBlock_5C."""
    x1 = _lrelu(_conv(p, 'conv1.0', x))
    x2 = _lrelu(_conv(p, 'conv2.0', jnp.concatenate([x, x1], -1)))
    x3 = _lrelu(_conv(p, 'conv3.0', jnp.concatenate([x, x1, x2], -1)))
    x4 = _lrelu(_conv(p, 'conv4.0', jnp.concatenate([x, x1, x2, x3], -1)))
    x5 = _conv(p, 'conv5.0', jnp.concatenate([x, x1, x2, x3, x4], -1))
    return x5 * 0.2 + x


def _rrdb(p: P, x):
    out = _rdb(p.scope('RDB1'), x)
    out = _rdb(p.scope('RDB2'), out)
    out = _rdb(p.scope('RDB3'), out)
    return out * 0.2 + x


def _upsample2x(x):
    n, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _up_conv(p: P, key: str, x: jax.Array) -> jax.Array:
    """conv3x3(nearest2x(x)): MIT_TPU_DECONV_PACK=1 folds the repeat into
    one phase-packed conv at input resolution (functional.py), removing
    the 4x repeat materialization and the 64->128 lane padding."""
    import os
    from .functional import nearest2x_conv_packed
    if os.environ.get('MIT_TPU_DECONV_PACK', '0') == '1':
        b = p[f'{key}.bias'] if f'{key}.bias' in p else None
        return nearest2x_conv_packed(x, p[f'{key}.weight'], b)
    return _conv(p, key, _upsample2x(x))


def _tail_conv(p: P, key: str, x: jax.Array) -> jax.Array:
    """Final 3x3 64->3 conv at 4x-upscaled res: phase-packed (s=8: 192
    packed channels, M/64) when the size allows and the flag is on."""
    import os
    from .functional import conv2d_phase_packed
    s = 8
    if (os.environ.get('MIT_TPU_DECONV_PACK', '0') == '1'
            and x.shape[1] % s == 0 and x.shape[2] % s == 0):
        b = p[f'{key}.bias'] if f'{key}.bias' in p else None
        return conv2d_phase_packed(x, p[f'{key}.weight'], b, padding=1, s=s)
    return _conv(p, key, x)


def esrgan_forward(params: Dict, x: jax.Array, nb: int = 23) -> jax.Array:
    """x: (N, H, W, 3) float in [0, 1] → (N, 4H, 4W, 3)."""
    p = P(params)
    fea = _conv(p, 'model.0', x)
    trunk = fea
    for i in range(nb):
        trunk = _rrdb(p.scope(f'model.1.sub.{i}'), trunk)
    trunk = _conv(p, f'model.1.sub.{nb}', trunk)
    fea = fea + trunk
    fea = _lrelu(_up_conv(p, 'model.3', fea))
    fea = _lrelu(_up_conv(p, 'model.6', fea))
    fea = _lrelu(_conv(p, 'model.8', fea))
    return _tail_conv(p, 'model.10', fea)


def detect_nb(params: Dict) -> int:
    """Number of RRDB blocks from the key layout."""
    nb = 0
    while f'model.1.sub.{nb}.RDB1.conv1.0.weight' in params:
        nb += 1
    return nb


def init_params(nb: int = 6, nf: int = 64, gc: int = 32,
                dtype=jnp.float32) -> Dict:
    """Random params (small nb default keeps offline benchmarks fast)."""
    rs = np.random.RandomState(5)
    params: Dict = {}

    def conv(key, ci, co, k=3):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(k, k, ci, co).astype(np.float32)
            * np.sqrt(0.2 / (k * k * ci)), dtype)
        params[key + '.bias'] = jnp.zeros((co,), dtype)

    conv('model.0', 3, nf)
    for i in range(nb):
        for j in (1, 2, 3):
            pre = f'model.1.sub.{i}.RDB{j}'
            for k in range(1, 6):
                ci = nf + (k - 1) * gc
                co = gc if k < 5 else nf
                conv(f'{pre}.conv{k}.0', ci, co)
    conv(f'model.1.sub.{nb}', nf, nf)
    conv('model.3', nf, nf)
    conv('model.6', nf, nf)
    conv('model.8', nf, nf)
    conv('model.10', nf, 3)
    return params
