"""CRAFT text detector (VGG16-BN U-net, region+affinity heatmaps) + RefineNet.

Architecture contract (checkpoints craft_mlt_25k.pth /
craft_refiner_CTW1500.pth): reference ``detection/craft.py:29-97`` +
``craft_utils/vgg16_bn.py`` + ``craft_utils/refiner.py``. Torch key layout
(torchvision vgg16_bn features indices sliced into basenet.slice1..5) is
preserved for mechanical weight conversion.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, interpolate_bilinear, max_pool2d, relu

# torchvision vgg16_bn conv/bn indices per slice.
#
# The reference slices end at a BatchNorm (vgg16_bn.py:30-38), but the NEXT
# slice begins with nn.ReLU(inplace=True) which mutates the captured tap
# tensor in place before CRAFT's U-net concatenates it — so the effective
# taps relu2_2/relu3_2/relu4_3 are POST-relu (verified vs the torch oracle
# in tests/test_model_oracle.py). We therefore end each slice with that
# relu. relu5_3 stays pre-relu: slice5 begins with a maxpool, not a relu.
_SLICE_LAYERS = {
    'slice1': [('conv', 0), ('bn', 1), ('relu',), ('conv', 3), ('bn', 4),
               ('relu',), ('pool', 2, 2, 0), ('conv', 7), ('bn', 8),
               ('relu',), ('conv', 10), ('bn', 11), ('relu',)],
    'slice2': [('pool', 2, 2, 0), ('conv', 14), ('bn', 15),
               ('relu',), ('conv', 17), ('bn', 18), ('relu',)],
    'slice3': [('conv', 20), ('bn', 21), ('relu',),
               ('pool', 2, 2, 0), ('conv', 24), ('bn', 25), ('relu',),
               ('conv', 27), ('bn', 28), ('relu',)],
    'slice4': [('conv', 30), ('bn', 31), ('relu',),
               ('pool', 2, 2, 0), ('conv', 34), ('bn', 35), ('relu',),
               ('conv', 37), ('bn', 38)],
}


def _run_slice(p: P, name: str, x: jax.Array) -> jax.Array:
    for layer in _SLICE_LAYERS[name]:
        kind = layer[0]
        if kind == 'conv':
            x = p.conv(f'{name}.{layer[1]}', x, padding=1)
        elif kind == 'bn':
            x = p.bn(f'{name}.{layer[1]}', x)
        elif kind == 'relu':
            x = relu(x)
        elif kind == 'pool':
            x = max_pool2d(x, layer[1], layer[2], layer[3])
    return x


def _vgg16_bn(p: P, x: jax.Array):
    h = _run_slice(p, 'slice1', x)
    relu2_2 = h
    h = _run_slice(p, 'slice2', h)
    relu3_2 = h
    h = _run_slice(p, 'slice3', h)
    relu4_3 = h
    h = _run_slice(p, 'slice4', h)
    relu5_3 = h
    # slice5: maxpool(3,1,1) + dilated fc6 + fc7
    h = max_pool2d(h, 3, 1, 1)
    h = p.conv('slice5.1', h, padding=6, dilation=6)
    h = p.conv('slice5.2', h)
    return h, relu5_3, relu4_3, relu3_2, relu2_2


def _double_conv(p: P, x: jax.Array) -> jax.Array:
    x = p.conv('conv.0', x)
    x = p.bn('conv.1', x)
    x = relu(x)
    x = p.conv('conv.3', x, padding=1)
    x = p.bn('conv.4', x)
    return relu(x)


def craft_forward(params: Dict, x: jax.Array
                  ) -> Tuple[jax.Array, jax.Array]:
    """x: (N, H, W, 3) imagenet-normalized. Returns (y, feature):
    y (N, H/2, W/2, 2) region+affinity, feature (N, H/2, W/2, 32)."""
    p = P(params)
    bb = p.scope('basenet')
    fc7, r5, r4, r3, r2 = _vgg16_bn(bb, x)

    y = jnp.concatenate([fc7, r5], axis=-1)
    y = _double_conv(p.scope('upconv1'), y)
    y = interpolate_bilinear(y, r4.shape[1:3])
    y = _double_conv(p.scope('upconv2'), jnp.concatenate([y, r4], axis=-1))
    y = interpolate_bilinear(y, r3.shape[1:3])
    y = _double_conv(p.scope('upconv3'), jnp.concatenate([y, r3], axis=-1))
    y = interpolate_bilinear(y, r2.shape[1:3])
    feature = _double_conv(p.scope('upconv4'),
                           jnp.concatenate([y, r2], axis=-1))

    c = p.scope('conv_cls')
    h = relu(c.conv('0', feature, padding=1))
    h = relu(c.conv('2', h, padding=1))
    h = relu(c.conv('4', h, padding=1))
    h = relu(c.conv('6', h))
    out = c.conv('8', h)
    return out, feature


def refiner_forward(params: Dict, y: jax.Array,
                    feature: jax.Array) -> jax.Array:
    """RefineNet: (y, upconv4-feature) → refined link map (N, H, W, 1)."""
    p = P(params)
    x = jnp.concatenate([y, feature], axis=-1)
    lc = p.scope('last_conv')
    x = relu(lc.bn('1', lc.conv('0', x, padding=1)))
    x = relu(lc.bn('4', lc.conv('3', x, padding=1)))
    x = relu(lc.bn('7', lc.conv('6', x, padding=1)))

    def aspp(scope: P, dilation: int) -> jax.Array:
        h = relu(scope.bn('1', scope.conv('0', x, padding=dilation,
                                          dilation=dilation)))
        h = relu(scope.bn('4', scope.conv('3', h)))
        return scope.conv('6', h)

    out = (aspp(p.scope('aspp1'), 6) + aspp(p.scope('aspp2'), 12)
           + aspp(p.scope('aspp3'), 18) + aspp(p.scope('aspp4'), 24))
    return out


def init_params(dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(13)
    params: Dict = {}

    def conv(key, ci, co, k=3, bias=True):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(k, k, ci, co).astype(np.float32)
            * np.sqrt(2.0 / (k * k * ci)), dtype)
        if bias:
            params[key + '.bias'] = jnp.zeros((co,), dtype)

    def bn(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)
        params[key + '.running_mean'] = jnp.zeros((c,), jnp.float32)
        params[key + '.running_var'] = jnp.ones((c,), jnp.float32)

    vgg = [('slice1.0', 3, 64), ('slice1.3', 64, 64), ('slice1.7', 64, 128),
           ('slice1.10', 128, 128), ('slice2.14', 128, 256),
           ('slice2.17', 256, 256), ('slice3.20', 256, 256),
           ('slice3.24', 256, 512), ('slice3.27', 512, 512),
           ('slice4.30', 512, 512), ('slice4.34', 512, 512),
           ('slice4.37', 512, 512)]
    for key, ci, co in vgg:
        conv(f'basenet.{key}', ci, co)
        prefix, idx = key.rsplit('.', 1)
        bn(f'basenet.{prefix}.{int(idx) + 1}', co)
    conv('basenet.slice5.1', 512, 1024)
    conv('basenet.slice5.2', 1024, 1024, k=1)

    ups = [('upconv1', 1536, 512, 256), ('upconv2', 768, 256, 128),
           ('upconv3', 384, 128, 64), ('upconv4', 192, 64, 32)]
    for name, cin, mid, out in ups:
        conv(f'{name}.conv.0', cin, mid, k=1)
        bn(f'{name}.conv.1', mid)
        conv(f'{name}.conv.3', mid, out)
        bn(f'{name}.conv.4', out)

    conv('conv_cls.0', 32, 32)
    conv('conv_cls.2', 32, 32)
    conv('conv_cls.4', 32, 16)
    conv('conv_cls.6', 16, 16, k=1)
    conv('conv_cls.8', 16, 2, k=1)
    return params


def init_refiner_params(dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(17)
    params: Dict = {}

    def conv(key, ci, co, k=3):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(k, k, ci, co).astype(np.float32)
            * np.sqrt(2.0 / (k * k * ci)), dtype)
        params[key + '.bias'] = jnp.zeros((co,), dtype)

    def bn(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)
        params[key + '.running_mean'] = jnp.zeros((c,), jnp.float32)
        params[key + '.running_var'] = jnp.ones((c,), jnp.float32)

    conv('last_conv.0', 34, 64)
    bn('last_conv.1', 64)
    conv('last_conv.3', 64, 64)
    bn('last_conv.4', 64)
    conv('last_conv.6', 64, 64)
    bn('last_conv.7', 64)
    for i in range(1, 5):
        conv(f'aspp{i}.0', 64, 128)
        bn(f'aspp{i}.1', 128)
        conv(f'aspp{i}.3', 128, 128, k=1)
        bn(f'aspp{i}.4', 128)
        conv(f'aspp{i}.6', 128, 1, k=1)
    return params
