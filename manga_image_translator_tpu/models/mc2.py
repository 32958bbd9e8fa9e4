"""manga-colorization-v2 (mc2): FFDNet denoiser + AlacGAN-style colorizer.

Architecture contract (checkpoints generator.zip / net_rgb.pth): reference
``colorization/manga_colorization_v2_utils/`` — FFDNet (space-to-depth +
noise map → 12-layer DnCNN → depth-to-space noise estimate) and the
Generator (SEResNeXt-origin grayscale encoder, 5-channel sketch encoder
pyramid, SE-gated ResNeXt "tunnel" stages with pixel-shuffle upsampling,
tanh output).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, avg_pool2d, relu


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


# --------------------------------------------------------------------------
# FFDNet denoiser
# --------------------------------------------------------------------------

def _space_to_depth2(x: jax.Array) -> jax.Array:
    """(N, H, W, C) → (N, H/2, W/2, 4C) matching FFDNet's
    concatenate_input_noise_map (ref denoising/functions.py:16-55): phase
    idx of input channel k lands at output channel 4k+idx (phases
    INTERLEAVED per channel, idxL order [[0,0],[0,1],[1,0],[1,1]])."""
    n, h, w, c = x.shape
    stacked = jnp.stack([x[:, 0::2, 0::2, :], x[:, 0::2, 1::2, :],
                         x[:, 1::2, 0::2, :], x[:, 1::2, 1::2, :]],
                        axis=-1)                       # (N, h/2, w/2, C, 4)
    return stacked.reshape(n, h // 2, w // 2, c * 4)


def _depth_to_space2(x: jax.Array) -> jax.Array:
    """Inverse (FFDNet upsamplefeatures, ref denoising/functions.py:64-80):
    input channel 4k+idx goes to output channel k at phase idx."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    g = x.reshape(n, h, w, c, 4)
    out = jnp.zeros((n, h * 2, w * 2, c), x.dtype)
    out = out.at[:, 0::2, 0::2, :].set(g[..., 0])
    out = out.at[:, 0::2, 1::2, :].set(g[..., 1])
    out = out.at[:, 1::2, 0::2, :].set(g[..., 2])
    out = out.at[:, 1::2, 1::2, :].set(g[..., 3])
    return out


def ffdnet_rgb_forward(params: Dict, x: jax.Array,
                       noise_sigma: jax.Array) -> jax.Array:
    """x: (N, H, W, 3) in [0,1], even H/W. Returns predicted noise."""
    p = P(params).scope('intermediate_dncnn.itermediate_dncnn')
    down = _space_to_depth2(x)
    n, h, w, _ = down.shape
    noise_map = jnp.broadcast_to(noise_sigma.reshape(-1, 1, 1, 1),
                                 (n, h, w, 3)).astype(x.dtype)
    # noise map comes FIRST (ref functions.py:54 cat((noise_map, down)))
    feat = jnp.concatenate([noise_map, down], axis=-1)  # 15 channels
    # layers: conv,relu, (conv,bn,relu)*10, conv — sequential indices
    feat = relu(p.conv('0', feat, padding=1))
    idx = 2
    for _ in range(10):  # num_conv_layers(12) - 2
        feat = p.conv(str(idx), feat, padding=1)
        feat = p.bn(str(idx + 1), feat)
        feat = relu(feat)
        idx += 3
    feat = p.conv(str(idx), feat, padding=1)  # → 12 channels
    return _depth_to_space2(feat)


def denoise(params: Dict, img: jax.Array, sigma: float) -> jax.Array:
    """clamp(img - predicted_noise) (reference denoiser.py:105-106)."""
    noise = ffdnet_rgb_forward(params, img,
                               jnp.asarray([sigma], jnp.float32))
    return jnp.clip(img - noise, 0.0, 1.0)


# --------------------------------------------------------------------------
# Colorizer generator
# --------------------------------------------------------------------------

def _selayer(p: P, x: jax.Array) -> jax.Array:
    s = x.mean(axis=(1, 2), keepdims=True)
    s = relu(p.conv('conv1', s))
    s = jax.nn.sigmoid(p.conv('conv2', s))
    return x * s


def _resnext_bottleneck(p: P, x: jax.Array, stride: int = 1,
                        cardinality: int = 32, dilate: int = 1) -> jax.Array:
    b = p.conv('conv_reduce', x)
    b = _lrelu(b)
    k = 2 + stride
    b = p.conv('conv_conv', b, stride=stride, padding=dilate,
               dilation=dilate, groups=cardinality)
    b = _lrelu(b)
    b = p.conv('conv_expand', b)
    b = _selayer(p.scope('selayer'), b)
    if stride != 1:
        x = avg_pool2d(x, 2, 2)
    return x + b


def _bottleneck_x_strided(p: P, x: jax.Array, stride: int,
                          cardinality: int = 32) -> jax.Array:
    residual = x
    out = relu(p.bn('bn1', p.conv('conv1', x)))
    out = relu(p.bn('bn2', p.conv('conv2', out, stride=stride, padding=1,
                                  groups=cardinality)))
    out = p.bn('bn3', p.conv('conv3', out))
    out = _selayer(p.scope('selayer'), out)
    if 'downsample.0.weight' in p:
        residual = p.bn('downsample.1',
                        p.conv('downsample.0', x, stride=stride))
    return relu(out + residual)


def _seresnext_encoder(p: P, x: jax.Array):
    """SEResNeXt_Origin [3,4,6,3] grayscale encoder → (x1, x2, x3, x4)."""
    h = p.conv('conv1', x, stride=2, padding=3)
    x1 = relu(p.bn('bn1', h))
    h = x1
    for li, (blocks, stride) in enumerate(
            zip((3, 4, 6), (1, 2, 2)), start=1):
        for b in range(blocks):
            s = stride if b == 0 else 1
            h = _bottleneck_x_strided(p.scope(f'layer{li}.{b}'), h, s)
        if li == 1:
            x2 = h
        elif li == 2:
            x3 = h
    x4 = h
    return x1, x2, x3, x4


def _encoder_block(p: P, x: jax.Array, stride: int) -> jax.Array:
    x = _lrelu(p.conv('0', x, stride=stride, padding=1))
    return _lrelu(p.conv('2', x, padding=1))


def _pixel_shuffle2(x: jax.Array) -> jax.Array:
    """torch nn.PixelShuffle(2) in NHWC (channel-major ordering)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * 2, w * 2, c)


def _tunnel(p: P, x: jax.Array, specs) -> jax.Array:
    """conv+lrelu → ResNeXt blocks → conv → pixelshuffle → lrelu."""
    x = _lrelu(p.conv('0', x, padding=1))
    for i, (card, dilate) in enumerate(specs):
        x = _resnext_bottleneck(p.scope(f'2.{i}'), x, cardinality=card,
                                dilate=dilate)
    x = p.conv('3', x, padding=1)
    return _lrelu(_pixel_shuffle2(x))


_T4 = [(32, 1)] * 20
_T3 = ([(32, 1)] * 2 + [(32, 2)] * 2 + [(32, 4)] * 2 + [(32, 2), (32, 1)])
_T2 = _T3
_T1 = [(16, 1), (16, 2), (16, 4), (16, 2), (16, 1)]


def generator_forward(params: Dict, sketch: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """sketch: (N, H, W, 5) = [gray, 4-ch color hint]; returns
    (colorized (N, H, W, 3) in [-1,1], decoder guide)."""
    p = P(params)
    x0 = _encoder_block(p.scope('to0'), sketch, 1)
    aux = _encoder_block(p.scope('to1'), x0, 2)
    aux = _encoder_block(p.scope('to2'), aux, 2)
    aux = _encoder_block(p.scope('to3'), aux, 2)

    x1, x2, x3, x4 = _seresnext_encoder(p.scope('encoder'),
                                        sketch[..., 0:1])

    out = _tunnel(p.scope('tunnel4'),
                  jnp.concatenate([x4, aux], axis=-1), _T4)
    x = _tunnel(p.scope('tunnel3'),
                jnp.concatenate([out, x3], axis=-1), _T3)
    x = _tunnel(p.scope('tunnel2'),
                jnp.concatenate([x, x2, x1], axis=-1), _T2)

    e = p.scope('exit')
    x = jnp.tanh(e.conv('2', _lrelu(
        e.conv('0', jnp.concatenate([x, x0], axis=-1), padding=1))))

    d = p.scope('deconv_for_decoder')
    g = _lrelu(d.conv_t('0', out, stride=2, padding=1, kernel_size=3,
                        output_padding=1))
    g = _lrelu(d.conv_t('2', g, stride=2, padding=1, kernel_size=3,
                        output_padding=1))
    g = _lrelu(d.conv_t('4', g, stride=1, padding=1, kernel_size=3))
    guide = jnp.tanh(d.conv_t('6', g, stride=1, padding=1, kernel_size=3))
    return x, guide


GENERATOR_TRANSPOSED_PATTERNS = (r'deconv_for_decoder\.[0246]\.weight',)


def init_generator_params(dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(41)
    params: Dict = {}

    def conv(key, kh, kw, ci, co, groups=1, bias=True):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(kh, kw, ci // groups, co).astype(np.float32)
            * np.sqrt(1.0 / (kh * kw * max(ci // groups, 1))), dtype)
        if bias:
            params[key + '.bias'] = jnp.zeros((co,), dtype)

    def bn(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)
        params[key + '.running_mean'] = jnp.zeros((c,), jnp.float32)
        params[key + '.running_var'] = jnp.ones((c,), jnp.float32)

    def se(key, c):
        conv(f'{key}.conv1', 1, 1, c, c // 16)
        conv(f'{key}.conv2', 1, 1, c // 16, c)

    def rnb(key, c, card):
        d = c // 2
        conv(f'{key}.conv_reduce', 1, 1, c, d, bias=False)
        conv(f'{key}.conv_conv', 3, 3, d, d, groups=card, bias=False)
        conv(f'{key}.conv_expand', 1, 1, d, c, bias=False)
        se(f'{key}.selayer', c)

    def enc_block(key, ci, co):
        conv(f'{key}.0', 3, 3, ci, co)
        conv(f'{key}.2', 3, 3, co, co)

    enc_block('to0', 5, 32)
    enc_block('to1', 32, 64)
    enc_block('to2', 64, 92)
    enc_block('to3', 92, 128)
    enc_block('to4', 128, 256)

    # SEResNeXt encoder
    conv('encoder.conv1', 7, 7, 1, 64, bias=False)
    bn('encoder.bn1', 64)
    inplanes = 64
    for li, (blocks, planes, stride) in enumerate(
            zip((3, 4, 6), (64, 128, 256), (1, 2, 2)), start=1):
        for b in range(blocks):
            pre = f'encoder.layer{li}.{b}'
            cin = inplanes if b == 0 else planes * 4
            conv(f'{pre}.conv1', 1, 1, cin, planes * 2, bias=False)
            bn(f'{pre}.bn1', planes * 2)
            conv(f'{pre}.conv2', 3, 3, planes * 2, planes * 2, groups=32,
                 bias=False)
            bn(f'{pre}.bn2', planes * 2)
            conv(f'{pre}.conv3', 1, 1, planes * 2, planes * 4, bias=False)
            bn(f'{pre}.bn3', planes * 4)
            se(f'{pre}.selayer', planes * 4)
            if b == 0 and (stride != 1 or cin != planes * 4):
                conv(f'{pre}.downsample.0', 1, 1, cin, planes * 4,
                     bias=False)
                bn(f'{pre}.downsample.1', planes * 4)
        inplanes = planes * 4

    def tunnel(key, cin, c, specs, cout):
        conv(f'{key}.0', 3, 3, cin, c)
        for i, (card, _d) in enumerate(specs):
            rnb(f'{key}.2.{i}', c, card)
        conv(f'{key}.3', 3, 3, c, cout)

    tunnel('tunnel4', 1024 + 128, 512, _T4, 1024)
    tunnel('tunnel3', 512 + 256, 256, _T3, 512)
    tunnel('tunnel2', 128 + 256 + 64, 128, _T2, 256)

    conv('exit.0', 3, 3, 64 + 32, 32)
    conv('exit.2', 1, 1, 32, 3)

    conv('deconv_for_decoder.0', 3, 3, 256, 128)
    conv('deconv_for_decoder.2', 3, 3, 128, 64)
    conv('deconv_for_decoder.4', 3, 3, 64, 32)
    conv('deconv_for_decoder.6', 3, 3, 32, 3)
    return params


def init_ffdnet_params(dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(43)
    params: Dict = {}
    pre = 'intermediate_dncnn.itermediate_dncnn'

    def conv(key, ci, co):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(3, 3, ci, co).astype(np.float32)
            * np.sqrt(2.0 / (9 * ci)), dtype)

    def bn(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)
        params[key + '.running_mean'] = jnp.zeros((c,), jnp.float32)
        params[key + '.running_var'] = jnp.ones((c,), jnp.float32)

    conv(f'{pre}.0', 15, 96)
    idx = 2
    for _ in range(10):
        conv(f'{pre}.{idx}', 96, 96)
        bn(f'{pre}.{idx + 1}', 96)
        idx += 3
    conv(f'{pre}.{idx}', 96, 12)
    return params
