"""DBNet-ResNet34 text detector — the 'default' detector's network.

Architecture contract (for checkpoint parity with ``detect-20241225.ckpt``):
reference ``detection/default_utils/DBNet_resnet34.py:76-125`` — torchvision
resnet34 backbone, three extra stride-2 double-conv downs, seven transposed-
conv ups with U-Net skips, a DB head (shrink + threshold maps, at 1/4 input
feeding 4× upsampling heads) and a pixel-mask head at 1/2 input.

TPU-native: pure function over the flat torch-keyed params, NHWC layout,
bf16-friendly (fp32 accumulation inside convs), fully jittable — the whole
page forward is one XLA program.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .functional import (
    P,
    avg_pool2d,
    max_pool2d,
    relu,
    sigmoid,
)

# ResNet-34 stage definition: (num_blocks, channels)
_RESNET34_STAGES = ((3, 64), (4, 128), (6, 256), (3, 512))


def _basic_block(p: P, x: jax.Array, stride: int) -> jax.Array:
    identity = x
    out = p.conv('conv1', x, stride=stride, padding=1)
    out = p.bn('bn1', out)
    out = relu(out)
    out = p.conv('conv2', out, padding=1)
    out = p.bn('bn2', out)
    if 'downsample.0.weight' in p:
        identity = p.conv('downsample.0', x, stride=stride)
        identity = p.bn('downsample.1', identity)
    return relu(out + identity)


def resnet34_features(p: P, x: jax.Array):
    """Returns (h4, h8, h16, h32) pyramid features."""
    x = p.conv('conv1', x, stride=2, padding=3)
    x = p.bn('bn1', x)
    x = relu(x)
    x = max_pool2d(x, 3, 2, 1)
    feats = []
    for li, (blocks, _ch) in enumerate(_RESNET34_STAGES, start=1):
        for bi in range(blocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = _basic_block(p.scope(f'layer{li}.{bi}'), x, stride)
        feats.append(x)
    return tuple(feats)


def _double_conv(p: P, x: jax.Array, down: bool) -> jax.Array:
    """reference double_conv (DBNet_resnet34.py:22-52): optional stride-2
    avg-pool then 3× (conv3x3 + BN + ReLU)."""
    if down:
        x = avg_pool2d(x, 2, 2)
    for i, idx in enumerate((0, 3, 6)):
        x = p.conv(f'conv.{idx}', x, padding=1)
        x = p.bn(f'conv.{idx + 1}', x)
        x = relu(x)
    return x


def _double_conv_up(p: P, x: jax.Array) -> jax.Array:
    """reference double_conv_up (:54-74): 2× (conv3x3+BN+ReLU) then
    4×4 stride-2 transposed conv + BN + ReLU."""
    x = p.conv('conv.0', x, padding=1)
    x = p.bn('conv.1', x)
    x = relu(x)
    x = p.conv('conv.3', x, padding=1)
    x = p.bn('conv.4', x)
    x = relu(x)
    x = p.conv_t('conv.6', x, stride=2, padding=1, kernel_size=4)
    x = p.bn('conv.7', x)
    return relu(x)


def _head_pack() -> bool:
    """Head-only phase packing — MEASURED NEGATIVE on v5e (r4,
    dbnet_deconv_ab): batch-4 57.0 vs 55.0 ms, batch-8 neutral. Second
    falsification of the 128-lane output-padding theory (the all-net pack
    regressed 26% in the same harness): XLA's native transposed-conv
    lowering evidently does NOT pay the padded-lane cost for low-N heads
    the way the HLO structure suggested. Default stays OFF; the torch-
    exact rewrite is kept behind the flag for other archs/shapes."""
    import os
    return os.environ.get('MIT_TPU_DBHEAD_PACK', '0') == '1'


def _db_head(p: P, x: jax.Array) -> jax.Array:
    """DBHead (DBHead.py:7-33), inference path: concat(shrink, thresh)."""
    pk = _head_pack()
    b = p.scope('binarize')
    s = b.conv('0', x, padding=1)
    s = b.bn('1', s)
    s = relu(s)
    s = b.conv_t('3', s, stride=2, padding=1, kernel_size=4, pack=pk)
    s = b.bn('4', s)
    s = relu(s)
    shrink = b.conv_t('6', s, stride=2, padding=1, kernel_size=4, pack=pk)

    t = p.scope('thresh')
    v = t.conv('0', x, padding=1)
    v = t.bn('1', v)
    v = relu(v)
    v = t.conv_t('3', v, stride=2, padding=1, kernel_size=4, pack=pk)
    v = t.bn('4', v)
    v = relu(v)
    thresh = sigmoid(t.conv_t('6', v, stride=2, padding=1, kernel_size=4,
                              pack=pk))
    return jnp.concatenate([shrink, thresh], axis=-1)


def _mask_head(p: P, x: jax.Array) -> jax.Array:
    x = p.conv('0', x, padding=1)
    x = relu(x)
    x = p.conv('2', x, padding=1)
    x = relu(x)
    x = p.conv('4', x, padding=1)
    x = relu(x)
    return sigmoid(p.conv('6', x))


def dbnet_forward(params: dict, x: jax.Array
                  ) -> Tuple[jax.Array, jax.Array]:
    """Full detector forward.

    Args:
      params: flat torch-keyed dict (see torch_loader).
      x: (N, H, W, 3) float input normalized to [-1, 1] (x/127.5 - 1,
         reference detection/default.py:19).
    Returns:
      db:   (N, H, W, 2) — raw shrink logits + sigmoided threshold map
            (head input is at H/4; its two 2x transposed convs restore
            full res, reference DBHead.py:7-33).
      mask: (N, H/2, W/2, 1) — text pixel mask, sigmoided.
    """
    from .functional import conv_out_native
    with conv_out_native():
        return _dbnet_forward_body(params, x)


def _dbnet_forward_body(params: dict, x: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    p = P(params)
    bb = p.scope('backbone')
    h4, h8, h16, h32 = resnet34_features(bb, x)
    h64 = _double_conv(p.scope('down_conv1'), h32, down=True)
    h128 = _double_conv(p.scope('down_conv2'), h64, down=True)
    h256 = _double_conv(p.scope('down_conv3'), h128, down=True)

    up256 = _double_conv_up(p.scope('upconv1'), h256)
    up128 = _double_conv_up(p.scope('upconv2'),
                            jnp.concatenate([up256, h128], axis=-1))
    up64 = _double_conv_up(p.scope('upconv3'),
                           jnp.concatenate([up128, h64], axis=-1))
    up32 = _double_conv_up(p.scope('upconv4'),
                           jnp.concatenate([up64, h32], axis=-1))
    up16 = _double_conv_up(p.scope('upconv5'),
                           jnp.concatenate([up32, h16], axis=-1))
    up8 = _double_conv_up(p.scope('upconv6'),
                          jnp.concatenate([up16, h8], axis=-1))
    up4 = _double_conv_up(p.scope('upconv7'),
                          jnp.concatenate([up8, h4], axis=-1))

    db = _db_head(p.scope('conv_db'), up8)
    mask = _mask_head(p.scope('conv_mask'), up4)
    return db, mask


# Conversion spec: transposed convs inside up blocks and both DB-head stacks.
TRANSPOSED_CONV_PATTERNS = (
    r'upconv\d+\.conv\.6\.weight',
    r'conv_db\.(binarize|thresh)\.[36]\.weight',
)


def init_params(rng: jax.Array, dtype=jnp.float32) -> dict:
    """Random init with the exact checkpoint key/shape layout (for tests and
    benchmarking without the released checkpoint)."""
    import numpy as np
    rs = np.random.RandomState(0)
    params = {}

    def conv(key, kh, kw, cin, cout, bias=False):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(kh, kw, cin, cout).astype(np.float32)
            * np.sqrt(2.0 / (kh * kw * cin)), dtype)
        if bias:
            params[key + '.bias'] = jnp.zeros((cout,), dtype)

    def bn(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)
        params[key + '.running_mean'] = jnp.zeros((c,), jnp.float32)
        params[key + '.running_var'] = jnp.ones((c,), jnp.float32)

    # backbone
    conv('backbone.conv1', 7, 7, 3, 64)
    bn('backbone.bn1', 64)
    cin = 64
    for li, (blocks, ch) in enumerate(_RESNET34_STAGES, start=1):
        for bi in range(blocks):
            pre = f'backbone.layer{li}.{bi}'
            stride_in = cin if bi == 0 else ch
            conv(f'{pre}.conv1', 3, 3, stride_in, ch)
            bn(f'{pre}.bn1', ch)
            conv(f'{pre}.conv2', 3, 3, ch, ch)
            bn(f'{pre}.bn2', ch)
            if bi == 0 and li > 1:
                conv(f'{pre}.downsample.0', 1, 1, stride_in, ch)
                bn(f'{pre}.downsample.1', ch)
        cin = ch

    def double_conv(key, in_ch, mid, out):
        conv(f'{key}.conv.0', 3, 3, in_ch + mid, mid)
        bn(f'{key}.conv.1', mid)
        conv(f'{key}.conv.3', 3, 3, mid, mid)
        bn(f'{key}.conv.4', mid)
        conv(f'{key}.conv.6', 3, 3, mid, out)
        bn(f'{key}.conv.7', out)

    def double_conv_up(key, in_ch, mid, out):
        conv(f'{key}.conv.0', 3, 3, in_ch + mid, mid)
        bn(f'{key}.conv.1', mid)
        conv(f'{key}.conv.3', 3, 3, mid, mid)
        bn(f'{key}.conv.4', mid)
        conv(f'{key}.conv.6', 4, 4, mid, out)  # transposed, stored HWIO
        bn(f'{key}.conv.7', out)

    double_conv('down_conv1', 0, 512, 512)
    double_conv('down_conv2', 0, 512, 512)
    double_conv('down_conv3', 0, 512, 512)
    double_conv_up('upconv1', 0, 512, 256)
    double_conv_up('upconv2', 256, 512, 256)
    double_conv_up('upconv3', 256, 512, 256)
    double_conv_up('upconv4', 256, 512, 256)
    double_conv_up('upconv5', 256, 256, 128)
    double_conv_up('upconv6', 128, 128, 64)
    double_conv_up('upconv7', 64, 64, 64)

    # heads
    # bias layout mirrors the reference DBHead: thresh.0 is bias-free
    # (DBHead.py:48 bias=False), all ConvTranspose layers keep default bias.
    for head in ('binarize', 'thresh'):
        conv(f'conv_db.{head}.0', 3, 3, 64, 16, bias=(head == 'binarize'))
        bn(f'conv_db.{head}.1', 16)
        conv(f'conv_db.{head}.3', 4, 4, 16, 16, bias=True)
        bn(f'conv_db.{head}.4', 16)
        conv(f'conv_db.{head}.6', 4, 4, 16, 1, bias=True)
    conv('conv_mask.0', 3, 3, 64, 64, bias=True)
    conv('conv_mask.2', 3, 3, 64, 64, bias=True)
    conv('conv_mask.4', 3, 3, 64, 32, bias=True)
    conv('conv_mask.6', 1, 1, 32, 1, bias=True)
    return params
