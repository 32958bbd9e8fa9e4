"""Minimal pure-Python ncnn model reader + JAX graph evaluator.

The reference's waifu2x backend shells out to waifu2x-ncnn-vulkan
(reference ``upscaling/waifu2x.py:52-105``) with ``-m models-cunet -n 0``:
the executable archive carries ncnn ``.param``/``.bin`` graphs for cunet
and the upconv_7 families, at several noise levels. There is no ncnn
runtime in this environment (and shelling out to a GPU executable is not a
TPU design), so this module reads the format directly — the same approach
as ``utils/onnx_lite`` for the paddle detector — and traces the layer DAG
into one jittable JAX function.

Format notes (ncnn project, param magic 7767517):

* ``.param`` text: ``magic\\nlayer_count blob_count\\n`` then one line per
  layer: ``type name n_in n_out <in blobs> <out blobs> k=v ...``. Integer
  keys are scalar ints/floats; a key ``-233xx`` marks an ARRAY value for
  id ``xx`` written as ``count,v0,v1,...``.
* ``.bin``: for each weight-carrying layer in file order, a uint32 dtype
  tag (0 = fp32) + the weight floats, then (untagged) bias floats when
  bias_term=1. Convolution weights are OIHW; Deconvolution weights IOHW.

Supported layers cover the waifu2x model zoo (upconv_7 = Conv/ReLU chains
+ one Deconvolution; cunet adds Split/Concat/Crop skip plumbing, BinaryOp
residuals and SE blocks = global Pooling + InnerProduct + Sigmoid +
broadcast multiply). Layout inside the evaluator is NHWC (TPU-native);
ncnn's CHW axis conventions (e.g. Concat axis 0 = channels) are mapped
accordingly.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Layer:
    type: str
    name: str
    inputs: List[str]
    outputs: List[str]
    params: Dict[int, object]          # scalar int/float or list
    weights: Dict[str, np.ndarray]

    def p(self, key: int, default=0):
        return self.params.get(key, default)


def _parse_value(tok: str):
    try:
        return int(tok)
    except ValueError:
        return float(tok)


def parse_param(text: str) -> List[Layer]:
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    assert lines[0] == '7767517', 'not an ncnn param file'
    layers: List[Layer] = []
    for ln in lines[2:]:
        parts = ln.split()
        ltype, name = parts[0], parts[1]
        n_in, n_out = int(parts[2]), int(parts[3])
        inputs = parts[4:4 + n_in]
        outputs = parts[4 + n_in:4 + n_in + n_out]
        params: Dict[int, object] = {}
        for item in parts[4 + n_in + n_out:]:
            if '=' not in item:
                continue
            k, v = item.split('=', 1)
            k = int(k)
            if k <= -23300:           # array value: count,v0,v1,...
                vals = v.split(',')
                params[-k - 23300] = [_parse_value(t) for t in vals[1:]]
            else:
                params[k] = _parse_value(v)
        layers.append(Layer(ltype, name, inputs, outputs, params, {}))
    return layers


_WEIGHTED = {'Convolution', 'ConvolutionDepthWise', 'Deconvolution',
             'InnerProduct'}


def load_ncnn(param_path, bin_path) -> List[Layer]:
    """Parse a .param/.bin pair into layers with attached weights."""
    layers = parse_param(Path(param_path).read_text())
    blob = Path(bin_path).read_bytes()
    off = 0
    for layer in layers:
        if layer.type not in _WEIGHTED:
            continue
        wsize = int(layer.p(6 if layer.type != 'InnerProduct' else 2))
        tag = np.frombuffer(blob, np.uint32, 1, off)[0]
        assert tag == 0, (f'{layer.name}: non-fp32 ncnn weights '
                          f'(tag {tag})')
        off += 4
        w = np.frombuffer(blob, np.float32, wsize, off).copy()
        off += 4 * wsize
        layer.weights['weight'] = w
        n_out = int(layer.p(0))
        if layer.p(5 if layer.type != 'InnerProduct' else 1, 0):
            layer.weights['bias'] = np.frombuffer(blob, np.float32, n_out,
                                                  off).copy()
            off += 4 * n_out
        else:
            layer.weights['bias'] = np.zeros((n_out,), np.float32)
    return layers


def _activation(x, act_type: int, act_params):
    if act_type == 0:
        return x
    if act_type == 1:
        return jnp.maximum(x, 0)
    if act_type == 2:
        slope = float(act_params[0]) if act_params else 0.0
        return jnp.where(x >= 0, x, slope * x)
    if act_type == 4:
        return jax.nn.sigmoid(x)
    raise NotImplementedError(f'ncnn activation {act_type}')


def _conv(layer: Layer, x):
    n_out = int(layer.p(0))
    kw = int(layer.p(1, 3))
    kh = int(layer.p(11, kw))
    dil = int(layer.p(2, 1))
    stride = int(layer.p(3, 1))
    pad = int(layer.p(4, 0))
    w = layer.weights['weight']
    n_in = x.shape[-1]
    groups = int(layer.p(7, 1)) if layer.type == 'ConvolutionDepthWise' \
        else 1
    w = w.reshape(n_out, n_in // groups, kh, kw).transpose(2, 3, 1, 0)
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride),
        [(pad, pad), (pad, pad)], rhs_dilation=(dil, dil),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y + jnp.asarray(layer.weights['bias']).astype(x.dtype)
    return _activation(y, int(layer.p(9, 0)), layer.p(10, []))


def _deconv(layer: Layer, x):
    n_out = int(layer.p(0))
    kw = int(layer.p(1, 3))
    kh = int(layer.p(11, kw))
    stride = int(layer.p(3, 1))
    pad = int(layer.p(4, 0))
    w = layer.weights['weight']
    n_in = x.shape[-1]
    # ncnn deconv stores IOHW → HWIO for transpose_kernel=True
    w = w.reshape(n_in, n_out, kh, kw).transpose(2, 3, 1, 0)
    y = jax.lax.conv_transpose(
        x, jnp.asarray(w), (stride, stride), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), transpose_kernel=True)
    if pad:
        y = y[:, pad:y.shape[1] - pad, pad:y.shape[2] - pad, :]
    y = y + jnp.asarray(layer.weights['bias']).astype(x.dtype)
    return _activation(y, int(layer.p(9, 0)), layer.p(10, []))


def _crop(layer: Layer, blobs: Sequence[jax.Array]):
    x = blobs[0]
    woff = int(layer.p(0, 0))
    hoff = int(layer.p(1, 0))
    coff = int(layer.p(2, 0))
    if len(blobs) > 1:                  # crop to reference blob's H, W
        ref = blobs[1]
        outh, outw = ref.shape[1], ref.shape[2]
        outc = x.shape[3] - coff
    else:
        outw = int(layer.p(3, 0)) or x.shape[2] - 2 * woff
        outh = int(layer.p(4, 0)) or x.shape[1] - 2 * hoff
        outc = int(layer.p(5, 0)) or x.shape[3] - coff
    return x[:, hoff:hoff + outh, woff:woff + outw, coff:coff + outc]


def _binary_op(layer: Layer, blobs: Sequence[jax.Array]):
    op = int(layer.p(0, 0))
    a, b = blobs[0], blobs[1]
    # ncnn broadcasts a per-channel (c,1,1) operand over (c,h,w); in NHWC
    # that's (1, 1, 1, C) against (N, H, W, C) — reshape flat C operands
    if a.ndim != b.ndim:
        small, big = (a, b) if a.ndim < b.ndim else (b, a)
        small = small.reshape((1,) * (big.ndim - 1) + (small.shape[-1],))
        a, b = (small, big) if blobs[0].ndim < blobs[1].ndim else (big,
                                                                   small)
    if op == 0:
        return a + b
    if op == 1:
        return a - b
    if op == 2:
        return a * b
    if op == 3:
        return a / b
    if op == 4:
        return jnp.maximum(a, b)
    raise NotImplementedError(f'ncnn BinaryOp {op}')


def run_graph(layers: List[Layer], x: jax.Array) -> jax.Array:
    """Execute the layer DAG on an NHWC input; returns the last blob."""
    blobs: Dict[str, jax.Array] = {}
    out = x
    for layer in layers:
        t = layer.type
        if t == 'Input':
            blobs[layer.outputs[0]] = x
            out = x
            continue
        ins = [blobs[n] for n in layer.inputs]
        if t in ('Convolution', 'ConvolutionDepthWise'):
            out = _conv(layer, ins[0])
        elif t == 'Deconvolution':
            out = _deconv(layer, ins[0])
        elif t == 'ReLU':
            slope = float(layer.p(0, 0.0))
            out = (jnp.maximum(ins[0], 0) if slope == 0.0
                   else jnp.where(ins[0] >= 0, ins[0], slope * ins[0]))
        elif t == 'Sigmoid':
            out = jax.nn.sigmoid(ins[0])
        elif t == 'Split':
            for o in layer.outputs:
                blobs[o] = ins[0]
            out = ins[0]
            continue
        elif t == 'Concat':
            axis = int(layer.p(0, 0))   # ncnn CHW: 0 = channels
            out = jnp.concatenate(ins, axis=3 if axis == 0 else axis)
        elif t == 'Crop':
            out = _crop(layer, ins)
        elif t == 'BinaryOp':
            out = _binary_op(layer, ins)
        elif t == 'Pooling':
            ptype = int(layer.p(0, 0))
            if int(layer.p(4, 0)):      # global pooling -> (N, C)
                out = (ins[0].max(axis=(1, 2)) if ptype == 0
                       else ins[0].mean(axis=(1, 2)))
            else:
                k = int(layer.p(1, 2))
                s = int(layer.p(2, k))
                red = jax.lax.reduce_window(
                    ins[0], -jnp.inf if ptype == 0 else 0.0,
                    jax.lax.max if ptype == 0 else jax.lax.add,
                    (1, k, k, 1), (1, s, s, 1), 'VALID')
                out = red if ptype == 0 else red / (k * k)
        elif t == 'InnerProduct':
            n_out = int(layer.p(0))
            w = layer.weights['weight'].reshape(n_out, -1)
            v = ins[0].reshape(ins[0].shape[0], -1)
            out = v @ jnp.asarray(w.T) + jnp.asarray(layer.weights['bias'])
            out = _activation(out, int(layer.p(9, 0)), layer.p(10, []))
        elif t == 'Interp':
            # bilinear/nearest resize (param 0: 1 nearest, 2 bilinear;
            # 1/2: h/w scale factors)
            mode = int(layer.p(0, 1))
            sh = float(layer.p(1, 1.0))
            sw = float(layer.p(2, 1.0))
            n, h, w, c = ins[0].shape
            out = jax.image.resize(
                ins[0], (n, int(round(h * sh)), int(round(w * sw)), c),
                method='nearest' if mode == 1 else 'linear')
        else:
            raise NotImplementedError(f'ncnn layer type {t}')
        blobs[layer.outputs[0]] = out
    return out


def make_forward(layers: List[Layer]):
    """Returns a jittable ``fn(x_nhwc) -> y_nhwc`` tracing the DAG."""
    def fn(x):
        return run_graph(layers, x)
    return fn


# --- waifu2x model-zoo file layout --------------------------------------

def model_relpath(family: str, noise: int, scale: int) -> str:
    """Relative path of a waifu2x ncnn model inside the release archive
    (reference executable flags: ``-m models-<family> -n <noise>
    -s <scale>``)."""
    folders = {
        'cunet': 'models-cunet',
        'upconv_7_anime': 'models-upconv_7_anime_style_art_rgb',
        'upconv_7_photo': 'models-upconv_7_photo',
    }
    folder = folders[family]
    if noise < 0:
        stem = f'scale{scale}.0x_model'
    elif scale <= 1:
        stem = f'noise{noise}_model'
    else:
        stem = f'noise{noise}_scale{scale}.0x_model'
    return f'{folder}/{stem}'
