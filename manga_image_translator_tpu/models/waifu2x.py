"""waifu2x upconv_7 super-resolution in JAX + ncnn weight parsing.

The reference's 'waifu2x' upscaler shells out to the waifu2x-ncnn-vulkan
executable (upscaling/waifu2x.py:52-105), whose 2x anime-style model is
the classic upconv_7 network: seven 3x3 VALID convolutions with
LeakyReLU(0.1) feeding a 4x4 stride-2 deconvolution (upconv_7 consumes a
7-pixel context border). Weights ship as ncnn .param/.bin pairs inside
the executable archive; `load_ncnn_upconv7` parses that format directly
(plain-text layer list + packed fp32 blobs) so the same artifacts drive
this JAX forward.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, in_channels) per conv layer of upconv_7: six 3x3 convs
# then the 4x4 stride-2 deconvolution (256 -> 3)
UPCONV7_CHANNELS = [(16, 3), (32, 16), (64, 32), (128, 64), (128, 128),
                    (256, 128)]
CONTEXT = 7  # VALID convs + deconv crop eat a 7-px border


def upconv7_forward(params: Dict, x: jax.Array) -> jax.Array:
    """(N, H+14, W+14, 3) float [0,1] context-padded input →
    (N, 2H, 2W, 3). Weights in HWIO (converted by load_ncnn_upconv7)."""
    for i in range(6):
        w = params[f'conv{i}.weight'].astype(x.dtype)
        b = params[f'conv{i}.bias'].astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(x.dtype) + b
        x = jnp.where(x >= 0, x, 0.1 * x)
    # deconv 4x4 stride 2 pad 3 (torch ConvTranspose2d semantics):
    # transposed conv then crop 3 px per side
    # kernel stored (kh, kw, out, in): with transpose_kernel=True the
    # I/O positions of the dn spec are swapped internally
    w = params['deconv.weight'].astype(x.dtype)
    b = params['deconv.bias'].astype(x.dtype)
    y = jax.lax.conv_transpose(
        x, w, (2, 2), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        transpose_kernel=True)
    y = y[:, 3:-3, 3:-3, :] + b
    return y


def _parse_param(text: str) -> List[Tuple[str, str, Dict[int, int]]]:
    """ncnn .param → [(layer_type, name, {id: value})] (magic 7767517)."""
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    assert lines[0] == '7767517', 'not an ncnn param file'
    layers = []
    for ln in lines[2:]:
        parts = ln.split()
        ltype, name = parts[0], parts[1]
        nin, nout = int(parts[2]), int(parts[3])
        rest = parts[4 + nin + nout:]
        kv = {}
        for item in rest:
            if '=' in item:
                k, v = item.split('=', 1)
                try:
                    kv[int(k)] = int(v)
                except ValueError:
                    pass
        layers.append((ltype, name, kv))
    return layers


def load_ncnn_upconv7(param_path: str, bin_path: str) -> Dict:
    """Parse an upconv_7 ncnn model into JAX params (HWIO weights).

    ncnn bin layout per (De)Convolution layer: uint32 dtype tag (0 = raw
    fp32) + weight_data_size floats + bias floats."""
    layers = _parse_param(Path(param_path).read_text())
    blob = Path(bin_path).read_bytes()
    off = 0
    params: Dict = {}
    conv_idx = 0
    for ltype, name, kv in layers:
        if ltype not in ('Convolution', 'Deconvolution'):
            continue
        n_out = kv[0]
        k = kv.get(1, 3)
        wsize = kv[6]
        tag = np.frombuffer(blob, np.uint32, 1, off)[0]
        assert tag == 0, f'{name}: non-fp32 ncnn weights (tag {tag})'
        off += 4
        w = np.frombuffer(blob, np.float32, wsize, off).copy()
        off += 4 * wsize
        n_in = wsize // (n_out * k * k)
        if kv.get(5, 0):
            b = np.frombuffer(blob, np.float32, n_out, off).copy()
            off += 4 * n_out
        else:
            b = np.zeros((n_out,), np.float32)
        if ltype == 'Convolution':
            # ncnn stores OIHW → HWIO
            w = w.reshape(n_out, n_in, k, k).transpose(2, 3, 1, 0)
            params[f'conv{conv_idx}.weight'] = jnp.asarray(w)
            params[f'conv{conv_idx}.bias'] = jnp.asarray(b)
            conv_idx += 1
        else:
            # ncnn deconv stores IOHW (input-major) → HWIO for
            # conv_transpose(transpose_kernel=True)
            w = w.reshape(n_in, n_out, k, k).transpose(2, 3, 1, 0)
            params['deconv.weight'] = jnp.asarray(w)
            params['deconv.bias'] = jnp.asarray(b)
    assert conv_idx == 6, f'expected 6 convolutions, got {conv_idx}'
    assert 'deconv.weight' in params, 'missing deconvolution layer'
    return params


def init_params(seed: int = 0) -> Dict:
    """Random upconv_7 params (offline fallback / tests)."""
    rs = np.random.RandomState(seed)
    params: Dict = {}
    for i, (co, ci) in enumerate(UPCONV7_CHANNELS):
        params[f'conv{i}.weight'] = jnp.asarray(
            rs.randn(3, 3, ci, co).astype(np.float32)
            * np.sqrt(2.0 / (9 * ci)))
        params[f'conv{i}.bias'] = jnp.zeros((co,), jnp.float32)
    params['deconv.weight'] = jnp.asarray(
        rs.randn(4, 4, 3, 256).astype(np.float32) * 0.1)
    params['deconv.bias'] = jnp.zeros((3,), jnp.float32)
    return params
