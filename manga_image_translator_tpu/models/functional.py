"""Pure-functional NN primitives with PyTorch-compatible semantics.

Design: inference models in this framework are pure functions over a FLAT
parameter dict keyed by the original PyTorch state-dict names (weights are
converted once by :mod:`.torch_loader`). This makes checkpoint conversion
mechanical and auditable, keeps everything a plain JAX pytree for jit/pjit,
and avoids framework-module overhead on the hot path.

All spatial ops are NHWC (TPU-native layout). Padding is always explicit so
stride-2 convolutions match torch's symmetric padding (XLA 'SAME' pads
asymmetrically for even sizes and would break checkpoint parity).
"""
from __future__ import annotations

import contextvars
import functools
import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Params = dict

_DN = ('NHWC', 'HWIO', 'NHWC')


# ContextVar, not a module global: model graphs may be traced concurrently
# from different threads (e.g. LaMa crop buckets while a detector retraces),
# and a leaked scope would silently flip another model's measured-faster
# conv-output preference (perf-only — results are identical either way).
_CONV_OUT_NATIVE_SCOPE = contextvars.ContextVar('conv_out_native',
                                                default=False)


class conv_out_native:
    """Trace-time scope requesting native-dtype conv outputs for the model
    graphs inside it. The global A/B (r3) measured f32-preferred faster for
    LaMa/OCR, but DBNet measured the opposite (r4 dbnet_convout_ab: 54.3
    vs 55.6/58.0 ms/4-page batch; xprof showed 13.2 ms/batch of unfused
    f32->bf16 converts at DBNet's full-res shapes) — so the choice is
    per-model, not global. Results are identical either way (the MXU
    accumulates f32; only the convert's location changes)."""

    def __enter__(self):
        self._token = _CONV_OUT_NATIVE_SCOPE.set(True)

    def __exit__(self, *exc):
        _CONV_OUT_NATIVE_SCOPE.reset(self._token)


def _conv_out_type(x: Array):
    """Accumulation/output dtype request for convs.

    Default: ask XLA for the f32 accumulator then round to the input dtype
    (one explicit convert; MXU accumulates f32 either way so results are
    identical). MIT_TPU_CONV_NATIVE_OUT=1 (global, read at trace time) or
    an enclosing `conv_out_native()` scope requests the input dtype
    directly."""
    if _CONV_OUT_NATIVE_SCOPE.get():
        return x.dtype
    if os.environ.get('MIT_TPU_CONV_NATIVE_OUT', '0') == '1':
        return None
    return jnp.float32


def _conv_nobias(x: Array, w: Array, stride: Tuple[int, int],
                 pad: Sequence[Tuple[int, int]], dilation: int = 1) -> Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), stride, list(pad),
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN,
        preferred_element_type=_conv_out_type(x)).astype(x.dtype)


def _reflect_conv_banded(x: Array, w: Array, stride: int, p: int,
                         dilation: int = 1) -> Array:
    """Reflect-pad conv as one fused ZERO-pad conv + border-band recompute.

    XLA fuses zero padding into the convolution itself, but a reflect pad
    (``jnp.pad(mode='reflect')``) materializes a full padded copy of the
    input through HBM — measured ~3 ms extra for LaMa's first stride-2
    downsample at 1536² (devscripts/profiling/reflect_pad_probe.py). Only
    the output rows/cols whose receptive field touches the padding differ
    between the two, so: run the big conv with fused zero padding, then
    overwrite the thin border bands with exact small convs over
    reflect-padded strips. Same math per pixel; border strips are tiny.
    """
    n, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    ke = (kh - 1) * dilation + 1          # effective (dilated) extent
    s = stride
    out_h = (h + 2 * p - ke) // s + 1
    out_w = (wd + 2 * p - ke) // s + 1
    y = _conv_nobias(x, w, (s, s), [(p, p), (p, p)], dilation)

    # top band: output rows r with s*r < p
    rt = -(-p // s)
    # bottom band: output rows r with s*r - p + ke - 1 >= h
    rb0 = max(-(-(h + p - ke + 1) // s), rt)
    nb = out_h - rb0
    # left/right bands (same formulas over columns)
    cl = -(-p // s)
    cr0 = max(-(-(wd + p - ke + 1) // s), cl)
    nr = out_w - cr0

    if rt > 0:
        strip = x[:, :s * (rt - 1) + ke - p]
        strip = jnp.pad(strip, ((0, 0), (p, 0), (p, p), (0, 0)),
                        mode='reflect')
        y = y.at[:, :rt].set(_conv_nobias(strip, w, (s, s),
                                          [(0, 0), (0, 0)], dilation))
    if nb > 0:
        strip = x[:, s * rb0 - p:]
        strip = jnp.pad(strip, ((0, 0), (0, p), (p, p), (0, 0)),
                        mode='reflect')
        y = y.at[:, rb0:].set(_conv_nobias(strip, w, (s, s),
                                           [(0, 0), (0, 0)], dilation))
    if cl > 0 and rb0 > rt:
        strip = x[:, s * rt - p:s * (rb0 - 1) + ke - p,
                  :s * (cl - 1) + ke - p]
        strip = jnp.pad(strip, ((0, 0), (0, 0), (p, 0), (0, 0)),
                        mode='reflect')
        y = y.at[:, rt:rb0, :cl].set(_conv_nobias(strip, w, (s, s),
                                                  [(0, 0), (0, 0)],
                                                  dilation))
    if nr > 0 and rb0 > rt:
        strip = x[:, s * rt - p:s * (rb0 - 1) + ke - p, s * cr0 - p:]
        strip = jnp.pad(strip, ((0, 0), (0, 0), (0, p), (0, 0)),
                        mode='reflect')
        y = y.at[:, rt:rb0, cr0:].set(_conv_nobias(strip, w, (s, s),
                                                   [(0, 0), (0, 0)],
                                                   dilation))
    return y


def _reflect_fast_ok(x: Array, w: Array, padding, dilation: int,
                     groups: int) -> bool:
    # Default OFF: the banded path's original "neutral" TPU A/B was invalid
    # (both arms lazily traced the same graph); the bench-harness evidence
    # (146 vs 104 ms LaMa-18 @1536 against the pre-banded source) points to
    # a real regression. Opt-in until the eager-trace A/B proves otherwise;
    # it remains valuable for batched inpainting (removes the 304 MB
    # padded-copy peak).
    if os.environ.get('MIT_TPU_REFLECT_FAST', '0') != '1':
        return False
    kh, kw = w.shape[0], w.shape[1]
    ke = (kh - 1) * dilation + 1
    p = padding[0]
    return (padding[0] == padding[1] and groups == 1
            and kh == kw and ke >= 2 * p + 1
            and x.shape[1] >= ke + p and x.shape[2] >= ke + p)


def conv2d(x: Array, w: Array, b: Optional[Array] = None, stride: int = 1,
           padding: Union[int, Tuple[int, int]] = 0, dilation: int = 1,
           groups: int = 1, pad_mode: str = 'zeros') -> Array:
    """torch.nn.functional.conv2d equivalent; w is HWIO.

    ``pad_mode='reflect'`` matches torch Conv2d(padding_mode='reflect').
    """
    if isinstance(padding, int):
        padding = (padding, padding)
    if pad_mode == 'reflect' and (padding[0] or padding[1]):
        if _reflect_fast_ok(x, w, padding, dilation, groups):
            out = _reflect_conv_banded(x, w, stride, padding[0], dilation)
            if b is not None:
                out = out + b.astype(x.dtype)
            return out
        x = jnp.pad(x, ((0, 0), (padding[0], padding[0]),
                        (padding[1], padding[1]), (0, 0)), mode='reflect')
        pad = [(0, 0), (0, 0)]
    else:
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), pad,
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=_conv_out_type(x)).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def conv_transpose2d(x: Array, w: Array, b: Optional[Array] = None,
                     stride: int = 2, padding: int = 1,
                     kernel_size: int = 4, output_padding: int = 0) -> Array:
    """torch.nn.ConvTranspose2d(k, s, p, output_padding) equivalent.

    ``w`` is stored HWIO *post conversion* (torch IOHW → flip spatial + HWIO,
    handled by torch_loader), so this reduces to an input-dilated conv:
    insert (s-1) zeros between pixels, pad by (k - 1 - p) (+output_padding on
    the bottom/right), then a VALID conv.
    """
    k = kernel_size
    pad = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(pad, pad + output_padding), (pad, pad + output_padding)],
        lhs_dilation=(stride, stride), dimension_numbers=_DN,
        preferred_element_type=_conv_out_type(x)).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _deconv_pack_plan(k: int, s: int, padding: int):
    """Phase decomposition of a 1-D transposed conv (k, s, p).

    Output phase dy in [0, s) reads input taps x[a + o] with kernel rows
    kh = c0 + s*t (c0 = (pad_eff - dy) mod s, pad_eff = k-1-padding),
    at offsets o = (dy + c0 - pad_eff)/s + t. Returns per-phase
    (kh taps, offsets) plus the common packed kernel extent."""
    pad_eff = k - 1 - padding
    phases = []
    for dy in range(s):
        c0 = (pad_eff - dy) % s
        khs = list(range(c0, k, s))
        offs = [(dy + kh - pad_eff) // s for kh in khs]
        phases.append((khs, offs))
    all_offs = [o for _, offs in phases for o in offs]
    omin, omax = min(all_offs), max(all_offs)
    return phases, omin, omax - omin + 1


def conv_transpose2d_packed(x: Array, w: Array, b: Optional[Array] = None,
                            stride: int = 2, padding: int = 1,
                            kernel_size: int = 4,
                            output_padding: int = 0) -> Array:
    """conv_transpose2d as ONE stride-1 conv producing the s*s output
    phases as channels + depth-to-space.

    XLA lowers a transposed conv as an input-dilated conv at OUTPUT
    resolution with the output channels padded to the 128 MXU lanes —
    for DBNet's 4x4/s2 heads (N=1..64 out channels at up to full page
    res) that wastes both the s^2 spatial factor and the lane padding.
    The packed form runs at INPUT resolution with s^2*N output channels:
    same contractions per output element (plus exact zeros), so results
    match up to f32 accumulation order.

    Requires k - 2*padding + output_padding == stride (output tiles
    evenly; true for every strided transposed conv in this repo: 4/2/1,
    2/2/0 and 3/2/1+op1). output_padding only extends the zero margin the
    bottom/right phases read — the phase plan is unchanged.
    """
    s = stride
    k = kernel_size
    ci, co = w.shape[2], w.shape[3]
    phases, omin, kp = _deconv_pack_plan(k, s, padding)
    wp = jnp.zeros((kp, kp, ci, co * s * s), w.dtype)
    for dy in range(s):
        khs_y, offs_y = phases[dy]
        for dx in range(s):
            khs_x, offs_x = phases[dx]
            ch0 = (dy * s + dx) * co
            for khy, oy in zip(khs_y, offs_y):
                for khx, ox in zip(khs_x, offs_x):
                    wp = wp.at[oy - omin, ox - omin, :,
                               ch0:ch0 + co].set(w[khy, khx])
    pad_lo, pad_hi = -omin, kp - 1 + omin
    out = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), window_strides=(1, 1),
        padding=[(pad_lo, pad_hi), (pad_lo, pad_hi)],
        dimension_numbers=_DN,
        preferred_element_type=_conv_out_type(x)).astype(x.dtype)
    n, hh, ww, _ = out.shape
    out = out.reshape(n, hh, ww, s, s, co).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(n, hh * s, ww * s, co)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def conv2d_phase_packed(x: Array, w: Array, b: Optional[Array] = None,
                        padding: int = 1, s: int = 4) -> Array:
    """Stride-1 zero-pad conv computed as a stride-s conv over an
    (k+s-1)^2 kernel producing co*s*s phase channels + depth-to-space.

    For low-N heads (e.g. a 3x3 64->3 conv at 4x-upscaled resolution) XLA
    pads the output channels to the 128 MXU lanes, so cost = M*128*K
    regardless of N; packing s*s output phases into channels shrinks M by
    s^2 (the LaMa final-conv trick, models/lama.py:_final_conv, measured
    23.7 -> 8.6 ms at 1536px). Requires k odd, padding == k//2 and
    spatial dims divisible by s. Bit-identical contractions per output.
    """
    kh, kw, ci, co = w.shape
    wp = jnp.zeros((kh + s - 1, kw + s - 1, ci, co * s * s), w.dtype)
    for dy in range(s):
        for dx in range(s):
            i = (dy * s + dx) * co
            wp = wp.at[dy:dy + kh, dx:dx + kw, :, i:i + co].set(w)
    out = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (s, s),
        [(padding, padding), (padding, padding)],
        dimension_numbers=_DN,
        preferred_element_type=_conv_out_type(x)).astype(x.dtype)
    n, hh, ww, _ = out.shape
    out = out.reshape(n, hh, ww, s, s, co).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(n, hh * s, ww * s, co)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def nearest2x_conv_packed(x: Array, w: Array, b: Optional[Array] = None
                          ) -> Array:
    """conv3x3(nearest_upsample_2x(x)) with the repeat folded into ONE
    phase-packed conv at INPUT resolution + depth-to-space.

    Taps of the 3x3 kernel that land on the same source pixel of the
    2x-repeated image are pre-summed per output phase:
      phase 0 along an axis reads x[a-1]:w0, x[a]:w1+w2
      phase 1 reads             x[a]:w0+w1, x[a+1]:w2
    Removes the 4x nearest-repeat materialization and the lane padding of
    low-co convs (co*4 packed channels). Exact up to f32 re-association
    of the pre-summed taps.
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, 'nearest2x fold implemented for k=3'
    # per-phase [(offset, [torch taps])] along one axis
    plan = {0: [(-1, (0,)), (0, (1, 2))], 1: [(0, (0, 1)), (1, (2,))]}
    wp = jnp.zeros((3, 3, ci, co * 4), w.dtype)
    for dy in range(2):
        for dx in range(2):
            ch0 = (dy * 2 + dx) * co
            for oy, kys in plan[dy]:
                for ox, kxs in plan[dx]:
                    tap = sum(w[ky, kx] for ky in kys for kx in kxs)
                    wp = wp.at[oy + 1, ox + 1, :, ch0:ch0 + co].set(tap)
    out = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_DN,
        preferred_element_type=_conv_out_type(x)).astype(x.dtype)
    n, hh, ww, _ = out.shape
    out = out.reshape(n, hh, ww, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(n, hh * 2, ww * 2, co)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _deconv_pack_ok(stride: int, padding: int, kernel_size: int,
                    output_padding: int) -> bool:
    # MEASURED NEGATIVE on v5e (r4, devscripts/profiling/dbnet_deconv_ab):
    # DBNet-R34 @1536 batch-4 is 69.7 ms packed vs 55.2 ms with XLA's
    # native transposed-conv lowering — the packed form's s^2-channel
    # stride-1 conv loses to XLA's own output-res lowering despite the
    # 128-lane output padding theory. Default stays OFF; torch-exact
    # rewrite kept behind the flag for other archs/shapes.
    return (os.environ.get('MIT_TPU_DECONV_PACK', '0') == '1'
            and stride > 1
            and kernel_size - 2 * padding + output_padding == stride)


def batch_norm(x: Array, scale: Array, bias: Array, mean: Array, var: Array,
               eps: float = 1e-5) -> Array:
    """Inference-mode BatchNorm folded to a single multiply-add."""
    inv = (scale / jnp.sqrt(var + eps)).astype(x.dtype)
    return x * inv + (bias - mean * scale / jnp.sqrt(var + eps)).astype(x.dtype)


def group_norm(x: Array, num_groups: int, scale: Array, bias: Array,
               eps: float = 1e-5) -> Array:
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, num_groups, c // num_groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(n, h, w, c)
    return (out * scale + bias).astype(x.dtype)


def layer_norm(x: Array, scale: Array, bias: Array, eps: float = 1e-5) -> Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def linear(x: Array, w: Array, b: Optional[Array] = None) -> Array:
    """w is (in, out) post conversion (torch stores (out, in))."""
    out = jnp.dot(x, w.astype(x.dtype),
                  preferred_element_type=_conv_out_type(x)).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def max_pool2d(x: Array, kernel: int, stride: int, padding: int = 0) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, kernel, kernel, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)])


def avg_pool2d(x: Array, kernel: int, stride=1, padding=0,
               count_include_pad: bool = True) -> Array:
    """torch.nn.AvgPool2d equivalent (torch counts pad cells by default)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kernel, kernel, 1),
        (1, stride[0], stride[1], 1),
        [(0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)])
    if count_include_pad or (padding[0] == 0 and padding[1] == 0):
        return s / (kernel * kernel)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, kernel, kernel, 1),
        (1, stride[0], stride[1], 1),
        [(0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)])
    return s / cnt


def relu(x: Array) -> Array:
    return jnp.maximum(x, 0)


def gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


def sigmoid(x: Array) -> Array:
    return jax.nn.sigmoid(x)


def interpolate_nearest(x: Array, scale: int) -> Array:
    n, h, w, c = x.shape
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def interpolate_bilinear(x: Array, out_hw: Tuple[int, int],
                         align_corners: bool = False) -> Array:
    n, h, w, c = x.shape
    if align_corners:
        # torch align_corners=True semantics
        oh, ow = out_hw
        ys = jnp.linspace(0, h - 1, oh)
        xs = jnp.linspace(0, w - 1, ow)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[None, :, None, None]
        wx = (xs - x0)[None, None, :, None]
        a = x[:, y0][:, :, x0]
        b = x[:, y0][:, :, x1]
        cc = x[:, y1][:, :, x0]
        d = x[:, y1][:, :, x1]
        return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
                + cc * wy * (1 - wx) + d * wy * wx).astype(x.dtype)
    return jax.image.resize(x, (n,) + tuple(out_hw) + (c,), method='linear')


# --------------------------------------------------------------------------
# Parameter access helpers over the flat torch-keyed dict
# --------------------------------------------------------------------------

class P:
    """Scoped view over a flat param dict: P(params, 'backbone')['conv1.weight']."""

    __slots__ = ('d', 'prefix')

    def __init__(self, d: Params, prefix: str = ''):
        self.d = d
        self.prefix = prefix

    def __getitem__(self, key: str) -> Array:
        return self.d[f'{self.prefix}{key}' if not self.prefix
                      else f'{self.prefix}.{key}']

    def __contains__(self, key: str) -> bool:
        k = f'{self.prefix}.{key}' if self.prefix else key
        return k in self.d

    def scope(self, sub: str) -> 'P':
        return P(self.d, f'{self.prefix}.{sub}' if self.prefix else sub)

    def conv(self, name: str, x: Array, stride: int = 1, padding: int = 0,
             dilation: int = 1, groups: int = 1,
             pad_mode: str = 'zeros') -> Array:
        b = self[f'{name}.bias'] if f'{name}.bias' in self else None
        return conv2d(x, self[f'{name}.weight'], b, stride, padding,
                      dilation, groups, pad_mode)

    def conv_t(self, name: str, x: Array, stride: int = 2, padding: int = 1,
               kernel_size: int = 4, output_padding: int = 0,
               pack: bool = None) -> Array:
        """``pack`` overrides the global MIT_TPU_DECONV_PACK routing per
        call site (the whole-net A/B regressed on DBNet's 512-channel up
        blocks, but low-out-channel heads are a different regime — lane
        padding makes XLA's native lowering pay 128/N over the real
        work)."""
        b = self[f'{name}.bias'] if f'{name}.bias' in self else None
        if pack is None:
            pack = _deconv_pack_ok(stride, padding, kernel_size,
                                   output_padding)
        else:
            pack = (pack and stride > 1 and
                    kernel_size - 2 * padding + output_padding == stride)
        if pack:
            return conv_transpose2d_packed(x, self[f'{name}.weight'], b,
                                           stride, padding, kernel_size,
                                           output_padding)
        return conv_transpose2d(x, self[f'{name}.weight'], b, stride, padding,
                                kernel_size, output_padding)

    def bn(self, name: str, x: Array, eps: float = 1e-5) -> Array:
        return batch_norm(x, self[f'{name}.weight'], self[f'{name}.bias'],
                          self[f'{name}.running_mean'],
                          self[f'{name}.running_var'], eps)

    def ln(self, name: str, x: Array, eps: float = 1e-5) -> Array:
        return layer_norm(x, self[f'{name}.weight'], self[f'{name}.bias'], eps)

    def dense(self, name: str, x: Array) -> Array:
        b = self[f'{name}.bias'] if f'{name}.bias' in self else None
        return linear(x, self[f'{name}.weight'], b)
