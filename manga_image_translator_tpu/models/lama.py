"""LaMa FFC inpainting generator (lama_large / lama_mpe) — TPU-native.

Architecture contract: reference ``inpainting/inpainting_lama_mpe.py``
(FourierUnit :187-253, SpectralTransform :260-305, FFC :310-367,
FFCResnetBlock :402-435, FFCResNetGenerator :545-633, MPE :616-634 and
load_masked_position_encoding :745-805). Config used by the shipped
checkpoints: ratio 0 convs for stem/downsamples, ratio-0.75 FFC resnet
blocks (18 for lama_large, 9 for lama_mpe), no LFU, sigmoid output.

TPU mapping: NHWC; the whole generator is one jittable function; FFTs run in
fp32 islands (reference forces fp32 around rfftn/irfftn because bf16 FFT
darkens output), everything else follows the input dtype so the caller can
run the conv stack in bf16.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, conv2d, relu, sigmoid

NGF = 64
N_DOWN = 3
RESNET_RATIO = 0.75  # global channel ratio inside resnet blocks

# fp32 matches the reference's forced-fp32 FFT exactly (bf16 FFT darkens
# LaMa output per the reference's own comment). Opt-in bf16 DFT
# (MIT_TPU_LAMA_FFT=bf16) saves ~14 ms/page at 1536px on v5e, with fp32
# accumulation keeping the relative error ~1e-2 entering the FU's BN.
_FFT_BF16 = os.environ.get('MIT_TPU_LAMA_FFT', 'fp32') == 'bf16'


@functools.lru_cache(maxsize=8)
def _dft_mats(h: int, w: int):
    """Real matrices realizing ortho-normalized rfft2/irfft2 as matmuls.

    XLA's TPU FFT lowering is an order of magnitude slower than the MXU
    (measured 32 ms per FourierUnit at 192²×192 vs ~1 ms as matmuls), so the
    DFT runs as dense matrix products instead: rfft along W, full complex
    DFT along H, and their inverses.
    """
    k = w // 2 + 1
    norm = 1.0 / np.sqrt(h * w)
    wk = np.outer(np.arange(w), np.arange(k)) * (2 * np.pi / w)
    cos_w = np.cos(wk).astype(np.float32)          # (W, K)
    sin_w = np.sin(wk).astype(np.float32)
    hj = np.outer(np.arange(h), np.arange(h)) * (2 * np.pi / h)
    cos_h = np.cos(hj).astype(np.float32)          # (H, H)
    sin_h = np.sin(hj).astype(np.float32)
    # inverse rfft along W: weights 2 for interior bins (hermitian fold)
    fold = np.full((k,), 2.0, np.float32)
    fold[0] = 1.0
    if w % 2 == 0:
        fold[-1] = 1.0
    inv_cos_w = (cos_w * fold[None, :]).T.astype(np.float32)  # (K, W)
    inv_sin_w = (sin_w * fold[None, :]).T.astype(np.float32)
    # return numpy (NOT jnp): jnp constants created inside one jit trace must
    # not be cached and reused inside another (tracer leak)
    return cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm


@functools.lru_cache(maxsize=8)
def _dft_mats_joint(h: int, w: int):
    """Block matrices turning rfft2/irfft2 into TWO matmuls each.

    The re/im parts and their mixing are packed into joint operands so the
    MXU sees 2 large matmuls per transform instead of 6 small ones
    (measured ~4x on the spectral share of LaMa's FFC blocks):
      forward W-stage:  x @ [cos_w | -sin_w]                 -> [re_w | im_w]
      forward H-stage:  [re_w ; im_w] @ [[c,-s],[s,c]]       -> [re | im]
      inverse H-stage:  [re ; im] @ [[c,s],[-s,c]]           -> [re_h | im_h]
      inverse W-stage:  [re_h | im_h] @ [inv_cos ; -inv_sin] -> x
    """
    cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm = _dft_mats(h, w)
    k = w // 2 + 1
    fwd_w = np.concatenate([cos_w, -sin_w], axis=1)            # (W, 2K)
    # ortho norm folded into the H-stage matrices (saves one multiply per
    # DFT stage inside every FourierUnit)
    fwd_h = (np.block([[cos_h, -sin_h],
                       [sin_h, cos_h]]) * norm).astype(np.float32)
    inv_h = (np.block([[cos_h.T, sin_h.T],
                       [-sin_h.T, cos_h.T]]) * norm).astype(np.float32)
    inv_w = np.concatenate([inv_cos_w, -inv_sin_w], axis=0)    # (2K, W)
    return fwd_w, fwd_h, inv_h, inv_w, k, norm


# HIGH = 3-pass bf16 (~2^-21 relative error on the MXU) — indistinguishable
# from fp32 for image-range data at half the matmul cost of HIGHEST
_PREC = jax.lax.Precision.HIGH


def _dft_einsum(spec: str, x: jax.Array, m: np.ndarray) -> jax.Array:
    """One DFT stage: fp32 x HIGH precision by default, bf16 storage with
    fp32 accumulation when MIT_TPU_LAMA_FFT=bf16."""
    if _FFT_BF16:
        return jnp.einsum(spec, x.astype(jnp.bfloat16),
                          jnp.asarray(m, jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum(spec, x, m, precision=_PREC)


def _rfft2_matmul(x: jax.Array):
    """ortho rfft2 over axes (1, 2) of (N, H, W, C) fp32 via TWO matmuls
    (joint block operands, see _dft_mats_joint)."""
    n, h, w, c = x.shape
    fwd_w, fwd_h, _, _, k, norm = _dft_mats_joint(h, w)
    # W stage: (N,H,W,C) @ (W,2K) -> [re_w | im_w] along the K axis
    f = _dft_einsum('nhwc,wk->nhkc', x, fwd_w)
    # H stage: stack re_w/im_w along H, mix with the (2H,2H) block matrix
    stacked = jnp.concatenate([f[:, :, :k], f[:, :, k:]], axis=1)
    out = _dft_einsum('nhkc,hj->njkc', stacked, fwd_h)
    return out[:, :h], out[:, h:]


def _irfft2_matmul(re: jax.Array, im: jax.Array, h: int, w: int):
    """ortho irfft2 inverse of _rfft2_matmul (two joint matmuls)."""
    _, _, inv_h, inv_w, k, norm = _dft_mats_joint(h, w)
    stacked = jnp.concatenate([re, im], axis=1)                # (N, 2H, K, C)
    g = _dft_einsum('njkc,jh->nhkc', stacked, inv_h)
    # W stage: [re_h | im_h] along K, contracted with (2K, W)
    joined = jnp.concatenate([g[:, :h], g[:, h:]], axis=2)     # (N, H, 2K, C)
    return _dft_einsum('nhkc,kw->nhwc', joined, inv_w)


# Pad the rfft frequency axis K = W//2+1 to a multiple of 8 with zero
# cos/sin COLUMNS (forward) and zero ROWS (inverse). K=97 at the 1536-page
# trunk is sublane-misaligned, and the optimized HLO shows XLA inserting a
# standalone ~30 MB pad (K 97->100 / 2K 194->200) plus the matching slice
# around EVERY FourierUnit H-stage — pure HBM round trips, 18 blocks deep.
# Carrying analytically-zero frequency lanes instead is exact: forward
# zero columns produce exact-0 lanes, the FU's bias/BN/ReLU turns them into
# finite garbage, and the inverse's zero rows multiply that garbage by 0.
def _pad_k_enabled() -> bool:
    return os.environ.get('MIT_TPU_LAMA_PADK', '1') == '1'


def _dft_mats_split(h: int, w: int):
    """_dft_mats with the K axis zero-padded to a sublane multiple (split
    re/im path only — the joint/Pallas paths keep the exact-K operands).
    The env flag participates in the cache key so toggling it after import
    (e.g. per-test monkeypatching) takes effect."""
    return _dft_mats_split_impl(h, w, _pad_k_enabled())


@functools.lru_cache(maxsize=16)
def _dft_mats_split_impl(h: int, w: int, pad_k: bool):
    cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm = _dft_mats(h, w)
    k = w // 2 + 1
    kp = -(-k // 8) * 8
    if not pad_k or kp == k:
        return cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm
    pad_cols = ((0, 0), (0, kp - k))
    cos_w = np.pad(cos_w, pad_cols)
    sin_w = np.pad(sin_w, pad_cols)
    pad_rows = ((0, kp - k), (0, 0))
    inv_cos_w = np.pad(inv_cos_w, pad_rows)
    inv_sin_w = np.pad(inv_sin_w, pad_rows)
    return cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm


def _rfft2_split(x: jax.Array):
    """ortho rfft2 over axes (1, 2) of (N, H, W, C) fp32 with SEPARATE
    re/im planes — same matmul FLOPs as the joint block form, but zero
    concats/stacks (each of which costs a full-tensor HBM round trip)."""
    n, h, w, c = x.shape
    cos_w, sin_w, cos_h, sin_h, _, _, norm = _dft_mats_split(h, w)
    f_re = _dft_einsum('nhwc,wk->nhkc', x, cos_w)
    f_im = _dft_einsum('nhwc,wk->nhkc', x, -sin_w)
    # H-stage (complex mult by e^{-i·}, ortho norm folded into the mats)
    ch = cos_h * norm
    sh = sin_h * norm
    re = (_dft_einsum('nhkc,hj->njkc', f_re, ch)
          + _dft_einsum('nhkc,hj->njkc', f_im, sh))
    im = (_dft_einsum('nhkc,hj->njkc', f_im, ch)
          - _dft_einsum('nhkc,hj->njkc', f_re, sh))
    return re, im


def _irfft2_split(re: jax.Array, im: jax.Array, h: int, w: int):
    """ortho irfft2 inverse of _rfft2_split (separate planes, no concats)."""
    cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm = _dft_mats_split(h, w)
    ch = cos_h.T * norm
    sh = sin_h.T * norm
    g_re = (_dft_einsum('njkc,jh->nhkc', re, ch)
            - _dft_einsum('njkc,jh->nhkc', im, sh))
    g_im = (_dft_einsum('njkc,jh->nhkc', im, ch)
            + _dft_einsum('njkc,jh->nhkc', re, sh))
    return (_dft_einsum('nhkc,kw->nhwc', g_re, inv_cos_w)
            - _dft_einsum('nhkc,kw->nhwc', g_im, inv_sin_w))


def _fu_pallas_mode() -> str:
    """Channel-major Pallas FourierUnit (ops/pallas_spectral) modes:

    * 'xla' (default): split re/im einsums (HIGH precision).
    * 'pallas': fp32 Mosaic dots — MEASURED 4.5x SLOWER than XLA on v5e
      (163.7 vs 35.9 ms for the 36-FU trunk); kept as an experiment.
    * 'pallas3': bf16 hi/lo split-matmul kernels (3 MXU passes per dot,
      ~XLA-HIGH accuracy) with batched W-stages — the round-3 candidate.
    """
    return os.environ.get('MIT_TPU_LAMA_FU', 'xla')


def _fourier_unit_pallas(p: P, x: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Kernel-backed FourierUnit (same math as the split XLA path; see
    ops/pallas_spectral.py). Handles the trunk's n=1 activations; the
    conv quadrants and the BN+bias affine are folded host-of-kernel."""
    from ..ops.pallas_spectral import fourier_unit_cm, fourier_unit_cm3
    kernel_fn = (fourier_unit_cm3 if _fu_pallas_mode() == 'pallas3'
                 else fourier_unit_cm)
    n, h, w, c = x.shape
    wt = p['conv_layer.weight'][0, 0].astype(jnp.float32)   # (2C, 2C)
    wrr = wt[0::2, 0::2].T
    wir = wt[1::2, 0::2].T
    wri = wt[0::2, 1::2].T
    wii = wt[1::2, 1::2].T
    bias = (p['conv_layer.bias'].astype(jnp.float32)
            if 'conv_layer.bias' in p else jnp.zeros((2 * c,), jnp.float32))
    if 'bn.running_mean' in p:
        bw = p['bn.weight'].astype(jnp.float32)
        bb = p['bn.bias'].astype(jnp.float32)
        mean = p['bn.running_mean'].astype(jnp.float32)
        var = p['bn.running_var'].astype(jnp.float32)
        scale = bw / jnp.sqrt(var + 1e-5)
        shift = bb - mean * scale + bias * scale
    else:
        scale = jnp.ones((2 * c,), jnp.float32)
        shift = bias

    def one(img):
        x_cm = jnp.transpose(img, (2, 0, 1)).astype(jnp.float32)
        out = kernel_fn(
            x_cm, wrr, wir, wri, wii,
            scale[0::2].reshape(c, 1), shift[0::2].reshape(c, 1),
            scale[1::2].reshape(c, 1), shift[1::2].reshape(c, 1),
            interpret=interpret)
        return jnp.transpose(out, (1, 2, 0))

    out = jax.lax.map(one, x) if n > 1 else one(x[0])[None]
    return out.astype(x.dtype)


def _fourier_unit(p: P, x: jax.Array) -> jax.Array:
    """FourierUnit: rfft2 → re/im 1x1 conv + BN + ReLU → irfft2.

    x: (N, H, W, C). The transforms run in fp32 (reference forces fp32 around
    rfftn/irfftn, inpainting_lama_mpe.py:225-253) but as MXU matmuls rather
    than XLA's slow TPU FFT.

    The reference interleaves re/im per channel and runs one (2C→2C) 1x1
    conv. Interleave/deinterleave shuffles the whole tensor twice through
    HBM, so here the conv is algebraically split into its four re/im
    quadrants (strided slices of the same weights — checkpoint layout
    unchanged): y_re = re·W_rr + im·W_ir, y_im = re·W_ri + im·W_ii, with
    BN/ReLU applied per half. Bit-equivalent math, zero layout ops.
    """
    n, h, w, c = x.shape
    if (not _FFT_BF16 and c % 8 == 0 and h % 8 == 0
            and _fu_pallas_mode() != 'xla'):
        return _fourier_unit_pallas(p, x)
    re, im = _rfft2_split(x.astype(jnp.float32))
    wt = p['conv_layer.weight']            # (1, 1, 2C, 2C) interleaved
    w_r = wt[0, 0, 0::2]                   # (C, 2C): rows feeding from re
    w_i = wt[0, 0, 1::2]                   # (C, 2C): rows feeding from im
    bias = p['conv_layer.bias'] if 'conv_layer.bias' in p else None

    def half(sel):                         # sel 0 → re outputs, 1 → im
        y = (jnp.einsum('nhkc,cd->nhkd', re.astype(x.dtype),
                        w_r[:, sel::2].astype(x.dtype),
                        preferred_element_type=jnp.float32)
             + jnp.einsum('nhkc,cd->nhkd', im.astype(x.dtype),
                          w_i[:, sel::2].astype(x.dtype),
                          preferred_element_type=jnp.float32)
             ).astype(x.dtype)
        if bias is not None:
            y = y + bias[sel::2].astype(x.dtype)
        if 'bn.running_mean' in p:          # folded params carry no BN keys
            y = _bn_slice(p, 'bn', y, sel)
        return relu(y).astype(jnp.float32)

    out = _irfft2_split(half(0), half(1), h, w)
    return out.astype(x.dtype)


def _bn_slice(p: P, key: str, x: jax.Array, sel: int) -> jax.Array:
    """Inference BN over the ``sel``-interleaved half of the channels."""
    mean = p[f'{key}.running_mean'][sel::2]
    var = p[f'{key}.running_var'][sel::2]
    w = p[f'{key}.weight'][sel::2]
    b = p[f'{key}.bias'][sel::2]
    scale = (w / jnp.sqrt(var + 1e-5)).astype(x.dtype)
    shift = (b - mean * w / jnp.sqrt(var + 1e-5)).astype(x.dtype)
    return x * scale + shift


def _spectral_transform(p: P, x: jax.Array) -> jax.Array:
    """SpectralTransform with stride 1, no LFU."""
    x = p.conv('conv1.0', x)
    if 'conv1.1.running_mean' in p:
        x = p.bn('conv1.1', x)
    x = relu(x)
    out = _fourier_unit(p.scope('fu'), x)
    return p.conv('conv2', x + out)


def _ffc(p: P, x_l: jax.Array, x_g: Optional[jax.Array], ratio_gin: float,
         ratio_gout: float, stride: int = 1, padding: int = 0
         ) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
    """FFC: four-path local/global conv mixing (reference FFC.forward).

    convl2l and convl2g read the SAME input with the SAME stride/padding,
    so they are one conv with concatenated output channels — per output
    channel the contraction is unchanged (bit-identical), but the conv
    dispatch count halves and the MXU sees one N=C_total matmul instead
    of two narrow ones (MIT_TPU_LAMA_FUSE_LG=1 opts in).

    MIT_TPU_LAMA_FUSE_LG=2 instead fuses convl2l+convg2l along the INPUT
    channel axis (out_l = one conv over concat(x_l, x_g), K=C_l+C_g=512
    at the trunk vs two convs with K=128/K=384) — same FLOPs, one
    contraction instead of conv+conv+add; not bit-identical (one f32
    accumulation order instead of two partial sums added).

    MEASURED NEGATIVE on v5e (r4, lama_flag_ab.py, eager-traced arms, two
    interleaved passes): full LaMa-18 @1536 is 104.6 ms with fusion OFF vs
    107.0 (mode 1) / 109.6 (mode 2) — the concats/splits around the fused
    conv cost more than the saved dispatch. Default stays 0.
    """
    fuse_mode = os.environ.get('MIT_TPU_LAMA_FUSE_LG', '0')
    if (fuse_mode == '3' and ratio_gout not in (0, 1) and x_g is not None
            and 'convl2l.weight' in p and 'convg2l.weight' in p
            and 'convl2g.weight' in p):
        # ONE conv for all three local paths: concat(x_l,x_g) -> concat(
        # out_l, out_g_local) with a ZERO g2g block. 2.3x the needed local
        # FLOPs at ratio 0.75, but one dispatch and ONE read of the trunk
        # activation instead of two — measurable when the split convs are
        # dispatch-/HBM-bound rather than MXU-bound.
        wl2l, wg2l = p['convl2l.weight'], p['convg2l.weight']
        wl2g = p['convl2g.weight']
        kh, kw, c_l, _ = wl2l.shape
        c_g = wg2l.shape[2]
        zero = jnp.zeros((kh, kw, c_g, wl2g.shape[3]), wl2g.dtype)
        w_big = jnp.concatenate([
            jnp.concatenate([wl2l, wg2l], axis=2),     # -> out_l
            jnp.concatenate([wl2g, zero], axis=2),     # -> out_g local
        ], axis=3)
        b = None
        if any(f'{k}.bias' in p for k in ('convl2l', 'convg2l', 'convl2g')):
            b_l = ((p['convl2l.bias'] if 'convl2l.bias' in p else 0)
                   + (p['convg2l.bias'] if 'convg2l.bias' in p else 0))
            b_g = p['convl2g.bias'] if 'convl2g.bias' in p else \
                jnp.zeros((wl2g.shape[3],), wl2g.dtype)
            b = jnp.concatenate([jnp.broadcast_to(b_l, (c_l,)), b_g])
        both = conv2d(jnp.concatenate([x_l, x_g], axis=-1), w_big, b,
                      stride=stride, padding=padding, pad_mode='reflect')
        out_l, out_g = both[..., :c_l], both[..., c_l:]
        if 'convg2g.conv1.0.weight' in p:
            out_g = out_g + _spectral_transform(p.scope('convg2g'), x_g)
        return out_l, out_g
    if (fuse_mode == '2' and ratio_gout not in (0, 1) and x_g is not None
            and 'convl2l.weight' in p and 'convg2l.weight' in p):
        w_in = jnp.concatenate([p['convl2l.weight'], p['convg2l.weight']],
                               axis=2)
        b = None
        if 'convl2l.bias' in p or 'convg2l.bias' in p:
            b = ((p['convl2l.bias'] if 'convl2l.bias' in p else 0)
                 + (p['convg2l.bias'] if 'convg2l.bias' in p else 0))
        out_l = conv2d(jnp.concatenate([x_l, x_g], axis=-1), w_in, b,
                       stride=stride, padding=padding, pad_mode='reflect')
        out_g = p.conv('convl2g', x_l, stride=stride, padding=padding,
                       pad_mode='reflect')
        if 'convg2g.conv1.0.weight' in p:
            out_g = out_g + _spectral_transform(p.scope('convg2g'), x_g)
        return out_l, out_g
    if (fuse_mode == '1'
            and ratio_gout not in (0, 1)
            and 'convl2l.weight' in p and 'convl2g.weight' in p
            and (('convl2l.bias' in p) == ('convl2g.bias' in p))):
        wl = p['convl2l.weight']
        wg = p['convl2g.weight']
        b = (jnp.concatenate([p['convl2l.bias'], p['convl2g.bias']])
             if 'convl2l.bias' in p else None)
        both = conv2d(x_l, jnp.concatenate([wl, wg], axis=3), b,
                      stride=stride, padding=padding, pad_mode='reflect')
        co_l = wl.shape[3]
        out_l, out_g = both[..., :co_l], both[..., co_l:]
        if x_g is not None and 'convg2l.weight' in p:
            out_l = out_l + p.conv('convg2l', x_g, stride=stride,
                                   padding=padding, pad_mode='reflect')
        if x_g is not None and 'convg2g.conv1.0.weight' in p:
            out_g = out_g + _spectral_transform(p.scope('convg2g'), x_g)
        return out_l, out_g
    out_l = None
    out_g = None
    if ratio_gout != 1:
        out_l = p.conv('convl2l', x_l, stride=stride, padding=padding,
                       pad_mode='reflect')
        if x_g is not None and 'convg2l.weight' in p:
            out_l = out_l + p.conv('convg2l', x_g, stride=stride,
                                   padding=padding, pad_mode='reflect')
    if ratio_gout != 0:
        out_g = p.conv('convl2g', x_l, stride=stride, padding=padding,
                       pad_mode='reflect')
        if x_g is not None and 'convg2g.conv1.0.weight' in p:
            out_g = out_g + _spectral_transform(p.scope('convg2g'), x_g)
    return out_l, out_g


def _ffc_bn_act(p: P, x_l: jax.Array, x_g: Optional[jax.Array],
                ratio_gin: float, ratio_gout: float, stride: int = 1,
                padding: int = 0):
    x_l, x_g = _ffc(p.scope('ffc'), x_l, x_g, ratio_gin, ratio_gout,
                    stride, padding)
    if x_l is not None:
        if 'bn_l.running_mean' in p:
            x_l = p.bn('bn_l', x_l)
        x_l = relu(x_l)
    if x_g is not None:
        if 'bn_g.running_mean' in p:
            x_g = p.bn('bn_g', x_g)
        x_g = relu(x_g)
    return x_l, x_g


def _resnet_block(p: P, x_l: jax.Array, x_g: jax.Array):
    id_l, id_g = x_l, x_g
    x_l, x_g = _ffc_bn_act(p.scope('conv1'), x_l, x_g, RESNET_RATIO,
                           RESNET_RATIO, padding=1)
    x_l, x_g = _ffc_bn_act(p.scope('conv2'), x_l, x_g, RESNET_RATIO,
                           RESNET_RATIO, padding=1)
    return id_l + x_l, id_g + x_g


# Off by default: the streaming-kernel stem wins in isolation (4.1 vs
# 7.4 ms) but the packed final conv runs with tiny row tiles (VMEM budget)
# whose grid-step overhead costs more than the XLA phase-packed version —
# measured e2e 126.7 vs 111.2 ms/page. Opt-in until the kernel tiles
# channels as well as rows.
# '1' = stem + final through the streaming kernel; 'stem' = stem only
# (the packed FINAL conv kernel measured e2e-slower: tiny row tiles)
_PALLAS_SHELL = os.environ.get('MIT_TPU_LAMA_PALLAS', '0')


def _pallas_shell_ok(params: Dict, h: int, w: int, part: str) -> bool:
    """Route the stem and/or final conv through the streaming Pallas kernel
    when the packed weights exist (fold_bn adds them) and we're on real
    TPU hardware. part: 'stem' enabled by MIT_TPU_LAMA_PALLAS in
    {1, stem}; 'final' only by =1."""
    wanted = (_PALLAS_SHELL == '1'
              or (_PALLAS_SHELL == 'stem' and part == 'stem'))
    if not wanted or 'pallas.stem.weight' not in params:
        return False
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat in ('tpu', 'axon') and h >= 512 and w >= 512


def _packed_conv(x: jax.Array, w: jax.Array, b: jax.Array, relu_: bool,
                 out_h: int, out_w: int, co: int) -> jax.Array:
    """s=4 phase-packed conv via the streaming kernel: x is the
    reflect-padded input; returns (N, out_h, out_w, co)."""
    from ..ops.pallas_conv import (conv2d_stream, depth_to_space,
                                   space_to_depth)
    n, hp, wp_, ci = x.shape
    pad_h = (-hp) % 4
    pad_w = (-wp_) % 4
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    xp = space_to_depth(x, 4)
    out = conv2d_stream(xp, w, b, relu=relu_)
    out = depth_to_space(out, 4)
    return out[:, :out_h, :out_w, :co]


# --------------------------------------------------------------------------
# Space-to-depth phase-packed shell (round 3)
#
# XLA runs the LaMa shell far off roofline: the stem is a full-res 7x7 conv
# with 4 input channels (lane-padded contraction), the three downsamples are
# stride-2 convs (XLA's stride handling). Re-expressing them on the s=2
# space-to-depth grid makes every conv a stride-1 VALID conv with
# 128-multiple channel counts — identical arithmetic, reindexed:
#   stem:  (771², 16) -> 4x4 conv -> (768², 256)   [4 output phases packed]
#   downN: cells -> 2x2 conv -> half-grid, normal layout
# The downsamples' reflect padding (1px at full res) becomes one synthetic
# top/left CELL whose used phase holds the reflected row/col.
# --------------------------------------------------------------------------

def _s2d2(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C); channel order (ay, ax, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _d2s2(x: jax.Array, co: int) -> jax.Array:
    """inverse of _s2d2 for channel order (py, px, co)."""
    n, hc, wc, _ = x.shape
    x = x.reshape(n, hc, wc, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hc * 2, wc * 2, co)


def _pack_w_stem_s2(w: jax.Array) -> jax.Array:
    """(7,7,ci,co) stride-1 kernel -> (4,4,4ci,4co) cell kernel producing
    all 4 output phases: wp[dy,dx,(ay,ax,ci),(py,px,co)] = w[2dy+ay-py,
    2dx+ax-px] (zero outside)."""
    kh, kw, ci, co = w.shape
    wpad = jnp.pad(w, ((1, 8 - kh), (1, 8 - kw), (0, 0), (0, 0)))
    phases = []
    for py in range(2):
        for px in range(2):
            sl = jax.lax.dynamic_slice(
                wpad, (1 - py, 1 - px, 0, 0), (8, 8, ci, co))
            sl = sl.reshape(4, 2, 4, 2, ci, co).transpose(0, 2, 1, 3, 4, 5)
            phases.append(sl.reshape(4, 4, 4 * ci, co))
    return jnp.concatenate(phases, axis=-1)        # co order (py, px, co)


def _pack_w_down_s2(w: jax.Array) -> jax.Array:
    """(3,3,ci,co) stride-2 pad-1 kernel -> (2,2,4ci,co) cell kernel over a
    top/left cell-padded grid: wp[dy,ax?] = w[2dy+ay-1, 2dx+ax-1]."""
    ci, co = w.shape[2], w.shape[3]
    wpad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))          # (4,4)
    wp = wpad.reshape(2, 2, 2, 2, ci, co).transpose(0, 2, 1, 3, 4, 5)
    return wp.reshape(2, 2, 4 * ci, co)


def _cell_reflect_pad(x: jax.Array, c: int) -> jax.Array:
    """Prepend one synthetic top cell row + left cell column emulating 1px
    full-res reflect padding: the used phase carries the reflected line
    (full row -1 == row 1 == cell 0's phase-1), the unused phase is zero
    (its packed weights are zero)."""
    n, hc, wc, _ = x.shape
    v = x.reshape(n, hc, wc, 2, 2, c)
    top = jnp.concatenate(
        [jnp.zeros_like(v[:, :1, :, :1]), v[:, :1, :, 1:2]], axis=3)
    v = jnp.concatenate([top, v], axis=1)
    left = jnp.concatenate(
        [jnp.zeros_like(v[:, :, :1, :, :1]), v[:, :, :1, :, 1:2]], axis=4)
    v = jnp.concatenate([left, v], axis=2)
    return v.reshape(n, hc + 1, wc + 1, 4 * c)


def _conv_valid(x: jax.Array, w: jax.Array,
                b: Optional[jax.Array] = None) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _bn_maybe(p: P, key: str, x: jax.Array, tile: int = 1) -> jax.Array:
    if f'{key}.running_mean' not in p:
        return x
    if tile == 1:
        return p.bn(key, x)
    mean = jnp.tile(p[f'{key}.running_mean'], tile)
    var = jnp.tile(p[f'{key}.running_var'], tile)
    w = jnp.tile(p[f'{key}.weight'], tile)
    b = jnp.tile(p[f'{key}.bias'], tile)
    scale = (w / jnp.sqrt(var + 1e-5)).astype(x.dtype)
    shift = (b - mean * w / jnp.sqrt(var + 1e-5)).astype(x.dtype)
    return x * scale + shift


def _down_s2d(p: P, x_cells: jax.Array, ci: int) -> jax.Array:
    """One stride-2 downsample conv on the cell grid (input already s2d;
    output in NORMAL layout at the half grid, pre-BN)."""
    xp = _cell_reflect_pad(x_cells, ci)
    return _conv_valid(xp, _pack_w_down_s2(p['ffc.convl2l.weight']),
                       p['ffc.convl2l.bias']
                       if 'ffc.convl2l.bias' in p else None)


def _s2d_shell_mode() -> bool:
    """Space-to-depth shell: default OFF. MEASURED (r3, interleaved
    one-process A/B at 1536px full-18): 131.8 vs 126.7 ms — the packed
    stride-1 cell convs lose ~4% to XLA's own stride-2 handling; XLA
    already pays no real penalty for the low-C stem. Kept (exact
    reindexing, parity-tested) behind MIT_TPU_LAMA_S2D=1."""
    return os.environ.get('MIT_TPU_LAMA_S2D', '0') == '1'


def _shell_s2d(p: P, x_padded: jax.Array,
               rel_pos_emb: Optional[jax.Array],
               direct_emb: Optional[jax.Array]):
    """stem + 3 downsamples on the s2d grid. x_padded: reflect-padded-by-3
    input (N, H+6, W+6, 4). Returns (x_l, x_g) at H/8."""
    xs = _s2d2(x_padded)
    w_stem = _pack_w_stem_s2(p['model.1.ffc.convl2l.weight'])
    b_stem = (jnp.tile(p['model.1.ffc.convl2l.bias'], 4)
              if 'model.1.ffc.convl2l.bias' in p else None)
    y = _conv_valid(xs, w_stem, b_stem)            # (H/2, W/2, 4*NGF) cells
    y = _bn_maybe(p, 'model.1.bn_l', y, tile=4)
    y = relu(y)
    if rel_pos_emb is not None:
        y = y + _s2d2(rel_pos_emb.astype(y.dtype))
    if direct_emb is not None:
        y = y + _s2d2(direct_emb.astype(y.dtype))

    # model.2: cells already in hand
    y = _down_s2d(p.scope('model.2'), y, NGF)      # (H/2, W/2, 2NGF) normal
    y = relu(_bn_maybe(p, 'model.2.bn_l', y))
    # model.3
    y = _down_s2d(p.scope('model.3'), _s2d2(y), 2 * NGF)
    y = relu(_bn_maybe(p, 'model.3.bn_l', y))
    # model.4 splits local/global: one packed conv over concatenated
    # output channels, then slice
    p4 = p.scope('model.4')
    wl = p4['ffc.convl2l.weight']
    wg = p4['ffc.convl2g.weight']
    co_l = wl.shape[3]
    wcat = jnp.concatenate([wl, wg], axis=3)
    bl = p4['ffc.convl2l.bias'] if 'ffc.convl2l.bias' in p4 else None
    bg = p4['ffc.convl2g.bias'] if 'ffc.convl2g.bias' in p4 else None
    bcat = (jnp.concatenate([bl, bg]) if bl is not None else None)
    yc = _cell_reflect_pad(_s2d2(y), 4 * NGF)
    out = _conv_valid(yc, _pack_w_down_s2(wcat), bcat)
    x_l, x_g = out[..., :co_l], out[..., co_l:]
    x_l = relu(_bn_maybe(p4, 'bn_l', x_l))
    x_g = relu(_bn_maybe(p4, 'bn_g', x_g))
    return x_l, x_g


def lama_generator_forward(params: Dict, img: jax.Array, mask: jax.Array,
                           n_blocks: int = 18,
                           rel_pos_emb: Optional[jax.Array] = None,
                           direct_emb: Optional[jax.Array] = None
                           ) -> jax.Array:
    """Full generator. img: (N, H, W, 3) in [0,1] (already masked by caller
    convention ``img * (1-mask)``), mask: (N, H, W, 1) binary.

    Returns (N, H, W, 3) in [0,1].
    """
    p = P(params)
    x = jnp.concatenate([img, mask], axis=-1)
    H, W = img.shape[1], img.shape[2]
    pallas_stem = _pallas_shell_ok(params, H, W, 'stem')
    pallas_final = _pallas_shell_ok(params, H, W, 'final')

    # model.0 reflection pad + model.1 stem FFC (all-local). The default
    # path defers the pad to conv2d's banded reflect fast path (fused
    # zero-pad conv + border bands); the s2d/pallas variants consume a
    # materialized padded tensor.
    if _s2d_shell_mode() and H % 8 == 0 and W % 8 == 0 and not pallas_stem:
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode='reflect')
        x_l, x_g = _shell_s2d(p, xp, rel_pos_emb, direct_emb)
    else:
        if pallas_stem:
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)),
                         mode='reflect')
            x_l = _packed_conv(xp, params['pallas.stem.weight'],
                               params['pallas.stem.bias'], True, H, W, NGF)
            x_g = None
        else:
            x_l, x_g = _ffc_bn_act(p.scope('model.1'), x, None, 0, 0,
                                   padding=3)

        if rel_pos_emb is not None:
            x_l = x_l + rel_pos_emb.astype(x_l.dtype)
        if direct_emb is not None:
            x_l = x_l + direct_emb.astype(x_l.dtype)

        # downsampling: model.2/3 all-local; model.4 splits local/global
        x_l, x_g = _ffc_bn_act(p.scope('model.2'), x_l, None, 0, 0,
                               stride=2, padding=1)
        x_l, x_g = _ffc_bn_act(p.scope('model.3'), x_l, None, 0, 0,
                               stride=2, padding=1)
        x_l, x_g = _ffc_bn_act(p.scope('model.4'), x_l, None, 0,
                               RESNET_RATIO, stride=2, padding=1)

    for i in range(n_blocks):
        x_l, x_g = _resnet_block(p.scope(f'model.{5 + i}'), x_l, x_g)

    x = jnp.concatenate([x_l, x_g], axis=-1)

    up0 = 5 + n_blocks + 1  # ConcatTupleLayer occupies one slot
    for i in range(N_DOWN):
        base = up0 + i * 3
        x = p.conv_t(f'model.{base}', x, stride=2, padding=1, kernel_size=3,
                     output_padding=1)
        if f'model.{base + 1}.running_mean' in p:
            x = p.bn(f'model.{base + 1}', x)
        x = relu(x)

    if pallas_final:
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode='reflect')
        x = _packed_conv(x, params['pallas.final.weight'],
                         params['pallas.final.bias'], False, H, W, 3)
    else:
        x = _final_conv(p, f'model.{up0 + 3 * N_DOWN + 1}', x)
    return sigmoid(x.astype(jnp.float32))


def _final_conv(p: P, key: str, x: jax.Array, s: int = 4) -> jax.Array:
    """Final 7x7 reflect-pad conv to RGB, phase-packed when the spatial
    size allows.

    XLA pads conv output channels to the 128 MXU lanes, so the stride-1
    64->3 conv costs M*128*K regardless of N. Packing the s x s output
    phases into channels (stride s, kernel (6+s)^2, 3*s^2 outputs) shrinks
    M by s^2: measured 23.7 -> 8.6 ms at 1536px on v5e, bit-identical.
    ``x`` arrives UNPADDED; the reflect pad runs through the banded
    fast path (functional._reflect_conv_banded) so the (H+6)² padded
    copy — 304 MB at 1536² — never materializes in HBM.
    """
    from .functional import _reflect_conv_banded
    w = p[f'{key}.weight']                                   # (7,7,C,3) HWIO
    b = p[f'{key}.bias'] if f'{key}.bias' in p else None
    kh, kw, ci, co = w.shape
    h_out, w_out = x.shape[1], x.shape[2]
    if h_out % s or w_out % s:
        out = conv2d(x, w, None, stride=1, padding=kh // 2,
                     pad_mode='reflect')
    else:
        wp = jnp.zeros((kh + s - 1, kw + s - 1, ci, co * s * s), w.dtype)
        for dy in range(s):
            for dx in range(s):
                i = (dy * s + dx) * co
                wp = wp.at[dy:dy + kh, dx:dx + kw, :, i:i + co].set(w)
        if os.environ.get('MIT_TPU_REFLECT_FAST', '0') == '1':
            out = _reflect_conv_banded(x, wp.astype(x.dtype), s, kh // 2)
        else:
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)),
                         mode='reflect')
            out = jax.lax.conv_general_dilated(
                xp, wp.astype(x.dtype), (s, s), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32).astype(x.dtype)
        n, hh, ww, _ = out.shape
        out = out.reshape(n, hh, ww, s, s, co).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(n, hh * s, ww * s, co)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# --------------------------------------------------------------------------
# MPE (masked positional encoding) — lama_mpe variant
# --------------------------------------------------------------------------

def masked_position_encoding(mask: np.ndarray
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side BFS producing (rel_pos ids, direction one-hots) for a binary
    (H, W) mask in {0,1}. Mirrors reference load_masked_position_encoding."""
    import cv2
    str_size, pos_num = 256, 128
    ori_mask = mask.astype(np.float32)
    ori_h, ori_w = ori_mask.shape
    m255 = (mask * 255).astype(np.uint8)
    small = cv2.resize(m255, (str_size, str_size),
                       interpolation=cv2.INTER_AREA)
    small[small > 0] = 255
    h, w = small.shape
    mask3 = 1.0 - small / 255.0
    pos = np.zeros((h, w), np.int32)
    direct = np.zeros((h, w, 4), np.int32)
    filters = [
        np.ones((3, 3), np.float32),
        np.array([[1, 1, 0], [1, 1, 0], [0, 0, 0]], np.float32),
        np.array([[0, 0, 0], [1, 1, 0], [1, 1, 0]], np.float32),
        np.array([[0, 1, 1], [0, 1, 1], [0, 0, 0]], np.float32),
        np.array([[0, 0, 0], [0, 1, 1], [0, 1, 1]], np.float32),
    ]
    i = 0
    if mask3.max() > 0:
        while np.sum(1 - mask3) > 0:
            i += 1
            grown = cv2.filter2D(mask3, -1, filters[0])
            grown[grown > 0] = 1
            pos[(grown - mask3) == 1] = i
            for d in range(4):
                m = cv2.filter2D(mask3, -1, filters[1 + d])
                m[m > 0] = 1
                direct[(m - mask3) == 1, d] = 1
            mask3 = grown
    rel_pos = np.clip((pos / (str_size / 2) * pos_num).astype(np.int32),
                      0, pos_num - 1)
    if (ori_w, ori_h) != (w, h):
        rel_pos = cv2.resize(rel_pos, (ori_w, ori_h),
                             interpolation=cv2.INTER_NEAREST)
        rel_pos[ori_mask == 0] = 0
        direct = cv2.resize(direct, (ori_w, ori_h),
                            interpolation=cv2.INTER_NEAREST)
        direct[ori_mask == 0, :] = 0
    return rel_pos, direct


def mpe_embeddings(params: Dict, rel_pos: jax.Array, direct: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """(B, H, W) ids + (B, H, W, 4) one-hots → two (B, H, W, 64) embeddings
    scaled by alpha5/alpha6 (reference MPE.forward)."""
    p = P(params)
    rel_table = p['rel_pos_emb.weight']          # (128, 64)
    dir_table = p['direct_emb.weight']           # (4, 64)
    rel = rel_table[rel_pos] * p['alpha5']
    dr = jnp.einsum('bhwf,fe->bhwe', direct.astype(jnp.float32),
                    dir_table) * p['alpha6']
    return rel, dr


TRANSPOSED_CONV_PATTERNS_FOR_BLOCKS = {
    18: (r'model\.(24|27|30)\.weight',),
    9: (r'model\.(15|18|21)\.weight',),
}


def fold_bn(params: Dict, n_blocks: int) -> Dict:
    """Fold every inference-mode BatchNorm into the conv preceding it.

    Removes ~150 elementwise BN ops from the 1536px forward; the forward
    detects folded params by the absence of ``*.running_mean`` keys. Where
    a BN follows the SUM of two convs (the FFC out_l/out_g paths,
    reference FFC.forward), the scale multiplies both conv weights and the
    shift rides as the bias of exactly one of them.
    """
    import numpy as _np

    out = {k: _np.asarray(v) for k, v in params.items()}

    def sb(bn_key):
        g = _np.asarray(params[f'{bn_key}.weight'], _np.float32)
        b = _np.asarray(params[f'{bn_key}.bias'], _np.float32)
        mu = _np.asarray(params[f'{bn_key}.running_mean'], _np.float32)
        var = _np.asarray(params[f'{bn_key}.running_var'], _np.float32)
        s = g / _np.sqrt(var + 1e-5)
        for suffix in ('weight', 'bias', 'running_mean', 'running_var'):
            out.pop(f'{bn_key}.{suffix}', None)
        return s, b - mu * s

    def scale_conv(conv_key, s, bias=None):
        w = _np.asarray(params[f'{conv_key}.weight'], _np.float32)
        dt = _np.asarray(params[f'{conv_key}.weight']).dtype
        out[f'{conv_key}.weight'] = (w * s[None, None, None, :]).astype(dt)
        if bias is not None:
            old_b = _np.asarray(params.get(f'{conv_key}.bias', 0.0),
                                _np.float32)
            out[f'{conv_key}.bias'] = (old_b * s + bias).astype(_np.float32)

    # stem + all-local downsamples
    for m in ('model.1', 'model.2', 'model.3'):
        s, t = sb(f'{m}.bn_l')
        scale_conv(f'{m}.ffc.convl2l', s, t)
    # split downsample
    s, t = sb('model.4.bn_l')
    scale_conv('model.4.ffc.convl2l', s, t)
    s, t = sb('model.4.bn_g')
    scale_conv('model.4.ffc.convl2g', s, t)

    for b in range(n_blocks):
        for cv in ('conv1', 'conv2'):
            pre = f'model.{5 + b}.{cv}'
            s, t = sb(f'{pre}.bn_l')
            scale_conv(f'{pre}.ffc.convl2l', s, t)   # bias rides on l2l
            scale_conv(f'{pre}.ffc.convg2l', s)
            s, t = sb(f'{pre}.bn_g')
            scale_conv(f'{pre}.ffc.convl2g', s, t)   # bias rides on l2g
            st_key = f'{pre}.ffc.convg2g'
            scale_conv(f'{st_key}.conv2', s)         # spectral out, no bias
            s1, t1 = sb(f'{st_key}.conv1.1')
            scale_conv(f'{st_key}.conv1.0', s1, t1)
            s2, t2 = sb(f'{st_key}.fu.bn')
            scale_conv(f'{st_key}.fu.conv_layer', s2, t2)

    up0 = 5 + n_blocks + 1
    for i in range(N_DOWN):
        s, t = sb(f'model.{up0 + i * 3 + 1}')
        scale_conv(f'model.{up0 + i * 3}', s, t)

    # Pre-pack the stem and final conv for the streaming Pallas kernel
    # (s=4 phase packing turns the MXU-hostile low-channel full-res convs
    # into K>=64 stride-1 convs; measured stem 7.4 -> 4.1 ms on v5e).
    from ..ops.pallas_conv import pack_phase_weight
    stem_w = out['model.1.ffc.convl2l.weight']          # (7,7,4,64) folded
    wp, _ = pack_phase_weight(_np.asarray(stem_w, _np.float32), 4)
    out['pallas.stem.weight'] = wp.astype(_np.asarray(stem_w).dtype)
    out['pallas.stem.bias'] = _np.tile(
        _np.asarray(out['model.1.ffc.convl2l.bias'], _np.float32), 16)
    fkey = f'model.{up0 + 3 * N_DOWN + 1}'
    fin_w = out[f'{fkey}.weight']                       # (7,7,64,3)
    wp, _ = pack_phase_weight(_np.asarray(fin_w, _np.float32), 4)
    out['pallas.final.weight'] = wp.astype(_np.asarray(fin_w).dtype)
    out['pallas.final.bias'] = _np.tile(
        _np.asarray(out[f'{fkey}.bias'], _np.float32), 16)

    import jax.numpy as _jnp
    return {k: _jnp.asarray(v) for k, v in out.items()}


def sinusoidal_embedding_table(num: int = 128, dim: int = 64) -> np.ndarray:
    """MaskedSinusoidalPositionalEmbedding init (reference :439-460):
    sin features in the first half, cos in the second (not interleaved)."""
    pe = np.array([[pos / np.power(10000, 2 * (j // 2) / dim)
                    for j in range(dim)] for pos in range(num)])
    out = np.zeros((num, dim), np.float32)
    sentinel = dim // 2 if dim % 2 == 0 else dim // 2 + 1
    out[:, :sentinel] = np.sin(pe[:, 0::2])
    out[:, sentinel:] = np.cos(pe[:, 1::2])
    return out


def init_params(n_blocks: int = 18, dtype=jnp.float32) -> Dict:
    """Random params with the checkpoint key/shape layout."""
    rs = np.random.RandomState(7)
    params: Dict = {}

    def conv(key, kh, kw, ci, co, bias=True):
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

    # stem
    conv('model.1.ffc.convl2l', 7, 7, 4, NGF, bias=False)
    bn('model.1.bn_l', NGF)
    # downsamples
    chans = [(NGF, NGF * 2), (NGF * 2, NGF * 4)]
    for i, (ci, co) in enumerate(chans):
        conv(f'model.{2 + i}.ffc.convl2l', 3, 3, ci, co, bias=False)
        bn(f'model.{2 + i}.bn_l', co)
    # last downsample splits local/global
    cg = int(NGF * 8 * RESNET_RATIO)   # 384
    cl = NGF * 8 - cg                  # 128
    conv('model.4.ffc.convl2l', 3, 3, NGF * 4, cl, bias=False)
    conv('model.4.ffc.convl2g', 3, 3, NGF * 4, cg, bias=False)
    bn('model.4.bn_l', cl)
    bn('model.4.bn_g', cg)

    for b in range(n_blocks):
        for cv in ('conv1', 'conv2'):
            pre = f'model.{5 + b}.{cv}'
            conv(f'{pre}.ffc.convl2l', 3, 3, cl, cl, bias=False)
            conv(f'{pre}.ffc.convl2g', 3, 3, cl, cg, bias=False)
            conv(f'{pre}.ffc.convg2l', 3, 3, cg, cl, bias=False)
            st = f'{pre}.ffc.convg2g'
            conv(f'{st}.conv1.0', 1, 1, cg, cg // 2, bias=False)
            bn(f'{st}.conv1.1', cg // 2)
            conv(f'{st}.fu.conv_layer', 1, 1, cg, cg, bias=False)
            bn(f'{st}.fu.bn', cg)
            conv(f'{st}.conv2', 1, 1, cg // 2, cg, bias=False)
            bn(f'{pre}.bn_l', cl)
            bn(f'{pre}.bn_g', cg)

    up0 = 5 + n_blocks + 1
    ch = NGF * 8
    for i in range(N_DOWN):
        conv(f'model.{up0 + i * 3}', 3, 3, ch, ch // 2)
        bn(f'model.{up0 + i * 3 + 1}', ch // 2)
        ch //= 2
    conv(f'model.{up0 + 3 * N_DOWN + 1}', 7, 7, NGF, 3)
    return params
