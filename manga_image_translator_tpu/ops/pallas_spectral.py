"""LaMa FourierUnit as channel-major Pallas kernels.

MEASURED RESULT: 4.5x SLOWER than the XLA split formulation on v5e
(163.7 vs 35.9 ms for LaMa's 36-FU trunk at 192²x192) — Mosaic lowers
fp32 dots without the 3-pass-bf16 trick XLA's Precision.HIGH uses, and
the per-channel (H,W) matmuls are too small to hide per-op overhead.
Kept as a parity-tested experiment (MIT_TPU_LAMA_FU=pallas); the
production path is models/lama.py `_fourier_unit` (re/im-split einsums).

The XLA formulation (models/lama.py `_fourier_unit`) is HBM-bound: every
DFT stage is an einsum whose contraction dim (w, then h, then c) is not
minor-most, so XLA materializes transposed copies of the ~14 MB fp32
planes around each matmul — measured ~1.0 ms per FourierUnit at
192²×192 when the pure matmul FLOPs cost ~0.27 ms.

Channel-major (C, H, W) fixes every contraction at once:

* phase 1 — grid over channel blocks: per channel, the 2D rfft2 is two
  plain (H,W)@(W,K) / (H,H)@(H,K) matmul pairs on a VMEM-resident plane
  (re/im kept as separate planes; zero layout ops);
* phase 2 — grid over frequency-row blocks: the interleaved (2C→2C) 1x1
  conv is applied as its four re/im quadrants, each an (C,C)@(C,K)
  matmul per row, with BN+ReLU fused;
* phase 3 — mirror of phase 1 for the inverse transform.

All lane extents are 128-padded (K = W/2+1 → Kp); the spectral pad
columns pick up bias/BN garbage in phase 2 but are annihilated by the
zero rows of the padded inverse-W matrix in phase 3.

fp32 throughout (Mosaic's f32 dot lowering; Precision.HIGH/HIGHEST have
no Mosaic lowering) — the same fp32-FFT island the reference enforces
(inpainting_lama_mpe.py:225-253).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 8            # channels per phase-1/3 grid step
RB = 8            # frequency rows per phase-2 grid step

def _mm(a, b):
    # default precision: Mosaic rejects Precision.HIGH/HIGHEST on dots —
    # its f32 matmul lowering is full-precision MXU passes already
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=8)
def _mats(h: int, w: int):
    """numpy DFT operands, lane-padded: cos_w/sin_w (W, Kp), ch/sh (H, H)
    with ortho norm folded into the H stage, inv_cos/inv_sin (Kp, W) with
    zero pad rows."""
    from ..models.lama import _dft_mats
    cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm = _dft_mats(h, w)
    k = w // 2 + 1
    kp = -(-k // 128) * 128
    padk = ((0, 0), (0, kp - k))
    return (np.pad(cos_w, padk), np.pad(sin_w, padk),
            (cos_h * norm).astype(np.float32),
            (sin_h * norm).astype(np.float32),
            np.pad(inv_cos_w, ((0, kp - k), (0, 0))),
            np.pad(inv_sin_w, ((0, kp - k), (0, 0))), kp)


def _fwd_kernel(x_ref, cw_ref, sw_ref, ch_ref, sh_ref, fre_ref, fim_ref):
    cw = cw_ref[:]
    sw = sw_ref[:]
    ch = ch_ref[:]
    sh = sh_ref[:]
    for c in range(CB):
        xc = x_ref[c]
        f_re = _mm(xc, cw)
        f_im = -_mm(xc, sw)
        # H-stage: re = ch^T f_re + sh^T f_im (ch/sh symmetric)
        fre_ref[c] = _mm(ch, f_re) + _mm(sh, f_im)
        fim_ref[c] = _mm(ch, f_im) - _mm(sh, f_re)


def _conv_kernel(fre_ref, fim_ref, wrr_ref, wir_ref, wri_ref, wii_ref,
                 scr_ref, shr_ref, sci_ref, shi_ref, yre_ref, yim_ref):
    wrr = wrr_ref[:]
    wir = wir_ref[:]
    wri = wri_ref[:]
    wii = wii_ref[:]
    for r in range(RB):
        a_re = fre_ref[:, r]          # (C, Kp)
        a_im = fim_ref[:, r]
        y_re = _mm(wrr, a_re) + _mm(wir, a_im)
        y_im = _mm(wri, a_re) + _mm(wii, a_im)
        yre_ref[:, r] = jnp.maximum(
            y_re * scr_ref[:, 0:1] + shr_ref[:, 0:1], 0.0)
        yim_ref[:, r] = jnp.maximum(
            y_im * sci_ref[:, 0:1] + shi_ref[:, 0:1], 0.0)


def _inv_kernel(yre_ref, yim_ref, ch_ref, sh_ref, icw_ref, isw_ref,
                out_ref):
    ch = ch_ref[:]
    sh = sh_ref[:]
    icw = icw_ref[:]
    isw = isw_ref[:]
    for c in range(CB):
        y_re = yre_ref[c]
        y_im = yim_ref[c]
        g_re = _mm(ch, y_re) - _mm(sh, y_im)
        g_im = _mm(ch, y_im) + _mm(sh, y_re)
        out_ref[c] = _mm(g_re, icw) - _mm(g_im, isw)


# --------------------------------------------------------------------------
# Round-3 variant: manual bf16 split-matmul ("bf16x3") kernels
# --------------------------------------------------------------------------
#
# The fp32 kernels above lose 4.5x to XLA because Mosaic's f32 dot lowering
# has no fast path (and Precision.HIGH/HIGHEST are rejected). XLA's own
# fp32 einsums run as THREE bf16 MXU passes (hi·hi + hi·lo + lo·hi, the
# "bf16x3" trick, ~2^-17 relative error). These kernels do the same split
# manually: constants (DFT matrices, conv quadrants) are pre-split on the
# host, activations are split in-kernel with two VPU ops per operand.
# The W-stages additionally batch all CB channels into one (CB·H, W)
# matmul (M=1536: exact MXU tiling) instead of CB small ones.

def _sp(x):
    """bf16 hi/lo split of an f32 value (in-kernel)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _d(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _d3(ah, al, bh, bl):
    """f32-accurate product of split operands: 3 bf16 MXU passes."""
    return _d(ah, bh) + (_d(al, bh) + _d(ah, bl))


def _split_np(m: np.ndarray):
    import ml_dtypes
    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m.astype(np.float32) - hi.astype(np.float32)).astype(
        ml_dtypes.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=8)
def _mats3(h: int, w: int):
    """Split-bf16 DFT operands (numpy, cached; jnp conversion at use)."""
    cw, sw, ch, sh, icw, isw, kp = _mats(h, w)
    return (tuple(_split_np(m) for m in (cw, sw, ch, sh, icw, isw)), kp)


def _fwd3_kernel(x_ref, cwh_ref, cwl_ref, swh_ref, swl_ref,
                 chh_ref, chl_ref, shh_ref, shl_ref, fre_ref, fim_ref,
                 *, cb: int, h: int, kp: int):
    xf = x_ref[:].reshape(cb * h, x_ref.shape[2])
    xh, xl = _sp(xf)
    f_re = _d3(xh, xl, cwh_ref[:], cwl_ref[:]).reshape(cb, h, kp)
    f_im = (-_d3(xh, xl, swh_ref[:], swl_ref[:])).reshape(cb, h, kp)
    chh = chh_ref[:]
    chl = chl_ref[:]
    shh = shh_ref[:]
    shl = shl_ref[:]
    for c in range(cb):
        frh, frl = _sp(f_re[c])
        fih, fil = _sp(f_im[c])
        fre_ref[c] = _d3(chh, chl, frh, frl) + _d3(shh, shl, fih, fil)
        fim_ref[c] = _d3(chh, chl, fih, fil) - _d3(shh, shl, frh, frl)


def _conv3_kernel(fre_ref, fim_ref, wrrh_ref, wrrl_ref, wirh_ref, wirl_ref,
                  wrih_ref, wril_ref, wiih_ref, wiil_ref,
                  scr_ref, shr_ref, sci_ref, shi_ref, yre_ref, yim_ref,
                  *, rb: int):
    wrrh = wrrh_ref[:]
    wrrl = wrrl_ref[:]
    wirh = wirh_ref[:]
    wirl = wirl_ref[:]
    wrih = wrih_ref[:]
    wril = wril_ref[:]
    wiih = wiih_ref[:]
    wiil = wiil_ref[:]
    for r in range(rb):
        arh, arl = _sp(fre_ref[:, r])
        aih, ail = _sp(fim_ref[:, r])
        y_re = _d3(wrrh, wrrl, arh, arl) + _d3(wirh, wirl, aih, ail)
        y_im = _d3(wrih, wril, arh, arl) + _d3(wiih, wiil, aih, ail)
        yre_ref[:, r] = jnp.maximum(
            y_re * scr_ref[:, 0:1] + shr_ref[:, 0:1], 0.0)
        yim_ref[:, r] = jnp.maximum(
            y_im * sci_ref[:, 0:1] + shi_ref[:, 0:1], 0.0)


def _inv3_kernel(yre_ref, yim_ref, chh_ref, chl_ref, shh_ref, shl_ref,
                 icwh_ref, icwl_ref, iswh_ref, iswl_ref, out_ref,
                 *, cb: int):
    chh = chh_ref[:]
    chl = chl_ref[:]
    shh = shh_ref[:]
    shl = shl_ref[:]
    icwh = icwh_ref[:]
    icwl = icwl_ref[:]
    iswh = iswh_ref[:]
    iswl = iswl_ref[:]
    for c in range(cb):
        yrh, yrl = _sp(yre_ref[c])
        yih, yil = _sp(yim_ref[c])
        # ch/sh are symmetric, so the inverse H-stage reuses them directly
        g_re = _d3(chh, chl, yrh, yrl) - _d3(shh, shl, yih, yil)
        g_im = _d3(chh, chl, yih, yil) + _d3(shh, shl, yrh, yrl)
        grh, grl = _sp(g_re)
        gih, gil = _sp(g_im)
        out_ref[c] = (_d3(grh, grl, icwh, icwl)
                      - _d3(gih, gil, iswh, iswl))


def _split_traced(x):
    """bf16 hi/lo split of a traced jnp array (host-of-kernel)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.partial(jax.jit, static_argnames=('interpret',))
def fourier_unit_cm3(x_cm: jax.Array, wrr, wir, wri, wii,
                     scale_re, shift_re, scale_im, shift_im,
                     interpret: bool = False) -> jax.Array:
    """FourierUnit on channel-major (C, H, W) f32 planes — bf16x3 dots.

    Same contract as fourier_unit_cm; ~XLA-HIGH precision (relative error
    ~2^-17) via manual hi/lo bf16 splits instead of Mosaic's slow fp32
    dot lowering.
    """
    c, h, w = x_cm.shape
    assert c % CB == 0 and h % RB == 0, (c, h)
    (mats, kp) = _mats3(h, w)
    (cwh, cwl), (swh, swl), (chh, chl), (shh, shl), (icwh, icwl), \
        (iswh, iswl) = [tuple(jnp.asarray(m) for m in pair)
                        for pair in mats]
    vm = pltpu.VMEM
    f32 = jnp.float32
    quads = []
    for q in (wrr, wir, wri, wii):
        quads.extend(_split_traced(q.astype(f32)))

    f_re, f_im = pl.pallas_call(
        functools.partial(_fwd3_kernel, cb=CB, h=h, kp=kp),
        grid=(c // CB,),
        in_specs=[pl.BlockSpec((CB, h, w), lambda i: (i, 0, 0),
                               memory_space=vm)]
        + [pl.BlockSpec(memory_space=vm)] * 8,
        out_specs=[pl.BlockSpec((CB, h, kp), lambda i: (i, 0, 0),
                                memory_space=vm)] * 2,
        out_shape=[jax.ShapeDtypeStruct((c, h, kp), f32)] * 2,
        interpret=interpret,
    )(x_cm, cwh, cwl, swh, swl, chh, chl, shh, shl)

    y_re, y_im = pl.pallas_call(
        functools.partial(_conv3_kernel, rb=RB),
        grid=(h // RB,),
        in_specs=[pl.BlockSpec((c, RB, kp), lambda i: (0, i, 0),
                               memory_space=vm)] * 2
        + [pl.BlockSpec(memory_space=vm)] * 12,
        out_specs=[pl.BlockSpec((c, RB, kp), lambda i: (0, i, 0),
                                memory_space=vm)] * 2,
        out_shape=[jax.ShapeDtypeStruct((c, h, kp), f32)] * 2,
        interpret=interpret,
    )(f_re, f_im, *quads, scale_re, shift_re, scale_im, shift_im)

    out = pl.pallas_call(
        functools.partial(_inv3_kernel, cb=CB),
        grid=(c // CB,),
        in_specs=[pl.BlockSpec((CB, h, kp), lambda i: (i, 0, 0),
                               memory_space=vm)] * 2
        + [pl.BlockSpec(memory_space=vm)] * 8,
        out_specs=pl.BlockSpec((CB, h, w), lambda i: (i, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((c, h, w), f32),
        interpret=interpret,
    )(y_re, y_im, chh, chl, shh, shl, icwh, icwl, iswh, iswl)
    return out


@functools.partial(jax.jit, static_argnames=('interpret',))
def fourier_unit_cm(x_cm: jax.Array, wrr, wir, wri, wii,
                    scale_re, shift_re, scale_im, shift_im,
                    interpret: bool = False) -> jax.Array:
    """FourierUnit on a channel-major (C, H, W) fp32 plane stack.

    Args:
      x_cm: (C, H, W) f32.
      wrr/wir/wri/wii: (C_out, C_in) f32 conv quadrants (already
        transposed for left-multiplication).
      scale_* / shift_*: (C, 1) f32 folded BN+bias affine per half.
    Returns (C, H, W) f32.
    """
    c, h, w = x_cm.shape
    assert c % CB == 0 and h % RB == 0, (c, h)
    cw, sw, ch, sh, icw, isw, kp = _mats(h, w)
    vm = pltpu.VMEM
    f32 = jnp.float32

    f_re, f_im = pl.pallas_call(
        _fwd_kernel,
        grid=(c // CB,),
        in_specs=[
            pl.BlockSpec((CB, h, w), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
        ],
        out_specs=[pl.BlockSpec((CB, h, kp), lambda i: (i, 0, 0),
                                memory_space=vm)] * 2,
        out_shape=[jax.ShapeDtypeStruct((c, h, kp), f32)] * 2,
        interpret=interpret,
    )(x_cm, jnp.asarray(cw), jnp.asarray(sw), jnp.asarray(ch),
      jnp.asarray(sh))

    y_re, y_im = pl.pallas_call(
        _conv_kernel,
        grid=(h // RB,),
        in_specs=[
            pl.BlockSpec((c, RB, kp), lambda i: (0, i, 0),
                         memory_space=vm),
            pl.BlockSpec((c, RB, kp), lambda i: (0, i, 0),
                         memory_space=vm),
        ] + [pl.BlockSpec(memory_space=vm)] * 8,
        out_specs=[pl.BlockSpec((c, RB, kp), lambda i: (0, i, 0),
                                memory_space=vm)] * 2,
        out_shape=[jax.ShapeDtypeStruct((c, h, kp), f32)] * 2,
        interpret=interpret,
    )(f_re, f_im, wrr, wir, wri, wii,
      scale_re, shift_re, scale_im, shift_im)

    out = pl.pallas_call(
        _inv_kernel,
        grid=(c // CB,),
        in_specs=[
            pl.BlockSpec((CB, h, kp), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((CB, h, kp), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
            pl.BlockSpec(memory_space=vm),
        ],
        out_specs=pl.BlockSpec((CB, h, w), lambda i: (i, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((c, h, w), f32),
        interpret=interpret,
    )(y_re, y_im, jnp.asarray(ch), jnp.asarray(sh), jnp.asarray(icw),
      jnp.asarray(isw))
    return out
