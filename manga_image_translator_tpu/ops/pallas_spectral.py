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
