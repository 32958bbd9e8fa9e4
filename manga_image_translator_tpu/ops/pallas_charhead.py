"""Fused OCR char-head top-k: pred1+gelu, vocab matmul, per-chunk top-5
and online logsumexp in ONE kernel launch, never materializing the
(N, 7935) logits.

Motivation (NOTES round-3 roadmap #2): the 48px OCR decode loop's
per-step cost after the fused decode kernel (0.225 ms) is ~0.6 ms of XLA
epilogue, dominated by the char head — not its FLOPs (160×320×7935 MACs
≈ 5 µs) but the op-dispatch chain (dense, gelu, (E,V) matmul, top_k,
logsumexp) and the (N, V) f32 HBM round trip. Absorbing the vocab matmul
INTO the decode kernel measured slower twice (serial epilogue vs XLA's
pipelined dispatches, NOTES r2); this kernel instead replaces the whole
epilogue with one launch whose outputs are tiny ((N, chunks×5) candidates
+ (N,) logsumexp), leaving only a (N, chunks·5) top-k in XLA.

Reference contract: ocr/model_48px.py:678-801 beam scoring = log-softmax
of gelu(pred1(decoded)) @ embd.T + pred.bias.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VC = 1024          # vocab lanes per grid step
TOPC = 5           # per-chunk candidates kept (>= beam width)
NEG = -1e30


def _erf(x):
    """f32 erf via Abramowitz & Stegun 7.1.26 (|error| <= 1.5e-7):
    Mosaic has no erf primitive (same helper as ops/pallas_decode)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(dec_ref, w1_ref, b1_ref, wv_ref, bv_ref,
            vals_ref, idx_ref, lse_ref, h_scr, m_scr, s_scr,
            *, nk: int, nch: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _prologue():
        h_pre = _mm(dec_ref[:], w1_ref[:]) + b1_ref[:]
        h = h_pre * 0.5 * (1.0 + _erf(h_pre * (2 ** -0.5)))
        h_scr[:] = h.astype(jnp.bfloat16)
        m_scr[:] = jnp.full(m_scr.shape, NEG, jnp.float32)
        s_scr[:] = jnp.zeros(s_scr.shape, jnp.float32)

    logits = _mm(h_scr[:], wv_ref[:]) + bv_ref[:]          # (nk, VC) f32

    # online logsumexp accumulation (lane 0 of the 128-lane scratch)
    cm = jnp.max(logits, axis=1, keepdims=True)            # (nk, 1)
    cs = jnp.sum(jnp.exp(logits - cm), axis=1, keepdims=True)
    m_old = m_scr[:, 0:1]
    s_old = s_scr[:, 0:1]
    m_new = jnp.maximum(m_old, cm)
    s_new = (s_old * jnp.exp(m_old - m_new) + cs * jnp.exp(cm - m_new))
    m_scr[:, 0:1] = m_new
    s_scr[:, 0:1] = s_new

    @pl.when(i == nch - 1)
    def _epilogue():
        lse_ref[:] = jnp.broadcast_to(
            m_scr[:, 0:1] + jnp.log(s_scr[:, 0:1]), lse_ref.shape)

    # per-chunk top-5 extraction (values + global vocab indices)
    iota = jax.lax.broadcasted_iota(jnp.int32, (nk, VC), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nk, 128), 1)
    vacc = jnp.full((nk, 128), NEG, jnp.float32)
    iacc = jnp.zeros((nk, 128), jnp.int32)
    s = logits
    for j in range(TOPC):
        cmj = jnp.max(s, axis=1, keepdims=True)
        cidx = jnp.min(jnp.where(s >= cmj, iota, VC), axis=1,
                       keepdims=True)
        vacc = jnp.where(lane == j, cmj, vacc)
        iacc = jnp.where(lane == j, cidx + i * VC, iacc)
        s = jnp.where(iota == cidx, NEG, s)
    vals_ref[:] = vacc
    idx_ref[:] = iacc


@functools.partial(jax.jit, static_argnames=('k', 'interpret'))
def char_topk_fused(decoded: jax.Array, w1p, b1p, wvp, bvp,
                    k: int = 5, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """Top-k char log-probs of gelu(decoded@W1+b1) @ Wv + bv.

    Args:
      decoded: (NK, EP) — EP lane-padded embedding dim (zero pad cols).
      w1p: (EP, EP) bf16, b1p: (1, EP) f32 — pred1 (zero-padded).
      wvp: (EP, VP) bf16, bvp: (1, VP) f32 — vocab head; pad columns must
        carry bias NEG so they never reach the top-k and add ~0 to the
        logsumexp.
    Returns (logprobs (NK, k), indices (NK, k)).
    """
    nk, ep = decoded.shape
    vp = wvp.shape[1]
    assert vp % VC == 0 and nk % 8 == 0, (vp, nk)
    nch = vp // VC
    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, nk=nk, nch=nch),
        grid=(nch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # decoded
            pl.BlockSpec(memory_space=pltpu.VMEM),        # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),        # b1
            pl.BlockSpec((ep, VC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),        # wv chunk
            pl.BlockSpec((1, VC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),        # bv chunk
        ],
        out_specs=[
            pl.BlockSpec((nk, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nk, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nk, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nk, nch * 128), jnp.float32),
            jax.ShapeDtypeStruct((nk, nch * 128), jnp.int32),
            jax.ShapeDtypeStruct((nk, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nk, ep), jnp.bfloat16),
            pltpu.VMEM((nk, 128), jnp.float32),
            pltpu.VMEM((nk, 128), jnp.float32),
        ],
        interpret=interpret,
    )(decoded, w1p, b1p, wvp, bvp)

    cand_v = vals.reshape(nk, nch, 128)[:, :, :TOPC].reshape(nk,
                                                             nch * TOPC)
    cand_i = idx.reshape(nk, nch, 128)[:, :, :TOPC].reshape(nk, nch * TOPC)
    top_v, flat = jax.lax.top_k(cand_v, k)
    top_i = jnp.take_along_axis(cand_i, flat, axis=1)
    return top_v - lse[:, 0:1], top_i


def prepare_charhead(params: dict, ep: int = 384):
    """Pad the char-head weights for char_topk_fused.

    params keys (ocr48): pred1.0.weight (E,E) [in,out layout per
    models/functional.P.dense], pred1.0.bias (E,), embd.weight (V,E),
    pred.bias (V,).

    Traceable (jnp ops only): called INSIDE beam_decode's jit, where
    params are tracers — the pads are a few MB of on-device copies per
    chunk, noise next to the decode loop.
    """
    w1 = params['pred1.0.weight'].astype(jnp.float32)
    b1 = params['pred1.0.bias'].astype(jnp.float32)
    wv = params['embd.weight'].astype(jnp.float32).T       # (E, V)
    bv = params['pred.bias'].astype(jnp.float32)
    e = w1.shape[0]
    v = wv.shape[1]
    vp = -(-v // VC) * VC
    w1p = jnp.pad(w1, ((0, ep - e), (0, ep - e)))
    b1p = jnp.pad(b1, (0, ep - e))[None, :]
    wvp = jnp.pad(wv, ((0, ep - e), (0, vp - v)))
    bvp = jnp.pad(bv, (0, vp - v), constant_values=NEG)[None, :]
    return (w1p.astype(jnp.bfloat16), b1p,
            wvp.astype(jnp.bfloat16), bvp)
