"""Fused OCR decoder step — all 5 transformer layers in one Pallas kernel.

Why: the 48px OCR beam decode is dispatch-bound: ~115 small XLA ops per
while_loop step at ~5 us sequencer overhead each (~0.6 ms/step before the
char head), while the actual math is ~1.3 GFLOP. This kernel runs the
whole per-step decoder stack (self-attention with KV cache, XPOS
rotation, cross-attention, feed-forward) as ONE launch: per-layer dense
packs and FF weights stream from HBM double-buffered, KV caches stream in
CH-row chunks through a single-pass ONLINE softmax (flash-attention
style), and the causal pass visits only ceil((step+1)/CH) chunks so a
step costs O(step) cache traffic rather than O(max_len).

Design notes (reference semantics: models/ocr48.py decode_step, itself
from reference ocr/model_48px.py infer_beam_batch_tensor):

* Every lane (last-dim) extent is a multiple of 128: the embedding dim is
  zero-padded 320 -> 384 (Mosaic requires 128-aligned lanes on DMA'd
  buffers, and lane-4 score buffers would pad 4 -> 128, a 32x VMEM
  blowup — the online softmax keeps all (n, H) statistics in vregs).
* XPOS rotation is realized as x*cos + (x @ J)*sin where J is the
  constant pair-swap matrix — a tiny MXU matmul instead of lane
  shuffles, which Mosaic handles poorly.
* Per-head attention at decode time is a batched matvec, which the MXU
  cannot tile; chunk scores are computed as an elementwise product with
  the query followed by a segment-sum matmul against a 0/1 (EP, H)
  matrix, and the value mix expands (.., H) weights back to (.., EP)
  through the transposed segment matrix.
* The cross-attention length mask rides the pad lane E (=320): the
  prerotated memory keys carry the additive mask value there
  (prepare_mem), the cross-q bias is 1.0 there (prepare_decode_weights),
  and the segment matrix sums that lane into every head's score. The
  self-attention K/V rows keep lane E zero, so the same segment matrix
  adds nothing on the causal pass.
* KV caches live in HBM as (L, S, N, EP) so a chunk DMA is contiguous;
  the CURRENT step's k/v are written into the streamed chunk in VMEM, so
  attention covers position ``step`` without a separate path, and are
  also returned for the XLA side to persist with one
  dynamic_update_slice each.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 320           # model embedding dim
EP = 384          # lane-padded embedding dim
H = 4
HD = 80
L = 5
FF = 2048
CH = 8            # causal cache chunk rows streamed per DMA
# Cross-attention chunk rows: the memory K/V have no step dependence, so
# wider chunks amortize the per-chunk issue overhead (measured 13.5 us
# per 8-row chunk vs a 9.0 us DMA floor at n=120 — ocr_cross_marginal).
# The kernel falls back to CH when m_len is not a CHX multiple (legacy
# callers round to CH).
CHX = int(os.environ.get('MIT_TPU_OCR_CROSS_CH', '24'))

NEG = -1e9        # additive mask value (finite: -inf breeds NaNs in the
                  # online-softmax rescale)

# Measurement-only hooks (devscripts/profiling/ocr_perm_bound.py): 'skip'
# removes the beam permute AND its write-back from the fused-gather path,
# 'nowb' keeps the permute matmuls but drops the write-back. Both produce
# WRONG sequences — they exist to bound what a lazy composed-permutation
# decode scheme could win before building one. Never set in production.
_PERM_DEBUG = os.environ.get('MIT_TPU_OCR_PERM_DEBUG', '')


def pad_e(x, axis: int = -1, value: float = 0.0):
    """Pad ``axis`` from E to EP (jnp or np)."""
    if x.shape[axis] == EP:
        return x
    assert x.shape[axis] == E, x.shape
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, EP - E)
    if isinstance(x, jax.Array):
        return jnp.pad(x, pads, constant_values=value)
    return np.pad(x, pads, constant_values=value)


def _pair_swap_matrix() -> np.ndarray:
    """(EP, EP) with J[2i+1, 2i] = -1, J[2i, 2i+1] = 1 per head-dim pair
    (zero in the lane-pad region): x @ J == rotate-pairs(x)."""
    j = np.zeros((EP, EP), np.float32)
    for i in range(0, E, 2):
        j[i + 1, i] = -1.0
        j[i, i + 1] = 1.0
    return j


def _segment_matrix() -> np.ndarray:
    """(EP, H) head-sum matrix; row E is all-ones so the mask value riding
    pad lane E of the memory keys lands in every head's score."""
    seg = np.zeros((EP, H), np.float32)
    for h in range(H):
        seg[h * HD:(h + 1) * HD, h] = 1.0
    seg[E, :] = 1.0
    return seg


def _value_segment_matrix() -> np.ndarray:
    """(H, EP) head-expand matrix WITHOUT the mask row: value mixing and
    softmax-weight expansion must not write into the pad lanes."""
    seg = np.zeros((H, EP), np.float32)
    for h in range(H):
        seg[h, h * HD:(h + 1) * HD] = 1.0
    return seg


def _ln(x, w, b):
    """LayerNorm over the E *logical* lanes of an (n, EP) tile. Input pads
    are zero by construction (all weights are zero-padded), so plain sums
    divide by E; the (x - mean) shift is masked back to zero on pads."""
    xf = x.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, xf.shape, xf.ndim - 1)
    mean = jnp.sum(xf, -1, keepdims=True) / E
    d = jnp.where(lane < E, xf - mean, 0.0)
    var = jnp.sum(d * d, -1, keepdims=True) / E
    return d * jax.lax.rsqrt(var + 1e-5) * w + b


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _erf(x):
    """f32 erf via Abramowitz & Stegun 7.1.26 (|error| <= 1.5e-7):
    Mosaic has no erf primitive."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _decode_kernel(step_ref, tgt_ref, perm_ref, rots_ref, bbig_ref,
                   lnw_ref, lnb_ref, ffb1_ref, ffb2_ref, jmat_ref, seg_ref,
                   segv_ref, wpred1_ref, bpred1_ref, bout_ref,
                   selfk_hbm, selfv_hbm, memk_hbm, memv_hbm,
                   wbig_hbm, ff1_hbm, ff2_hbm, *rest,
                   n: int, s_len: int, m_len: int, vp: int, vch: int,
                   fused_gather: bool):
    rest = list(rest)
    wout_hbm = rest.pop(0) if vp else None
    out_ref = rest.pop(0)
    knew_ref = rest.pop(0)
    vnew_ref = rest.pop(0)
    logits_ref = rest.pop(0) if vp else None
    if fused_gather:
        # aliased in-place cache outputs (same HBM as selfk/v_hbm)
        selfk_out = rest.pop(0)
        selfv_out = rest.pop(0)
    kbuf, vbuf, kxbuf, vxbuf, wbuf, ff1buf, ff2buf = rest[:7]
    rest = rest[7:]
    pbuf = rest.pop(0) if vp else None
    ksem, vsem, kxsem, vxsem, wsem, ffsem = rest[:6]
    rest = rest[6:]
    psem = rest.pop(0) if vp else None
    if fused_gather:
        wbk_sem = rest.pop(0)
        wbv_sem = rest.pop(0)
    step = step_ref[0, 0]
    jmat = jmat_ref[:]
    seg = seg_ref[:]          # (EP, H) score-sum (incl. mask row E)
    segv = segv_ref[:]        # (H, EP) head-expand (pad lanes zero)

    def rot(x, sin_row, cos_row):
        return (x * cos_row + _mm(x, jmat).astype(x.dtype)
                * sin_row).astype(x.dtype)

    sq_sin = rots_ref[0:1, :].astype(jnp.bfloat16)
    sq_cos = rots_ref[1:2, :].astype(jnp.bfloat16)
    sk_sin = rots_ref[2:3, :].astype(jnp.bfloat16)
    sk_cos = rots_ref[3:4, :].astype(jnp.bfloat16)
    cq_sin = rots_ref[4:5, :].astype(jnp.bfloat16)
    cq_cos = rots_ref[5:6, :].astype(jnp.bfloat16)

    # cross chunk width: CHX when the (static) memory length allows it,
    # legacy CH otherwise — decided at trace time
    chx = CHX if m_len % CHX == 0 else CH

    def dma_ff(l):
        return (pltpu.make_async_copy(ff1_hbm.at[l], ff1buf, ffsem.at[0]),
                pltpu.make_async_copy(ff2_hbm.at[l], ff2buf, ffsem.at[1]))

    def dma_w(l, slot):
        return pltpu.make_async_copy(wbig_hbm.at[l], wbuf.at[slot],
                                     wsem.at[slot])

    def dma_p(v, slot):
        return pltpu.make_async_copy(wout_hbm.at[:, pl.ds(v * vch, vch)],
                                     pbuf.at[slot], psem.at[slot])


    tgt = tgt_ref[:]

    def attention(q_rot, hbm_k, hbm_v, l, n_chunks, causal, kr, vr,
                  ch, kb, vb, ks, vs):
        """Single-pass online-softmax attention over streamed chunks of
        ``ch`` rows (CH on the causal pass, chx on the cross pass);
        returns (n, EP) f32 (pad lanes zero). Running max / denominator
        stay per-(n, H) in vregs — nothing score-shaped ever hits VMEM.

        fused_gather (causal only): each streamed chunk is beam-permuted
        in VMEM via a one-hot matmul (exact row selection on the MXU) and
        written back to HBM — the XLA-side per-step cache gather and its
        full-S read+write round trip disappear; the kernel touches only
        the chunks the causal pass visits anyway."""
        if causal:
            n_needed = (step + ch) // ch          # dynamic trip count
        else:
            n_needed = n_chunks
        do_permute = causal and fused_gather and _PERM_DEBUG != 'skip'
        do_writeback = do_permute and _PERM_DEBUG != 'nowb'

        def dma_k(c, slot):
            return pltpu.make_async_copy(
                hbm_k.at[l, pl.ds(c * ch, ch)], kb.at[slot], ks.at[slot])

        def dma_v(c, slot):
            return pltpu.make_async_copy(
                hbm_v.at[l, pl.ds(c * ch, ch)], vb.at[slot], vs.at[slot])

        def body(c, carry):
            m_run, l_run, acc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_needed)
            def _prefetch():
                nslot = jax.lax.rem(c + 1, 2)
                dma_k(c + 1, nslot).start()
                dma_v(c + 1, nslot).start()

            dma_k(c, slot).wait()
            dma_v(c, slot).wait()
            lo = c * ch
            if do_permute:
                pm = perm_ref[:]
                for rr in range(ch):
                    kb[slot, rr] = _mm(pm, kb[slot, rr]).astype(
                        jnp.bfloat16)
                    vb[slot, rr] = _mm(pm, vb[slot, rr]).astype(
                        jnp.bfloat16)
            if causal:
                in_chunk = (step >= lo) & (step < lo + ch)

                @pl.when(in_chunk)
                def _():
                    kb[slot, step - lo] = kr
                    vb[slot, step - lo] = vr
            if do_writeback:
                pltpu.make_async_copy(
                    kb.at[slot], selfk_out.at[l, pl.ds(lo, ch)],
                    wbk_sem.at[slot]).start()
                pltpu.make_async_copy(
                    vb.at[slot], selfv_out.at[l, pl.ds(lo, ch)],
                    wbv_sem.at[slot]).start()

            prod = kb[slot] * q_rot[None]
            sc = _mm(prod.reshape(ch * n, EP).astype(jnp.bfloat16),
                     seg).reshape(ch, n, H)
            if causal:
                row = (jax.lax.broadcasted_iota(jnp.int32, (ch, n, H), 0)
                       + lo)
                sc = jnp.where(row > step, NEG, sc)

            m_new = jnp.maximum(m_run, jnp.max(sc, axis=0))
            alpha = jnp.exp(m_run - m_new)                  # (n, H)
            p = jnp.exp(sc - m_new[None])                   # (ch, n, H)
            l_new = l_run * alpha + jnp.sum(p, axis=0)
            w_e = _mm(p.reshape(ch * n, H).astype(jnp.bfloat16),
                      segv).reshape(ch, n, EP)
            scale = _mm(alpha.astype(jnp.bfloat16), segv)   # (n, EP)
            acc = acc * scale + jnp.sum(
                w_e * vb[slot].astype(jnp.float32), axis=0)
            if do_writeback:
                # drain the write-back before this slot can be prefetched
                # into two iterations from now (it overlapped the score
                # math above)
                pltpu.make_async_copy(
                    kb.at[slot], selfk_out.at[l, pl.ds(lo, ch)],
                    wbk_sem.at[slot]).wait()
                pltpu.make_async_copy(
                    vb.at[slot], selfv_out.at[l, pl.ds(lo, ch)],
                    wbv_sem.at[slot]).wait()
            return m_new, l_new, acc

        dma_k(0, 0).start()
        dma_v(0, 0).start()
        m0 = jnp.full((n, H), NEG, jnp.float32)
        l0 = jnp.zeros((n, H), jnp.float32)
        acc0 = jnp.zeros((n, EP), jnp.float32)
        _, l_fin, acc = jax.lax.fori_loop(0, n_needed, body,
                                          (m0, l0, acc0))
        dinv = 1.0 / (l_fin + 1e-9)
        return acc * _mm(dinv.astype(jnp.bfloat16), segv)

    dma_w(0, 0).start()
    for l in range(L):
        # prefetch this layer's FF weights and the NEXT layer's dense pack
        # during attention
        ff_dmas = dma_ff(l)
        ff_dmas[0].start()
        ff_dmas[1].start()
        dma_w(l, l % 2).wait()
        if l + 1 < L:
            dma_w(l + 1, (l + 1) % 2).start()
        slot = l % 2

        # slice each projection out of the packed buffer AT THE REF level:
        # Mosaic rejects lane-offset slices of computed values, but static
        # 128-aligned memref slices are fine
        def wsl(i):
            return wbuf[slot, :, i * EP:(i + 1) * EP]

        def bsl(i):
            return bbig_ref[l:l + 1, i * EP:(i + 1) * EP]

        xn = _ln(tgt, lnw_ref[l, 0:1, :], lnb_ref[l, 0:1, :]).astype(
            jnp.bfloat16)
        q = (_mm(xn, wsl(0)) + bsl(0)).astype(jnp.bfloat16)
        k = (_mm(xn, wsl(1)) + bsl(1)).astype(jnp.bfloat16)
        v = (_mm(xn, wsl(2)) + bsl(2)).astype(jnp.bfloat16)
        qr = rot(q, sq_sin, sq_cos)
        kr = rot(k, sk_sin, sk_cos)
        knew_ref[l] = kr
        vnew_ref[l] = v

        attn = attention(qr, selfk_hbm, selfv_hbm, l, s_len // CH,
                         True, kr, v, CH, kbuf, vbuf, ksem,
                         vsem).astype(jnp.bfloat16)
        tgt = (tgt.astype(jnp.float32)
               + _mm(attn, wsl(3)) + bsl(3)).astype(jnp.bfloat16)

        # ---- cross attention over prerotated memory K/V (additive mask
        # rides pad lane E of the keys; cross-q bias there is 1.0) ----
        xn2 = _ln(tgt, lnw_ref[l, 1:2, :], lnb_ref[l, 1:2, :]).astype(
            jnp.bfloat16)
        q2 = (_mm(xn2, wsl(4)) + bsl(4)).astype(jnp.bfloat16)
        q2r = rot(q2, cq_sin, cq_cos)
        attn2 = attention(q2r, memk_hbm, memv_hbm, l, m_len // chx,
                          False, None, None, chx, kxbuf, vxbuf, kxsem,
                          vxsem).astype(jnp.bfloat16)
        tgt = (tgt.astype(jnp.float32)
               + _mm(attn2, wsl(5)) + bsl(5)).astype(jnp.bfloat16)

        # ---- feed-forward (weights prefetched above) ----
        ff_dmas[0].wait()
        ff_dmas[1].wait()
        xn3 = _ln(tgt, lnw_ref[l, 2:3, :], lnb_ref[l, 2:3, :]).astype(
            jnp.bfloat16)
        h1 = jnp.maximum(_mm(xn3, ff1buf[:]) + ffb1_ref[l:l + 1, :],
                         0.0).astype(jnp.bfloat16)
        tgt = (tgt.astype(jnp.float32)
               + _mm(h1, ff2buf[:]) + ffb2_ref[l:l + 1, :]).astype(
                   jnp.bfloat16)

    out_ref[:] = tgt

    if not vp:
        return
    # ---- char head: h = gelu(pred1 @ tgt), logits = h @ embd.T + bias —
    # vocab matrix streamed in vch-lane chunks; rounding matches the XLA
    # path (bf16 matmul results, f32 bias add). MEASURED SLOWER than the
    # XLA char head on v5e (59.3 vs 53.6 ms per forced-64-step chunk —
    # the one big (E,V) matmul beats 7 chunked DMA'd matmuls), so the
    # harness enables this only via MIT_TPU_OCR_KERNEL_CHARHEAD=1.
    h_pre = (_mm(tgt, wpred1_ref[:]).astype(jnp.bfloat16)
             + bpred1_ref[0:1, :]).astype(jnp.float32)
    # exact-gelu via erf; Mosaic has no erf/erfc lowering, so use the
    # Abramowitz-Stegun 7.1.26 rational approximation (<=1.5e-7 absolute
    # error — invisible under the bf16 cast that follows)
    h = (0.5 * h_pre
         * (1.0 + _erf(h_pre * (2 ** -0.5)))).astype(jnp.bfloat16)
    n_vch = vp // vch
    dma_p(0, 0).start()
    for v in range(n_vch):
        if v + 1 < n_vch:
            dma_p(v + 1, (v + 1) % 2).start()
        dma_p(v, v % 2).wait()
        chunk = _mm(h, pbuf[v % 2]).astype(jnp.bfloat16)
        logits_ref[:, v * vch:(v + 1) * vch] = (
            chunk.astype(jnp.float32) + bout_ref[0:1, v * vch:(v + 1) * vch])


def round_m(m: int) -> int:
    """Round a memory length up so it divides into chx-row cross chunks
    (lcm of CH and CHX keeps the legacy CH fallback exact too)."""
    import math
    step = CH * CHX // math.gcd(CH, CHX)
    return -(-m // step) * step


def _vocab_chunk(vp: int) -> int:
    for cand in (1152, 1024, 896, 768, 640, 512, 384, 256, 128):
        if vp % cand == 0:
            return cand
    raise ValueError(f'vocab pad {vp} not a multiple of 128')


@functools.partial(jax.jit, static_argnames=('n', 's_len', 'm_len', 'vp',
                                             'fused_gather', 'interpret'))
def decode_step_pallas(step, tgt, rots, weights: Dict, self_k, self_v,
                       mem_k, mem_v, n: int, s_len: int,
                       m_len: int, vp: int, perm=None,
                       fused_gather: bool = False,
                       interpret: bool = False
                       ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                  jax.Array, jax.Array, jax.Array]:
    """One fused decoder step.

    Args:
      step: scalar int32.
      tgt: (N, EP) bf16 token embeddings (pad_e'd).
      rots: (6, EP) f32 per-step rotation rows (prepare_rots).
      weights: stacked params (prepare_decode_weights).
      self_k/self_v: (L, S, N, EP) bf16 caches (HBM).
      mem_k/mem_v: (L, M, N, EP) bf16 prerotated memory (prepare_mem —
        mem_k lane E carries the additive length mask).
      perm: (N, N) bf16 one-hot beam-parent matrix (fused_gather mode).
      fused_gather: permute + write back each streamed cache chunk
        in-kernel (the caches are donated/aliased and updated in place);
        the XLA-side cache gather AND the k/v dynamic_update_slice become
        unnecessary.
    Returns (tgt_out (N,EP), k_new (L,N,EP), v_new (L,N,EP), logits|None,
    self_k', self_v') — the cache outputs alias the inputs (unchanged
    objects in non-fused mode).
    """
    vch = _vocab_chunk(vp) if vp else 0
    kernel = functools.partial(_decode_kernel, n=n, s_len=s_len,
                               m_len=m_len, vp=vp, vch=vch,
                               fused_gather=fused_gather)
    vm = pltpu.VMEM
    out_shape = [
        jax.ShapeDtypeStruct((n, EP), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, n, EP), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, n, EP), jnp.bfloat16),
    ]
    chx = CHX if m_len % CHX == 0 else CH
    scratch = [
        pltpu.VMEM((2, CH, n, EP), jnp.bfloat16),     # self k chunks
        pltpu.VMEM((2, CH, n, EP), jnp.bfloat16),     # self v chunks
        pltpu.VMEM((2, chx, n, EP), jnp.bfloat16),    # cross k chunks
        pltpu.VMEM((2, chx, n, EP), jnp.bfloat16),    # cross v chunks
        pltpu.VMEM((2, EP, 6 * EP), jnp.bfloat16),    # dense-pack x2
        pltpu.VMEM((EP, FF), jnp.bfloat16),           # ff1
        pltpu.VMEM((FF, EP), jnp.bfloat16),           # ff2
    ]
    sems = [pltpu.SemaphoreType.DMA((2,))] * 6
    if perm is None:
        perm = jnp.zeros((n, n), jnp.bfloat16)
    args = [jnp.reshape(step.astype(jnp.int32), (1, 1)), tgt, perm, rots,
            weights['bbig'], weights['ln_w'], weights['ln_b'],
            weights['ffb1'], weights['ffb2'], weights['jmat'],
            weights['seg'], weights['segv'], weights['wpred1'],
            weights['bpred1'], weights['bout'],
            self_k, self_v, mem_k, mem_v,
            weights['wbig'], weights['ff1'], weights['ff2']]
    n_any = 7
    if vp:
        out_shape.append(jax.ShapeDtypeStruct((n, vp), jnp.float32))
        scratch.append(pltpu.VMEM((2, EP, vch), jnp.bfloat16))
        sems.append(pltpu.SemaphoreType.DMA((2,)))
        args.append(weights['wout'])
        n_any = 8
    io_aliases = {}
    out_specs = [pl.BlockSpec(memory_space=vm)] * len(out_shape)
    if fused_gather:
        # aliased cache outputs live in ANY (HBM) like their inputs;
        # input indices: self_k = 15, self_v = 16 (see args order above)
        io_aliases = {15: len(out_shape), 16: len(out_shape) + 1}
        out_shape.append(
            jax.ShapeDtypeStruct((L, s_len, n, EP), jnp.bfloat16))
        out_shape.append(
            jax.ShapeDtypeStruct((L, s_len, n, EP), jnp.bfloat16))
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        sems += [pltpu.SemaphoreType.DMA((2,)),
                 pltpu.SemaphoreType.DMA((2,))]
    res = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # step
        ] + [pl.BlockSpec(memory_space=vm)] * 14
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_any,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch + sems,
        input_output_aliases=io_aliases,
        # the S=256 second-tier decode at n=160 sits ~100KB over the 16MB
        # default scoped-vmem budget (measured crash on v5e), and the
        # double-buffered chx-row cross chunks add up to ~12MB at n=160;
        # grant the headroom (v5e VMEM is 128MB/core)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=34 << 20),
        interpret=interpret,
    )(*args)
    res = list(res)
    out, knew, vnew = res[0], res[1], res[2]
    logits = res[3] if vp else None
    if fused_gather:
        selfk_new, selfv_new = res[-2], res[-1]
    else:
        selfk_new, selfv_new = self_k, self_v
    return out, knew, vnew, logits, selfk_new, selfv_new


def prepare_decode_weights(params: Dict) -> Dict[str, jax.Array]:
    """Stack the 5 decoder layers into the kernel's layout, every E-extent
    zero-padded to EP lanes (done once per chunk, outside the decode
    loop)."""
    from ..models.functional import P
    p = P(params)

    def dense_w(att, proj):
        w = jnp.stack([
            p[f'decoders.{l}.{att}.{proj}.weight'] for l in range(L)
        ]).astype(jnp.bfloat16)
        return pad_e(pad_e(w, 1), 2)

    def dense_b(att, proj):
        b = jnp.stack([
            p[f'decoders.{l}.{att}.{proj}.bias'] for l in range(L)
        ]).astype(jnp.float32)
        return pad_e(b, 1)

    # fold the attention scale into the q projection; pack the six dense
    # projections per layer into ONE (L, EP, 6*EP) tensor, streamed from
    # HBM layer-by-layer (double-buffered) — they don't fit VMEM resident.
    # Lane order: [q | k | v | self_out | cross_q | cross_out].
    scale = HD ** -0.5
    wbig = jnp.concatenate([
        dense_w('self_attn', 'q_proj') * scale,
        dense_w('self_attn', 'k_proj'),
        dense_w('self_attn', 'v_proj'),
        dense_w('self_attn', 'out_proj'),
        dense_w('multihead_attn', 'q_proj') * scale,
        dense_w('multihead_attn', 'out_proj'),
    ], axis=2)
    bbig = jnp.concatenate([
        dense_b('self_attn', 'q_proj') * scale,
        dense_b('self_attn', 'k_proj'),
        dense_b('self_attn', 'v_proj'),
        dense_b('self_attn', 'out_proj'),
        dense_b('multihead_attn', 'q_proj') * scale,
        dense_b('multihead_attn', 'out_proj'),
    ], axis=1)
    # cross-q bias pad lane E := 1.0 so q2r picks up the mask riding the
    # memory keys' pad lane E (rot/cos there is identity: prepare_rots)
    bbig = bbig.at[:, 4 * EP + E].set(1.0)
    out = {
        'wbig': wbig,
        'bbig': bbig,
        'ln_w': pad_e(jnp.stack([jnp.stack([
            p[f'decoders.{l}.norm{i}.weight'].astype(jnp.float32)
            for i in (1, 2, 3)]) for l in range(L)]), 2),
        'ln_b': pad_e(jnp.stack([jnp.stack([
            p[f'decoders.{l}.norm{i}.bias'].astype(jnp.float32)
            for i in (1, 2, 3)]) for l in range(L)]), 2),
        'ff1': pad_e(jnp.stack([p[f'decoders.{l}.linear1.weight']
                                for l in range(L)]).astype(jnp.bfloat16), 1),
        'ffb1': jnp.stack([p[f'decoders.{l}.linear1.bias']
                           for l in range(L)]).astype(jnp.float32),
        'ff2': pad_e(jnp.stack([p[f'decoders.{l}.linear2.weight']
                                for l in range(L)]).astype(jnp.bfloat16), 2),
        'ffb2': pad_e(jnp.stack([p[f'decoders.{l}.linear2.bias']
                                 for l in range(L)]).astype(jnp.float32), 1),
        'jmat': jnp.asarray(_pair_swap_matrix(), jnp.bfloat16),
        'seg': jnp.asarray(_segment_matrix(), jnp.bfloat16),
        'segv': jnp.asarray(_value_segment_matrix(), jnp.bfloat16),
    }
    # char head: logits = gelu(out @ pred1) @ embd.T + pred.bias, vocab
    # lane-padded to a 128 multiple with -1e9 bias so top-k never selects
    # the pad entries
    embd = p['embd.weight']                      # (V, E)
    v = embd.shape[0]
    vp = -(-v // 128) * 128
    wout = pad_e(embd.T.astype(jnp.bfloat16), 0)          # (EP, V)
    wout = jnp.pad(wout, ((0, 0), (0, vp - v)))
    bout = jnp.pad(p['pred.bias'].astype(jnp.float32), (0, vp - v),
                   constant_values=NEG).reshape(1, vp)
    out['wout'] = wout
    out['bout'] = bout
    out['wpred1'] = pad_e(pad_e(
        p['pred1.0.weight'].astype(jnp.bfloat16), 0), 1)
    out['bpred1'] = pad_e(p['pred1.0.bias'].astype(jnp.bfloat16)
                          ).reshape(1, EP)
    return out


def prepare_rots(xpos_tables: dict, n_heads: int) -> jax.Array:
    """(S, 6, EP) per-step rotation rows from models.ocr48.xpos_step_tables
    output. Pad lanes: sin = 0, cos = 1 (identity rotation) so the mask
    value riding pad lane E survives the cross-q rotation."""
    rows = []
    for name in ('self_q', 'self_k', 'cross_q'):
        sin, cos = xpos_tables[name]
        rows.append(pad_e(jnp.tile(sin, (1, n_heads)), value=0.0))
        rows.append(pad_e(jnp.tile(cos, (1, n_heads)), value=1.0))
    # order: sq_sin, sq_cos, sk_sin, sk_cos, cq_sin, cq_cos
    return jnp.stack(rows, axis=1).astype(jnp.float32)


def prepare_mem(mem_k: jax.Array, mem_v: jax.Array,
                memory_mask: jax.Array, m_pad: int = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Reference-layout (L, N, H, M, hd) prerotated memory K/V →
    kernel-layout (L, M_pad, N, EP) bf16, with the additive length mask
    (True = masked, shape (N, M_pad)) written into mem_k's pad lane E.
    ``m_pad`` rounds the memory length up to a CH multiple (the extra
    rows are zero + masked)."""
    l, n, h, m, hd = mem_k.shape
    m_pad = m if m_pad is None else m_pad
    mk = pad_e(jnp.transpose(mem_k, (0, 3, 1, 2, 4)).reshape(l, m, n, E)
               .astype(jnp.bfloat16))
    mv = pad_e(jnp.transpose(mem_v, (0, 3, 1, 2, 4)).reshape(l, m, n, E)
               .astype(jnp.bfloat16))
    if m_pad != m:
        padrows = [(0, 0), (0, m_pad - m), (0, 0), (0, 0)]
        mk = jnp.pad(mk, padrows)
        mv = jnp.pad(mv, padrows)
    maskval = jnp.where(memory_mask.T, NEG, 0.0).astype(jnp.bfloat16)
    mk = mk.at[:, :, :, E].set(maskval[None])
    return mk, mv
