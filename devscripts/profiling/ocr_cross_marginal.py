"""Decompose the fused OCR decode step (ops/pallas_decode) by sweeping
m_len (cross-attention memory chunks) and the step index (self-cache
prefix chunks) at the production shape n=120 (24 crops x 5 beams).

Marginal cost per cross chunk tells whether the cross pass is
DMA-bound (~0.9 us/chunk for a 720 KB k+v chunk at HBM speed) or
VPU-bound (the elementwise-product score trick, ~2-3 us/chunk) — which
decides whether beam-deduped memory streaming (5x less traffic) can pay.

Method: REPS sequential kernel launches inside one jit, serialized by a
data dependency (tgt_{i+1} = out_i); per-launch time = total / REPS.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import ocr48
from manga_image_translator_tpu.ops import pallas_decode as pd

NK = 120
S_PAD = 64
REPS = 200
VOCAB = 7935

params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
          for k, v in ocr48.init_params(dict_size=VOCAB).items()}
weights = pd.prepare_decode_weights(params)
rots_tab = pd.prepare_rots(ocr48.xpos_step_tables(S_PAD), ocr48.N_HEADS)

rs = np.random.RandomState(0)


def make_caches(m_pad):
    mem = jnp.asarray(rs.rand(NK, m_pad, ocr48.EMBD_DIM)
                      .astype(np.float32) * 0.1, jnp.bfloat16)
    base = ocr48.init_caches(params, mem, NK, 1)
    mask = jnp.zeros((NK, m_pad), bool)
    mem_k, mem_v = pd.prepare_mem(base.mem_k, base.mem_v, mask,
                                  m_pad=m_pad)
    self_k = jnp.asarray(
        rs.rand(pd.L, S_PAD, NK, pd.EP).astype(np.float32) * 0.1,
        jnp.bfloat16)
    self_v = jnp.asarray(
        rs.rand(pd.L, S_PAD, NK, pd.EP).astype(np.float32) * 0.1,
        jnp.bfloat16)
    return self_k, self_v, mem_k, mem_v


def run_case(m_pad, step, fused_gather=True):
    self_k, self_v, mem_k, mem_v = make_caches(m_pad)
    tgt0 = jnp.asarray(rs.rand(NK, pd.EP).astype(np.float32) * 0.1,
                       jnp.bfloat16)
    rots = rots_tab[step]
    step_a = jnp.asarray(step, jnp.int32)
    perm = jnp.eye(NK, dtype=jnp.bfloat16) if fused_gather else None

    @jax.jit
    def loop(tgt, sk, sv):
        def body(i, carry):
            tgt, sk, sv = carry
            out, k_new, v_new, _, sk, sv = pd.decode_step_pallas(
                step_a, tgt, rots, weights, sk, sv, mem_k, mem_v,
                n=NK, s_len=S_PAD, m_len=m_pad, vp=0, perm=perm,
                fused_gather=fused_gather)
            return out, sk, sv
        tgt, sk, sv = jax.lax.fori_loop(0, REPS, body, (tgt, sk, sv))
        return tgt.astype(jnp.float32).sum()

    float(loop(tgt0, self_k, self_v))   # compile+warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(tgt0, self_k, self_v))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS * 1e6
    print(f'm_pad={m_pad:4d} step={step:3d} fused_gather={fused_gather} '
          f'-> {per:8.1f} us/step  (runs {[f"{t/REPS*1e6:.1f}" for t in ts]})')
    return per


if __name__ == '__main__':
    print(f'backend={jax.default_backend()} n={NK} s_pad={S_PAD}')
    # cross sweep at fixed mid step
    t8 = run_case(8, 32)
    t72 = run_case(72, 32)
    t136 = run_case(136, 32)
    # self sweep at fixed m
    s0 = run_case(72, 0)
    s63 = run_case(72, 63)
    cross_per_chunk = (t136 - t8) / ((136 - 8) // pd.CH)
    self_per_chunk = (s63 - s0) / ((63 - 0) // pd.CH)
    # DMA floor: k+v chunk = 2 * CH * NK * EP * 2 bytes over ~819 GB/s,
    # times L layers
    chunk_bytes = 2 * pd.CH * NK * pd.EP * 2 * pd.L
    print(f'cross marginal: {cross_per_chunk:.2f} us per 8-row chunk '
          f'(all 5 layers); DMA floor ~{chunk_bytes / 819e3:.2f} us')
    print(f'self  marginal: {self_per_chunk:.2f} us per 8-row chunk '
          f'(all 5 layers)')
    print(f'fixed (m=8, step=32 extrapolated to 0 chunks): '
          f'{t8 - cross_per_chunk:.1f} us')
