"""Split the CURRENT 48px OCR decode step cost (fused kernel + fused
gather + fused top-k + deferred colors) into:

  kernel-only    — decode_step_pallas via the production harness, identity
                   parents, no char head, no beam bookkeeping
  +charhead      — plus the fused top-k launch
  full marginal  — beam_decode(max_len=64) - beam_decode(max_len=32) / 32

The gap (full marginal - (+charhead)) is what a beam-in-kernel multi-step
monolith could recover — the per-step XLA beam combine/latch ops and the
launch dispatch overhead.
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
from manga_image_translator_tpu.models.ocr48 import P, convnext_features, encoder_forward

N = 32
K = 5
NK = N * K
VOCAB = 7935

params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
          for k, v in ocr48.init_params(dict_size=VOCAB).items()}
params = ocr48.fuse_qkv_params(params)

rs = np.random.RandomState(0)
crops = jnp.asarray(rs.rand(N, 48, 256, 3).astype(np.float32) * 2 - 1)
widths = jnp.asarray(np.full((N,), 230, np.int32))


def timed(fn, *args, n=8):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(fn(*args))
        ts.append(time.perf_counter() - t0)

    @jax.jit
    def tiny(x):
        return x.sum()
    z = jnp.zeros((8, 128), jnp.float32)
    fs = []
    for _ in range(5):
        t0 = time.perf_counter(); float(tiny(z))
        fs.append(time.perf_counter() - t0)
    return max(min(ts) - min(fs), 0.0)


def full(max_len):
    @jax.jit
    def run(c, w):
        ret = ocr48.beam_decode(params, c, w, beams_k=K, max_len=max_len)
        return ret['probs'].sum() + ret['sequences'].astype(jnp.float32).sum()
    return timed(run, crops, widths)


def stepped(with_charhead, steps=64):
    harness = ocr48._pallas_harness(params, jnp.bfloat16, max_len=64)

    @jax.jit
    def run(c, w):
        memory = convnext_features(P(params).scope('backbone'), c)
        mem_len = memory.shape[1]
        valid = (w + 3) // 4 + 2
        mask = (jnp.arange(mem_len)[None, :]
                >= jnp.minimum(valid, mem_len)[:, None])
        memory = encoder_forward(params, memory, mask)
        memory_b = jnp.repeat(memory, K, axis=0)
        mask_b = jnp.repeat(mask, K, axis=0)
        caches = harness.init_caches(memory_b, NK, mask_b)
        tok = jnp.full((NK,), 1, jnp.int32)
        parent = jnp.arange(NK, dtype=jnp.int32)

        def body(i, carry):
            caches, s = carry
            dec, caches = harness.decode_step(caches, tok, i, mask_b,
                                              parent)
            if with_charhead:
                v, idx = harness.char_topk(dec, K)
                s = s + v.sum() + idx.astype(jnp.float32).sum()
            else:
                s = s + dec.astype(jnp.float32).sum()
            return caches, s

        _, s = jax.lax.fori_loop(0, steps, body, (caches, jnp.float32(0)))
        return s
    return timed(run, crops, widths)


def main():
    t32 = full(32)
    t64 = full(64)
    marginal = (t64 - t32) / 32
    print(f'beam_decode full: 32-step {t32*1e3:.2f} ms, '
          f'64-step {t64*1e3:.2f} ms -> marginal {marginal*1e3:.3f} ms/step',
          flush=True)

    tk = stepped(False) / 64
    print(f'kernel-only loop: {tk*1e3:.3f} ms/step', flush=True)
    tkc = stepped(True) / 64
    print(f'kernel+charhead loop: {tkc*1e3:.3f} ms/step', flush=True)
    print(f'=> beam bookkeeping + extra dispatch: '
          f'{(marginal - tkc)*1e3:.3f} ms/step', flush=True)


if __name__ == '__main__':
    main()
