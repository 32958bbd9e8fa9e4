#!/usr/bin/env python
"""Backbone batch amortization A/B: does one 48-crop backbone forward
feeding two 24-crop decode loops beat two fused backbone+decode programs?

r4 xprof showed the 24-crop ConvNeXt backbone is ~30 Compute-bound conv
fusions at 6-19% MXU utilization (small K,N with fused VPU epilogues) —
per-shape micro-optimization is exhausted; batch is the remaining lever.

Measures on the real chip:
  1. memory-only (compute_memory) at batch 24/48/96 — the backbone batch
     scaling curve
  2. decode-only (beam_decode_from_memory) at 24 and 48 crops
  3. control: fused beam_decode at 24 crops (today's bench lane)
  4. split: memory(48) + 2x decode(24) composed in ONE program
  5. big-loop alternative: fused beam_decode at 48 crops (n=240, 2 tiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ.setdefault('MIT_TPU_OCR_MAX_LEN', '64')

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import ocr48

REPS = 4
N_ITERS = 5


def bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}


def call_floor():
    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def tiny(x):
        return x.sum()
    for _ in range(3):
        float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(10):
        float(tiny(x))
    return (time.perf_counter() - t0) / 10


def timed(stage_fn, *args, floor=0.0):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            return s + stage_fn(*bumped)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    for _ in range(2):
        float(looped(*args))
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        float(looped(*args))
    return max((time.perf_counter() - t0) / N_ITERS - floor, 0.0) / REPS


def make_crops(rs, n, w=256):
    crops = rs.randint(0, 255, (n, 48, w, 3), dtype=np.uint8)
    crops_j = jnp.asarray(crops, jnp.float32) / 127.5 - 1.0
    widths = np.asarray([200 + (i % 5) * 10 for i in range(n)], np.int32)
    return crops_j, jnp.asarray(widths)


def main():
    params = bf16(ocr48.init_params(dict_size=7935))
    floor = call_floor()
    print(f'call floor {floor * 1000:.1f} ms', flush=True)
    rs = np.random.RandomState(1)
    max_len = int(os.environ['MIT_TPU_OCR_MAX_LEN'])

    # 1. memory-only batch scaling
    for n in (24, 48, 96):
        c, w = make_crops(rs, n)

        def mem_run(c, w):
            mem, msk = ocr48.compute_memory(params, c, w)
            return mem.astype(jnp.float32).sum()

        t = timed(mem_run, c, w, floor=floor)
        print(f'memory   n={n:3d}: {t * 1000:6.1f} ms '
              f'({t / n * 1000:5.3f} ms/crop)', flush=True)

    # 2. decode-only at 24 and 48
    c24, w24 = make_crops(rs, 24)
    c48, w48 = make_crops(rs, 48)
    mem24 = ocr48.compute_memory(params, c24, w24)
    mem48 = ocr48.compute_memory(params, c48, w48)

    def dec_run(mem, msk):
        ret = ocr48.beam_decode_from_memory(params, mem, msk, beams_k=5,
                                            max_len=max_len)
        return (ret['probs'].sum()
                + ret['sequences'].astype(jnp.float32).sum())

    t = timed(dec_run, *mem24, floor=floor)
    print(f'decode   n=24 (1 tile): {t * 1000:6.1f} ms '
          f'({t / 24 * 1000:5.2f} ms/crop)', flush=True)
    try:
        t = timed(dec_run, *mem48, floor=floor)
        print(f'decode   n=48 (2 tiles): {t * 1000:6.1f} ms '
              f'({t / 48 * 1000:5.2f} ms/crop)', flush=True)
    except Exception as e:
        # n=240 beam rows overflow the decode kernel's scoped VMEM stack
        # (measured: 17.52M vs 17M limit) — 48-crop single-loop decode is
        # structurally out of reach for this kernel design.
        print(f'decode   n=48: FAILED ({type(e).__name__}: '
              f'{str(e)[:120]})', flush=True)

    # 3. control: fused 24-crop beam_decode (the current bench lane)
    def fused(c, w):
        ret = ocr48.beam_decode(params, c, w, beams_k=5, max_len=max_len)
        return (ret['probs'].sum()
                + ret['sequences'].astype(jnp.float32).sum())

    t = timed(fused, c24, w24, floor=floor)
    print(f'fused    24-crop control: {t * 1000:6.1f} ms '
          f'({t / 24 * 1000:5.2f} ms/crop)', flush=True)

    # 4. split: one 48-crop memory + two 24-crop decodes, one program
    def split(c, w):
        mem, msk = ocr48.compute_memory(params, c, w)
        s = jnp.float32(0)
        for sl in (slice(0, 24), slice(24, 48)):
            ret = ocr48.beam_decode_from_memory(params, mem[sl], msk[sl],
                                                beams_k=5, max_len=max_len)
            s = s + (ret['probs'].sum()
                     + ret['sequences'].astype(jnp.float32).sum())
        return s

    t = timed(split, c48, w48, floor=floor)
    print(f'split    mem48 + 2x dec24: {t * 1000:6.1f} ms total '
          f'({t / 48 * 1000:5.2f} ms/crop, {t / 2 * 1000:6.1f} ms/24-page)',
          flush=True)

    # 5. big loop: fused 48-crop decode (n=240, two tiles)
    try:
        t = timed(fused, c48, w48, floor=floor)
        print(f'fused    48-crop big loop: {t * 1000:6.1f} ms '
              f'({t / 48 * 1000:5.2f} ms/crop)', flush=True)
    except Exception as e:
        print(f'fused    48-crop big loop: FAILED ({type(e).__name__}: '
              f'{str(e)[:120]})', flush=True)


if __name__ == '__main__':
    main()
