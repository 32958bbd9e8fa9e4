#!/usr/bin/env python
"""Calibrate LaMa-18 crop-bucket cost vs the full-page forward (r4).

The masked-crop redesign (inpainting/crop_plan.py) replaces one 1536^2
forward with a batch of bucket-sized crops. This measures ms per forward for
each (batch, bh, bw) the planner commonly emits, so bucket choice and the
coverage-fallback threshold are driven by measured cost, not pixel counts.

Timing uses the bench.py on-chip fori_loop trick: REPS serialized reps per
jitted call, per-call tunnel floor subtracted.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import lama

REPS = 8
N_ITERS = 5


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


def timed_onchip(stage_fn, *args, floor=0.0):
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
    t = (time.perf_counter() - t0) / N_ITERS
    return max(t - floor, 0.0) / REPS


def main():
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    floor = call_floor()
    print(f'call floor {floor*1000:.1f} ms')
    rs = np.random.RandomState(2)

    def run(img, mask):
        x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
        out = lama.lama_generator_forward(params, x,
                                          mask.astype(jnp.bfloat16),
                                          n_blocks=18)
        return (out.astype(jnp.float32) * mask + img * (1 - mask)).sum()

    shapes = [
        (1, 1536, 1536),   # full-page baseline
        (1, 1024, 1024),   # full-page at inpainting_size=1024
        (8, 512, 320),
        (8, 384, 320),
        (8, 512, 512),
        (8, 320, 320),
        (8, 256, 256),
        (4, 512, 384),
        (16, 320, 256),
        (2, 768, 1024),
        (1, 768, 1024),
        (4, 512, 320),
        (2, 512, 320),
        (1, 512, 320),
    ]
    base = None
    for (n, h, w) in shapes:
        img = jnp.asarray(rs.rand(n, h, w, 3).astype(np.float32))
        mask = jnp.asarray((rs.rand(n, h, w, 1) < 0.15).astype(np.float32))
        t = timed_onchip(run, img, mask, floor=floor)
        px = n * h * w
        if base is None:
            base = t / px
        print(f'{n:3d}x{h:4d}x{w:4d}: {t*1000:7.1f} ms  '
              f'({t/px*1e9:6.2f} ns/px, {t/px/base:5.2f}x full-page/px)')


if __name__ == '__main__':
    main()
