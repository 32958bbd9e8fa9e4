#!/usr/bin/env python
"""Does the OCR beam-decode loop cost scale with n or with ceil(n/128)?

n = chunk_crops * beams(5) is the row dim of every per-step matmul in the
fused Pallas decode kernel. Measured r3: n=80 -> 0.225 ms/step, n=160 ->
0.45 ms/step — consistent with BOTH linear-in-n and MXU row-tile-count
(ceil(n/128)) scaling. This A/B decides: a 24-crop chunk (n=120, one
128-row tile) vs 16 (n=80) vs 32 (n=160, two tiles).

If tile-count wins, BIG_CHUNK should be 24: same loop price as the
16-crop tier while covering 1.5x the crops.
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


def main():
    params = bf16(ocr48.init_params(dict_size=7935))
    floor = call_floor()
    print(f'call floor {floor * 1000:.1f} ms')
    rs = np.random.RandomState(1)
    max_len = int(os.environ['MIT_TPU_OCR_MAX_LEN'])

    for n_crops in (16, 24, 32):
        crops = np.zeros((n_crops, 48, 256, 3), np.uint8)
        real = min(n_crops, 24)
        crops[:real] = rs.randint(0, 255, (real, 48, 256, 3),
                                  dtype=np.uint8)
        crops_j = jnp.asarray(crops, jnp.float32) / 127.5 - 1.0
        widths = np.zeros((n_crops,), np.int32)
        widths[:real] = [200 + (i % 5) * 10 for i in range(real)]
        widths_j = jnp.asarray(widths)

        def run(c, w):
            ret = ocr48.beam_decode(params, c, w, beams_k=5,
                                    max_len=max_len)
            return (ret['probs'].sum()
                    + ret['sequences'].astype(jnp.float32).sum())

        t = timed(run, crops_j, widths_j, floor=floor)
        n_rows = n_crops * 5
        print(f'chunk {n_crops:2d} (n={n_rows:3d}, tiles='
              f'{-(-n_rows // 128)}): {t * 1000:6.1f} ms '
              f'({t / n_crops * 1000:5.2f} ms/crop)')


if __name__ == '__main__':
    main()
