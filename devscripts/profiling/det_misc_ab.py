#!/usr/bin/env python
"""Two small detection probes:

1. bilateral v2 (bf16 scratch): Mosaic rejected non-32-bit rotates in r2
   ("Rotate with non-32-bit data") — recheck on the current toolchain;
   bf16 planes would double VPU lane throughput.
2. DBNet forward at batch 16 vs 8 (b8 was ~1.5 ms/page cheaper than b4).
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

from manga_image_translator_tpu.models.dbnet import dbnet_forward, init_params
from manga_image_translator_tpu.ops.pallas_bilateral import (
    bilateral_filter_pallas)

REPS = 4
N_ITERS = 4


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
    floor = call_floor()
    print(f'call floor {floor * 1000:.1f} ms', flush=True)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randint(0, 255, (1536, 1536, 3), dtype=np.uint8))

    # 1. bilateral v2 compile recheck
    try:
        out = bilateral_filter_pallas(img, 17, 80.0, 80.0, variant='v2')
        out.block_until_ready()
        ref = bilateral_filter_pallas(img, 17, 80.0, 80.0, variant='v5')
        d = np.abs(np.asarray(out).astype(int) - np.asarray(ref).astype(int))
        t = timed(lambda x: bilateral_filter_pallas(
            x, 17, 80.0, 80.0, variant='v2').astype(jnp.float32).sum(),
            img, floor=floor)
        print(f'bilateral v2 (bf16) COMPILES: {t * 1000:.2f} ms, '
              f'max|diff| vs v5 = {d.max()}', flush=True)
    except Exception as e:
        print(f'bilateral v2 (bf16) still does not compile: '
              f'{type(e).__name__}: {str(e)[:160]}', flush=True)

    # 2. DBNet batch scaling
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in init_params(jax.random.PRNGKey(0)).items()}

    def run(pages):
        x = pages.astype(jnp.bfloat16) / 127.5 - 1.0
        db, mask = dbnet_forward(params, x)
        return (jax.nn.sigmoid(db[..., 0].astype(jnp.float32)).sum()
                + mask.astype(jnp.float32).sum())

    for nb in (16, 24, 32):
        pages = jnp.asarray(
            rs.randint(0, 255, (nb, 1536, 1536, 3), dtype=np.uint8))
        try:
            t = timed(run, pages, floor=floor)
            print(f'dbnet b{nb}: {t * 1000:.1f} ms '
                  f'({t / nb * 1000:.2f} ms/page)', flush=True)
        except Exception as e:
            print(f'dbnet b{nb} FAILED: {type(e).__name__}: '
                  f'{str(e)[:120]}', flush=True)


if __name__ == '__main__':
    main()
