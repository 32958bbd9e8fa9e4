"""Interleaved one-process A/B of LaMa env flags on the bench harness.

Usage: python lama_flag_ab.py KEY=V1 KEY=V2 [KEY2=...]
Each argv arm is a comma-separated env assignment list; every arm's graph
is traced+compiled EAGERLY while its env values are set (the flags are
read at trace time inside models/lama.py — a lazily-traced closure would
silently measure whichever arm was set last).
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

PAGE = 1536
N_WARMUP = 2
N_ITERS = 5
REPS = 8

from manga_image_translator_tpu.models import lama

_CALL_FLOOR = None


def _call_floor():
    global _CALL_FLOOR
    if _CALL_FLOOR is None:
        x = jnp.zeros((8, 128), jnp.float32)

        @jax.jit
        def tiny(x):
            return x.sum()
        for _ in range(3):
            float(tiny(x))
        t0 = time.perf_counter()
        for _ in range(10):
            float(tiny(x))
        _CALL_FLOOR = (time.perf_counter() - t0) / 10
    return _CALL_FLOOR


def main():
    arms = sys.argv[1:]
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))

    def make(arm):
        for kv in arm.split(','):
            k, v = kv.split('=')
            os.environ[k] = v

        def run(img, mask):
            x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
            out = lama.lama_generator_forward(params, x,
                                              mask.astype(jnp.bfloat16),
                                              n_blocks=18)
            comp = out.astype(jnp.float32) * mask + img * (1 - mask)
            return comp.sum()

        @jax.jit
        def looped(*a):
            def body(i, s):
                bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype),
                                      a)
                return s + run(*bumped)
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        t0 = time.perf_counter()
        float(looped(img, mask))  # trace+compile NOW, env still set
        print(f'compiled {arm} in {time.perf_counter() - t0:.0f}s',
              flush=True)
        return looped

    fns = [(arm, make(arm)) for arm in arms]
    for rep in range(2):
        for arm, fn in fns:
            for _ in range(N_WARMUP):
                float(fn(img, mask))
            t0 = time.perf_counter()
            for _ in range(N_ITERS):
                float(fn(img, mask))
            t = ((time.perf_counter() - t0) / N_ITERS - _call_floor()) / REPS
            print(f'lama-full {arm} [pass{rep}]: {t*1e3:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
