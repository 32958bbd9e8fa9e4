"""Interleaved one-process A/B: LaMa full generator @1536 with the banded
reflect-conv fast path ON vs OFF (MIT_TPU_REFLECT_FAST is read at trace
time, so both variants trace in one process). Also checks numerical
agreement of the two graphs on device.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import lama

PAGE = 1536
REPS = 8


def timed(fn, *args, n=6):
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


def main():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)

    def make(flag):
        os.environ['MIT_TPU_REFLECT_FAST'] = flag

        @jax.jit
        def looped(img, mask):
            def body(i, s):
                m = mask + (s * 0).astype(mask.dtype)
                x = img.astype(jnp.bfloat16) * (1 - m.astype(jnp.bfloat16))
                out = lama.lama_generator_forward(params, x,
                                                  m.astype(jnp.bfloat16),
                                                  n_blocks=18)
                return s + out.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        @jax.jit
        def once(img, mask):
            x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
            return lama.lama_generator_forward(params, x,
                                               mask.astype(jnp.bfloat16),
                                               n_blocks=18)
        # trace+compile NOW, while the env value for this arm is still
        # set — jax.jit traces lazily at first call, and the flag is read
        # at trace time; without this both arms silently compile whichever
        # value was set last (the r3 "neutral A/B" bug, round 2 edition)
        t0 = time.perf_counter()
        float(once(img, mask).astype(jnp.float32).sum())
        float(looped(img, mask))
        print(f'compiled reflect_fast={flag} in '
              f'{time.perf_counter() - t0:.0f}s', flush=True)
        return looped, once

    loop_off, once_off = make('0')
    loop_on, once_on = make('1')

    a = np.asarray(once_off(img, mask), np.float32)
    b = np.asarray(once_on(img, mask), np.float32)
    print(f'max |diff| on device: {np.abs(a - b).max():.3e}', flush=True)

    for tag, fn in [('off', loop_off), ('on', loop_on),
                    ('off2', loop_off), ('on2', loop_on)]:
        t = timed(fn, img, mask) / REPS
        print(f'lama full-18 reflect_fast={tag}: {t*1e3:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
