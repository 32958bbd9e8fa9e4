"""Replicate bench.py's bench_inpainting() exactly, interleaving
MIT_TPU_REFLECT_FAST=0 / =1 graphs in one process to find whether the
146-vs-104 ms inpaint regression is the banded path or environment."""
import os
import time

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


def _timed_scalar(fn, *args, n=N_ITERS):
    for _ in range(N_WARMUP):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))

    def make(flag, img, mask):
        # The flag is read at TRACE time inside models/lama.py, so the
        # traced graph must be forced (warmup call) while the env value
        # is still set -- a lazy first call would trace whichever value
        # was set last.
        os.environ['MIT_TPU_REFLECT_FAST'] = flag

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

        float(looped(img, mask))  # trace+compile NOW, with env == flag
        return looped

    f0 = make('0', img, mask)
    f1 = make('1', img, mask)
    for tag, fn in [('flag0', f0), ('flag1', f1),
                    ('flag0b', f0), ('flag1b', f1)]:
        t = max(_timed_scalar(fn, img, mask) - _call_floor(), 0.0) / REPS
        print(f'bench-inpaint {tag}: {t*1e3:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
