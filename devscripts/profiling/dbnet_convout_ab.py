"""Interleaved one-process A/B of deconv packing on the bench detection
workload (DBNet-R34 @1536, batch 4).

DBNet arm of the conv output-dtype question (the r3 global A/B covered
lama/ocr only): xprof hlo_stats shows 13.2 ms/4-page batch of 'data
formatting' (unfused f32->bf16 converts + retiling) around the conv calls —
MIT_TPU_CONV_NATIVE_OUT=1 requests bf16 conv output directly.

Each arm's graph is traced+compiled EAGERLY while its env value is set —
the flag is read at trace time inside functional.P.conv_t.
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

from manga_image_translator_tpu.models.dbnet import dbnet_forward, init_params

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
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in init_params(jax.random.PRNGKey(0)).items()}
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(4, PAGE, PAGE, 3).astype(np.float32)
                    * 2 - 1).astype(jnp.bfloat16)

    def make(flag):
        os.environ['MIT_TPU_CONV_NATIVE_OUT'] = flag

        def run(x):
            db, mask = dbnet_forward(params, x)
            return (db.astype(jnp.float32).sum()
                    + mask.astype(jnp.float32).sum())

        @jax.jit
        def looped(x):
            def body(i, s):
                return s + run(x + (s * 0).astype(x.dtype))
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        t0 = time.perf_counter()
        float(looped(x))  # trace+compile NOW, env still set
        print(f'compiled native_out={flag} in {time.perf_counter() - t0:.0f}s',
              flush=True)
        return looped

    f0 = make('0')
    f1 = make('1')
    for tag, fn, inp, nb in [('f32out', f0, x, 4), ('bf16out', f1, x, 4),
                             ('f32outb', f0, x, 4), ('bf16outb', f1, x, 4)]:
        for _ in range(N_WARMUP):
            float(fn(inp))
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            float(fn(inp))
        t = max((time.perf_counter() - t0) / N_ITERS - _call_floor(),
                0.0) / REPS
        print(f'dbnet-1536 {tag}: {t*1e3:.1f} ms/batch '
              f'({t*1e3/nb:.2f} ms/page)', flush=True)


if __name__ == '__main__':
    main()
