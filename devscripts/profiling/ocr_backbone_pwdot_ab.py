"""Interleaved one-process A/B of MIT_TPU_OCR_PW_DOT on the OCR backbone
(24-crop chunk, 48x256, bf16) — pw convs as explicit dot_general vs 1x1
conv_general_dilated. Arms traced eagerly while their env value is set.
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

from manga_image_translator_tpu.models import ocr48
from manga_image_translator_tpu.models.functional import P

REPS = 8
N_WARMUP = 2
N_ITERS = 6


def _call_floor():
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


def main():
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in ocr48.init_params(dict_size=7935).items()}
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(24, 48, 256, 3).astype(np.float32) * 2 - 1
                    ).astype(jnp.bfloat16)

    def make(flag):
        os.environ['MIT_TPU_OCR_PW_DOT'] = flag

        def run(x):
            feats = ocr48.convnext_features(P(params).scope('backbone'), x)
            return feats.astype(jnp.float32).sum()

        @jax.jit
        def looped(x):
            def body(i, s):
                return s + run(x + (s * 0).astype(x.dtype))
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        t0 = time.perf_counter()
        float(looped(x))
        print(f'compiled pwdot={flag} in {time.perf_counter() - t0:.0f}s',
              flush=True)
        return looped

    f0 = make('0')
    f1 = make('1')
    floor = _call_floor()
    for tag, fn in [('conv', f0), ('dot', f1), ('convb', f0), ('dotb', f1)]:
        for _ in range(N_WARMUP):
            float(fn(x))
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            float(fn(x))
        t = max((time.perf_counter() - t0) / N_ITERS - floor, 0.0) / REPS
        print(f'ocr-backbone-24crop {tag}: {t*1e3:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
