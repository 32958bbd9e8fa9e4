#!/usr/bin/env python
"""Is the v5 bilateral kernel's hardware exp the VPU bottleneck?

Arms (one process, interleaved, two passes):
  off  — jnp.exp (current default)
  skip — exp replaced by ONE multiply (WRONG results; timing bound: the
         most any exp optimization could ever win)
  poly — bit-assembled 2^n * poly5(f) approximation (rel err ~3e-6;
         uint8 outputs parity-tested vs exact in interpret mode)

Each arm traces its own graph via the variant/env read at trace time —
arms are traced EAGERLY while their env value is set (r3 lesson).
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

from manga_image_translator_tpu.ops.pallas_bilateral import (
    bilateral_filter_pallas)

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


def main():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randint(0, 255, (1536, 1536, 3), dtype=np.uint8))
    floor = call_floor()
    print(f'call floor {floor * 1000:.1f} ms', flush=True)

    outs = {}
    fns = {}
    for mode in ('off', 'skip', 'poly'):
        os.environ['MIT_TPU_BILATERAL_EXP'] = mode
        bilateral_filter_pallas._clear_cache()

        @jax.jit
        def looped(x, _mode=mode):
            def body(i, s):
                bumped = x + (s * 0).astype(x.dtype)
                out = bilateral_filter_pallas(bumped, 17, 80.0, 80.0,
                                              variant='v5')
                return s + out.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        float(looped(img))          # eager trace+compile under this env
        fns[mode] = looped
        outs[mode] = np.asarray(bilateral_filter_pallas(img, 17, 80.0,
                                                        80.0, variant='v5'))
        bilateral_filter_pallas._clear_cache()
    os.environ.pop('MIT_TPU_BILATERAL_EXP', None)

    for _pass in range(2):
        for mode, fn in fns.items():
            for _ in range(1):
                float(fn(img))
            t0 = time.perf_counter()
            for _ in range(N_ITERS):
                float(fn(img))
            t = max((time.perf_counter() - t0) / N_ITERS - floor, 0) / REPS
            print(f'v5 exp={mode:4s}: {t * 1000:6.2f} ms @1536^2',
                  flush=True)

    d = np.abs(outs['poly'].astype(int) - outs['off'].astype(int))
    print(f'poly vs off on device: max|diff|={d.max()} '
          f'nonzero={100 * (d != 0).mean():.4f}%', flush=True)


if __name__ == '__main__':
    main()
