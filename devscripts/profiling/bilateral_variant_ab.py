"""A/B the bilateral Pallas kernel variants on TPU @1536:

v1 — per-tap 2D rolls, f32 scratch (r2 default, 14.6 ms measured)
v2 — hoisted row rolls + bf16 scratch
v3 — hoisted row rolls, f32 scratch

One process, interleaved; also checks v2/v3 outputs equal v1 on device.
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

S = 1536
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
    img = jnp.asarray(rs.randint(0, 255, (S, S, 3), np.uint8))

    outs = {}
    for v in ('v1', 'v2', 'v3', 'v4', 'v5', 'v5w', 'v5m', 'v6'):
        try:
            outs[v] = np.asarray(
                bilateral_filter_pallas(img, 17, 80.0, 80.0, variant=v))
        except Exception as e:  # noqa: BLE001 - record and move on
            print(f'{v}: FAILED to compile/run: '
                  f'{str(e.__class__.__name__)}', flush=True)
    for v in ('v2', 'v3', 'v4', 'v5', 'v5w', 'v5m', 'v6'):
        if v not in outs:
            continue
        eq = np.array_equal(outs['v1'], outs[v])
        mx = int(np.abs(outs['v1'].astype(int) - outs[v].astype(int)).max())
        print(f'{v} == v1: {eq} (max abs diff {mx})', flush=True)

    for v in ('v5', 'v6', 'v5', 'v6'):
        if v not in outs:
            continue
        @jax.jit
        def looped(im, _v=v):
            def body(i, s):
                bumped = im + (s * 0).astype(im.dtype)
                out = bilateral_filter_pallas(bumped, 17, 80.0, 80.0,
                                              variant=_v)
                return s + out.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
        t = timed(looped, img) / REPS
        print(f'{v}: {t*1e3:.2f} ms @{S}²', flush=True)


if __name__ == '__main__':
    main()
