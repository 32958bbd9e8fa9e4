"""A/B: LaMa direct shell vs s2d phase-packed shell in ONE process.

The axon tunnel recompiles per process (server-side cache only), so both
modes trace here back-to-back: MIT_TPU_LAMA_S2D is read at TRACE time,
and each mode gets its own jit wrapper. Interleaved timing rounds cancel
tunnel drift.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from manga_image_translator_tpu.models import lama

PAGE = int(os.environ.get('S2D_AB_PAGE', '1536'))


def main():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))
    params = lama.init_params(n_blocks=18, dtype=jnp.bfloat16)
    params = lama.fold_bn(params, n_blocks=18)

    def body(img, mask):
        x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
        out = lama.lama_generator_forward(params, x,
                                          mask.astype(jnp.bfloat16),
                                          n_blocks=18)
        return out.astype(jnp.float32).sum()

    runs = {}
    for mode in ('0', '1'):
        os.environ['MIT_TPU_LAMA_S2D'] = mode
        fn = jax.jit(lambda i, m, _mode=mode: body(i, m))
        t0 = time.perf_counter()
        float(fn(img, mask))
        print(f'mode {mode}: compile+first {time.perf_counter()-t0:.1f}s',
              flush=True)
        runs[mode] = fn

    times = {'0': [], '1': []}
    for _ in range(8):
        for mode, fn in runs.items():
            t0 = time.perf_counter()
            float(fn(img, mask))
            times[mode].append(time.perf_counter() - t0)
    for mode in ('0', '1'):
        print(f'lama full-18 {PAGE}px s2d={mode}: '
              f'{min(times[mode])*1e3:.1f} ms')


if __name__ == '__main__':
    main()
