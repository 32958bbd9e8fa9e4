"""A/B: LaMa full generator at 1536px — direct shell vs space-to-depth
phase-packed shell (MIT_TPU_LAMA_S2D=0|1, one process per mode: env is
read at trace time)."""
import os
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


def timed(fn, *args, n=8):
    for _ in range(3):
        float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))
    params = lama.init_params(n_blocks=18, dtype=jnp.bfloat16)
    params = lama.fold_bn(params, n_blocks=18)

    @jax.jit
    def run(img, mask):
        x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
        out = lama.lama_generator_forward(params, x,
                                          mask.astype(jnp.bfloat16),
                                          n_blocks=18)
        return out.astype(jnp.float32).sum()

    t = timed(run, img, mask)
    mode = os.environ.get('MIT_TPU_LAMA_S2D', '1')
    print(f'lama full-18 {PAGE}px s2d={mode}: {t*1e3:.1f} ms')


if __name__ == '__main__':
    main()
