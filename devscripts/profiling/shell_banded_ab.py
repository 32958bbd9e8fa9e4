"""Isolated stem + final-conv A/B: materialized reflect pad vs banded
fast path, plus phase-pack factor s for the final conv. All variants in
one process, interleaved, fori-loop harness.
"""
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
from manga_image_translator_tpu.models.lama import P, _final_conv, _ffc_bn_act
from manga_image_translator_tpu.models.functional import _reflect_conv_banded

PAGE = 1536
REPS = 16


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


def loop(fn, label, *xs):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            return s + fn(*bumped).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    t = timed(looped, *xs) / REPS
    print(f'{label}: {t*1e3:.2f} ms', flush=True)
    return t


def main():
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    p = P(params)
    rs = np.random.RandomState(0)
    x4 = jnp.asarray(rs.rand(1, PAGE, PAGE, 4).astype(np.float32),
                     jnp.bfloat16)
    x64 = jnp.asarray(rs.rand(1, PAGE, PAGE, 64).astype(np.float32),
                      jnp.bfloat16)
    fkey = f'model.{5 + 18 + 1 + 3 * lama.N_DOWN + 1}'

    # stem: pad+conv vs banded
    def stem_padded(v):
        xp = jnp.pad(v, ((0, 0), (3, 3), (3, 3), (0, 0)), mode='reflect')
        os.environ['MIT_TPU_REFLECT_FAST'] = '0'
        out, _ = _ffc_bn_act(p.scope('model.1'), xp, None, 0, 0, padding=0)
        return out

    def stem_banded(v):
        os.environ['MIT_TPU_REFLECT_FAST'] = '1'
        out, _ = _ffc_bn_act(p.scope('model.1'), v, None, 0, 0, padding=3)
        return out

    # final: padded s4 vs banded s4 vs banded s8
    def final_mode(flag, s):
        def run(v):
            os.environ['MIT_TPU_REFLECT_FAST'] = flag
            return _final_conv(p, fkey, v, s=s)
        return run

    a = np.asarray(stem_banded(x4), np.float32)
    b = np.asarray(stem_padded(x4), np.float32)
    print(f'stem max|diff|: {np.abs(a - b).max():.3e}', flush=True)
    fa = np.asarray(final_mode('1', 4)(x64), np.float32)
    fb = np.asarray(final_mode('0', 4)(x64), np.float32)
    fc = np.asarray(final_mode('1', 8)(x64), np.float32)
    print(f'final s4 max|diff|: {np.abs(fa - fb).max():.3e}  '
          f's8 vs s4: {np.abs(fc - fa).max():.3e}', flush=True)

    loop(stem_padded, 'stem padded', x4)
    loop(stem_banded, 'stem banded', x4)
    loop(final_mode('0', 4), 'final padded s4', x64)
    loop(final_mode('1', 4), 'final banded s4', x64)
    loop(final_mode('1', 8), 'final banded s8', x64)
    loop(stem_padded, 'stem padded (2)', x4)
    loop(stem_banded, 'stem banded (2)', x4)
    loop(final_mode('0', 4), 'final padded s4 (2)', x64)
    loop(final_mode('1', 4), 'final banded s4 (2)', x64)
    loop(final_mode('1', 8), 'final banded s8 (2)', x64)


if __name__ == '__main__':
    main()
